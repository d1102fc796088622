"""Serving: Int8Predictor loads artifacts and checkpoints and predicts."""
import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from frostnet_tpu.models.frostnet import FrostNet
from frostnet_tpu.nn import INT8, QAT
from frostnet_tpu.optim import get_optimizer
from frostnet_tpu.quant import export_int8
from frostnet_tpu.serve import Int8Predictor
from frostnet_tpu.train import create_train_state, make_train_step
from frostnet_tpu.utils.checkpoint import save_checkpoint

# Heavy tier: excluded from `pytest -m "not slow"` (the sub-15-min fast signal)
pytestmark = pytest.mark.slow

MODEL = "frostnet_quant_tiny"  # not a registry name; built directly below


def _trained_state(tmp_path):
    model = FrostNet(mode="tiny", width_mult=1.0, quantized=True, num_classes=5)
    tx = get_optimizer("QSGD", 0.01)
    rng = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rng.randn(4, 32, 32, 3).astype(np.float32)),
             "label": jnp.asarray(rng.randint(0, 5, 4).astype(np.int32))}
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch["image"],
                               init_kwargs={"mode": QAT, "train": True})
    step = make_train_step(model, QAT, num_classes=5, donate=False)
    for _ in range(2):
        state, _ = step(state, batch)
    return model, state, batch


def test_predictor_from_artifact_matches_int8_mode(tmp_path, monkeypatch):
    model, state, batch = _trained_state(tmp_path)
    art = str(tmp_path / "m.npz")
    export_int8(state.model_variables, art)

    # route the predictor's create_model to this tiny architecture
    import frostnet_tpu.models as models_pkg
    monkeypatch.setattr(
        models_pkg, "create_model",
        lambda name, **kw: FrostNet(mode="tiny", width_mult=1.0,
                                    quantized=True, num_classes=5))
    pred = Int8Predictor("tiny", num_classes=5, artifact=art, image_size=32)

    want = np.asarray(model.apply(state.model_variables, batch["image"],
                                  mode=INT8))
    got = np.asarray(pred(np.asarray(batch["image"])))
    np.testing.assert_array_equal(got, want)

    idx, scores = pred.predict_topk(np.asarray(batch["image"]), k=3)
    assert idx.shape == (4, 3) and scores.shape == (4, 3)
    np.testing.assert_array_equal(idx[:, 0], want.argmax(-1))


def _serve_args(**kw):
    """serve.cli's real defaults (from its parser), with test overrides."""
    from frostnet_tpu.serve import build_parser

    args = build_parser().parse_args([])
    args.batch_size, args.iters, args.predict_batches = 2, 2, 1
    for k, v in kw.items():
        assert hasattr(args, k), k
        setattr(args, k, v)
    return args


def test_serve_workload_seg(tmp_path):
    """serve --workload seg: frozen INT8 class maps + palette PNG output."""
    from frostnet_tpu.segmentation.models import get_seg_model
    from frostnet_tpu.serve import main

    model = get_seg_model("mobilenetv3_large", num_classes=4)
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = jax.jit(lambda k, i: model.init(k, i, mode=QAT, train=True))(
        jax.random.PRNGKey(0), x)
    art = str(tmp_path / "seg.npz")
    export_int8(variables, art)

    outdir = str(tmp_path / "preds")
    report = main(_serve_args(workload="seg", model="mobilenetv3_large",
                              artifact=art, num_classes=4, image_size=64,
                              batch_size=1, output=outdir))
    assert report["workload"] == "seg"
    assert report["pipeline_images_per_sec"] > 0
    pngs = sorted(os.listdir(outdir))
    assert pngs == ["pred_00000.png"]
    from PIL import Image

    im = np.asarray(Image.open(os.path.join(outdir, pngs[0])))
    assert im.shape == (64, 128, 3)  # colorized palette output


def test_serve_workload_gan(tmp_path):
    """serve --workload gan: frozen INT8 netG + generated PNG output."""
    from frostnet_tpu.gan.networks import define_g
    from frostnet_tpu.serve import main

    model = define_g(ngf=8, netG="resnet_6blocks", quantized=True)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda k, i: model.init(k, i, mode=QAT, train=True))(
        jax.random.PRNGKey(0), x)
    art = str(tmp_path / "netg.npz")
    export_int8(variables, art)

    outdir = str(tmp_path / "fakes")
    # predict_batches=2 exercises the double-buffered --output loop
    # (dispatch batch i+1 before postprocessing batch i, then final flush)
    report = main(_serve_args(workload="gan", model="resnet_6blocks",
                              artifact=art, ngf=8, image_size=64,
                              batch_size=1, output=outdir,
                              predict_batches=2))
    assert report["workload"] == "gan"
    assert sorted(os.listdir(outdir)) == ["fake_00000.png", "fake_00001.png"]


def test_folder_batches_use_workload_preprocessing(tmp_path):
    """--source folder must apply each workload's OWN eval normalization
    (not the classifier transform): solid-color image -> exact values."""
    from PIL import Image

    from frostnet_tpu.data.datasets import IMAGENET_MEAN, IMAGENET_STD
    from frostnet_tpu.serve import _folder_batches

    folder = tmp_path / "imgs"
    folder.mkdir()
    Image.new("RGB", (8, 8), (200, 100, 50)).save(folder / "a.png")

    def first(workload, shape):
        args = _serve_args(workload=workload, data_dir=str(folder),
                           source="folder", batch_size=2)
        x, label = next(_folder_batches(args, shape))
        assert x.shape == shape and label is None
        return x

    x = first("seg", (2, 4, 8, 3))
    want = (np.array([200, 100, 50], np.float32) / 255.0
            - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
                IMAGENET_STD, np.float32)
    np.testing.assert_allclose(x[0, 0, 0], want, rtol=1e-6)

    x = first("det", (2, 6, 6, 3))  # RGB->BGR then minus (104,117,123)
    np.testing.assert_allclose(x[1, 2, 3], [50 - 104, 100 - 117, 200 - 123])

    x = first("gan", (2, 4, 4, 3))
    np.testing.assert_allclose(
        x[0, 1, 1], np.array([200, 100, 50], np.float32) / 255.0 * 2 - 1,
        rtol=1e-6)


def test_serve_workload_gan_folder_source(tmp_path):
    """End-to-end: serve --workload gan --source folder cycles real images
    through the [-1,1] protocol and writes the gallery."""
    from PIL import Image

    from frostnet_tpu.gan.networks import define_g
    from frostnet_tpu.serve import main

    model = define_g(ngf=8, netG="resnet_6blocks", quantized=True)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda k, i: model.init(k, i, mode=QAT, train=True))(
        jax.random.PRNGKey(0), x)
    art = str(tmp_path / "netg.npz")
    export_int8(variables, art)

    folder = tmp_path / "imgs"
    folder.mkdir()
    Image.new("RGB", (32, 32), (10, 200, 30)).save(folder / "only.png")

    outdir = str(tmp_path / "fakes")
    report = main(_serve_args(workload="gan", model="resnet_6blocks",
                              artifact=art, ngf=8, image_size=64,
                              batch_size=1, iters=2, source="folder",
                              data_dir=str(folder), output=outdir,
                              predict_batches=2))
    assert report["workload"] == "gan"
    assert sorted(os.listdir(outdir)) == ["fake_00000.png", "fake_00001.png"]


def test_serve_workload_det(tmp_path):
    """serve --workload det: feat+head artifacts -> detections jsonl."""
    from frostnet_tpu.detection.models import build_ssd
    from frostnet_tpu.nn import QAT_FROZEN
    from frostnet_tpu.serve import main

    feat, head = build_ssd(num_classes=21)
    x = jnp.zeros((1, 300, 300, 3), jnp.float32)
    k = jax.random.PRNGKey(0)
    feat_vars = jax.jit(lambda kk, i: feat.init(kk, i, mode=QAT, train=True))(k, x)
    sources = jax.eval_shape(lambda v, i: feat.apply(v, i, mode=QAT_FROZEN),
                             feat_vars, x)
    head_vars = jax.jit(head.init)(k, jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), sources))
    base = str(tmp_path / "det")
    export_int8(feat_vars, base + "_feat.npz")
    export_int8(head_vars, base + "_head.npz")

    out = str(tmp_path / "dets.jsonl")
    report = main(_serve_args(workload="det", model="qssd", artifact=base,
                              image_size=300, batch_size=1, iters=1,
                              output=out))
    assert report["workload"] == "det"
    recs = [json.loads(line) for line in open(out)]
    assert len(recs) == 1 and "detections" in recs[0]


def test_serve_workload_rejects_cls_only_flags(tmp_path):
    from frostnet_tpu.serve import main
    import pytest

    with pytest.raises(SystemExit):
        main(_serve_args(workload="seg", program="x.bin"))
    with pytest.raises(SystemExit):
        main(_serve_args(workload="gan"))  # no artifact


def test_serve_rejects_unknown_model_names(tmp_path):
    """Typos must fail loudly, not silently serve a default architecture."""
    from frostnet_tpu.serve import main
    import pytest

    with pytest.raises(SystemExit):  # det: not qssd/qtdsod
        main(_serve_args(workload="det", model="tdsod", artifact="x"))
    with pytest.raises(ValueError):  # gan: define_g rejects the typo
        main(_serve_args(workload="gan", model="resnet9blocks",
                         artifact=str(tmp_path / "missing.npz")))


def test_serve_det_dataset_selects_config():
    """--dataset coco must size the head/priors from the coco config."""
    from frostnet_tpu.detection.anchors import make_priors
    from frostnet_tpu.detection.train import select_config

    voc, coco = select_config("qssd", "voc"), select_config("qssd", "coco")
    assert coco["num_classes"] != voc["num_classes"]
    # serve builds priors straight from the selected config
    assert make_priors(coco).shape[0] > 0


def test_predictor_from_checkpoint(tmp_path, monkeypatch):
    model, state, batch = _trained_state(tmp_path)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state)

    import frostnet_tpu.models as models_pkg
    monkeypatch.setattr(
        models_pkg, "create_model",
        lambda name, **kw: FrostNet(mode="tiny", width_mult=1.0,
                                    quantized=True, num_classes=5))
    pred = Int8Predictor("tiny", num_classes=5, checkpoint=ckpt, image_size=32)
    want = np.asarray(model.apply(state.model_variables, batch["image"],
                                  mode=INT8))
    got = np.asarray(pred(np.asarray(batch["image"])))
    np.testing.assert_allclose(got, want, atol=1e-5)
