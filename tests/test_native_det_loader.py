"""Native C++ detection loader (dataloader.cpp fndt_* ABI): JPEG decode +
the SSD train augmentation (photometric distort, mean-fill expand,
center-rule random crop, mirror, squash-resize — detection/data.py
ssd_augment semantics; XML parsing stays host-side)."""
import os

import numpy as np
import pytest

from PIL import Image

pytest.importorskip("frostnet_tpu.native")
from frostnet_tpu.native import NativeDetectionLoader  # noqa: E402

# Heavy tier: excluded from `pytest -m "not slow"` (the sub-15-min fast signal)
pytestmark = pytest.mark.slow


def _scene(d, n=6, size=(96, 128)):
    """Images with one saturated red box on black; box coords in pixels."""
    paths, boxes, labels = [], [], []
    rng = np.random.RandomState(0)
    h, w = size
    for i in range(n):
        img = np.zeros((h, w, 3), np.uint8)
        x0, y0 = rng.randint(5, w // 2), rng.randint(5, h // 2)
        x1, y1 = x0 + rng.randint(10, w // 3), y0 + rng.randint(10, h // 3)
        img[y0:y1, x0:x1, 0] = 255
        p = os.path.join(d, f"i{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
        boxes.append(np.array([[x0, y0, x1, y1]], np.float32))
        labels.append(np.array([3], np.int32))
    return paths, boxes, labels


def test_eval_resize_and_box_normalization(tmp_path):
    paths, boxes, labels = _scene(str(tmp_path))
    ld = NativeDetectionLoader(paths, boxes, labels, batch_size=3, size=64,
                               train=False, threads=1, seed=0)
    got = list(ld)
    assert len(got) == len(ld) == 2
    b = got[0]
    assert b["image"].shape == (3, 64, 64, 3) and b["image"].dtype == np.uint8
    assert b["boxes"].shape == (3, 50, 4) and b["valid"].shape == (3, 50)
    # eval order is file order at threads=1; boxes normalized by source dims
    for i in range(3):
        assert b["valid"][i].sum() == 1
        want = boxes[i][0] / np.array([128, 96, 128, 96], np.float32)
        np.testing.assert_allclose(b["boxes"][i, 0], want, atol=1e-6)
        assert b["labels"][i, 0] == 3


def test_train_boxes_track_the_object(tmp_path):
    """After any photometric/expand/crop/mirror combination, the normalized
    box must still cover the red pixels: sample many augmented frames and
    assert every saturated-red pixel center falls inside the (slightly
    inflated) emitted box."""
    paths, boxes, labels = _scene(str(tmp_path), n=8)
    ld = NativeDetectionLoader(paths, boxes, labels, batch_size=4, size=96,
                               train=True, threads=2, seed=7)
    checked = 0
    for batch in ld:
        for i in range(4):
            n = int(batch["valid"][i].sum())
            if n == 0:
                continue  # decode-degraded or crop removed the object
            img = batch["image"][i]
            red = (img[..., 0] > 180) & (img[..., 1] < 120) & (img[..., 2] < 120)
            ys, xs = np.nonzero(red)
            if len(ys) < 8:
                continue
            x1, y1, x2, y2 = batch["boxes"][i, 0] * 96
            # interpolation bleeds ~2px at the resized box edge
            assert xs.min() >= x1 - 4 and xs.max() <= x2 + 4, \
                (xs.min(), xs.max(), x1, x2)
            assert ys.min() >= y1 - 4 and ys.max() <= y2 + 4
            # and red actually fills the box region (not a stray corner)
            assert red[int((y1 + y2) / 2), int((x1 + x2) / 2)]
            checked += 1
    assert checked >= 4  # most augmented frames keep the object


def test_augmentation_actually_varies(tmp_path):
    """Train mode must produce different frames from the same source
    (photometric + geometric randomness), eval mode identical ones."""
    paths, boxes, labels = _scene(str(tmp_path), n=1)
    def frames(train, seed):
        ld = NativeDetectionLoader(paths * 4, boxes * 4, labels * 4,
                                   batch_size=4, size=64, train=train,
                                   threads=1, seed=seed)
        return next(iter(ld))["image"]
    tr = frames(True, 3)
    diffs = [np.abs(tr[i].astype(int) - tr[j].astype(int)).mean()
             for i in range(4) for j in range(i + 1, 4)]
    assert max(diffs) > 1.0, diffs  # augmented frames differ
    ev = frames(False, 3)
    for i in range(1, 4):
        np.testing.assert_array_equal(ev[0], ev[i])


def test_trainer_wiring_runs_a_uint8_step(tmp_path):
    """--loader native through build_detection_dataset drives one real QAT
    detection step with device-side BGR/mean prep (_prep_det_image)."""
    import jax
    import jax.numpy as jnp
    from frostnet_tpu.detection.anchors import CONFIGS, make_priors
    from frostnet_tpu.detection.models import build_ssd
    from frostnet_tpu.detection.train import (DetConfig, DetState,
                                              build_detection_dataset,
                                              make_det_train_step)
    from frostnet_tpu.nn import QAT, QAT_FROZEN
    from frostnet_tpu.optim import get_optimizer

    # VOCdevkit-shaped tree with 2 annotated images
    base = tmp_path / "VOC2007"
    (base / "ImageSets" / "Main").mkdir(parents=True)
    (base / "JPEGImages").mkdir()
    (base / "Annotations").mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (80, 80, 3), np.uint8)).save(
            base / "JPEGImages" / f"im{i}.jpg")
        (base / "Annotations" / f"im{i}.xml").write_text(
            "<annotation><object><name>dog</name><difficult>0</difficult>"
            "<bndbox><xmin>10</xmin><ymin>12</ymin><xmax>40</xmax>"
            "<ymax>44</ymax></bndbox></object></annotation>")
    with open(base / "ImageSets" / "Main" / "trainval.txt", "w") as f:
        f.write("im0\nim1\n")
    # empty VOC2012 so VOCDetection's default 07+12 image_sets resolve
    v12 = tmp_path / "VOC2012" / "ImageSets" / "Main"
    v12.mkdir(parents=True)
    (v12 / "trainval.txt").write_text("")

    cfg = DetConfig(dataset="voc", data_root=str(tmp_path), batch_size=2,
                    loader="native")
    ds = build_detection_dataset(cfg, train=True)
    assert isinstance(ds, NativeDetectionLoader)
    batch = next(iter(ds))
    assert batch["image"].dtype == np.uint8

    priors = jnp.asarray(make_priors(CONFIGS["voc"]))
    feat, head = build_ssd(num_classes=21)
    rng_j = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, 300, 300, 3), jnp.float32)
    fv = jax.jit(lambda r, x: feat.init(r, x, mode=QAT, train=True))(rng_j, sample)
    sources = jax.eval_shape(lambda v, x: feat.apply(v, x, mode=QAT_FROZEN),
                             fv, sample)
    hv = jax.jit(lambda r, s: head.init(r, s, train=True))(
        rng_j, [jnp.zeros(s.shape, s.dtype) for s in sources])
    tx = get_optimizer("QSGD", 1e-3)
    state = DetState(
        step=jnp.zeros([], jnp.int32),
        feat_params=fv["params"], feat_batch_stats=fv.get("batch_stats", {}),
        feat_quant=fv.get("quant", {}),
        head_params=hv["params"], head_batch_stats=hv.get("batch_stats", {}),
        opt_state=tx.init((fv["params"], hv["params"])), rng=rng_j, tx=tx)
    step = make_det_train_step(feat, head, QAT, priors, 21)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_expand_fill_is_zero_after_normalization():
    """Expand's mean fill must land on exactly 0 after the RGB->BGR flip +
    mean subtraction — the reference fills its BGR frame with MEANS so
    SubtractMeans zeroes it (augmentations.py:313-328,413). Pins the python
    loader to the same contract the C++ worker implements (means[] fill)."""
    from frostnet_tpu.detection.data import MEANS, _expand

    img = np.full((16, 16, 3), 200, np.float32)  # RGB working frame
    boxes = np.array([[2.0, 2.0, 10.0, 10.0]], np.float32)

    class AlwaysExpand(np.random.RandomState):
        def randint(self, *a, **k):  # _expand's coin toss: 0 = do expand
            return 0

    out, _ = _expand(img, boxes, AlwaysExpand(0))
    assert out.shape[0] > img.shape[0]
    fill = out[-1, -1]  # bottom-right corner is always fill
    np.testing.assert_array_equal(fill[::-1] - np.asarray(MEANS), 0.0)
