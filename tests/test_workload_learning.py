"""Learning tests for the detection and segmentation workloads.

Classification already proves FP->QAT->INT8 learning end-to-end
(test_convergence.py) and pix2pix has a 30-step behavior test; the reference's
only QC for detection/segmentation is full training runs (SURVEY.md §4).
These tests train the REAL jitted trainer steps (make_det_train_step /
make_seg_train_step) on synthetic learnable tasks and assert the loss falls
and the task metric lands well above chance.
"""

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frostnet_tpu.nn import FP32, QAT, QAT_FROZEN
from frostnet_tpu.nn.conv import QConvBNAct

# Heavy tier: excluded from `pytest -m "not slow"` (the sub-15-min fast signal)
pytestmark = pytest.mark.slow

# ---------------------------------------------------------------------------
# detection: one axis-aligned colored square on a dark field, 2 classes
# ---------------------------------------------------------------------------

TINY_CFG = {
    "num_classes": 3,  # background + 2
    "feature_maps": [8, 4],
    "min_dim": 64,
    "steps": [8, 16],
    "min_sizes": [16, 28],
    "max_sizes": [28, 44],
    "aspect_ratios": [[2], [2]],
    "variance": [0.1, 0.2],
    "clip": True,
    "name": "tiny",
}


class TinyFeat(fnn.Module):
    """Two-source quantized trunk (stride 8 and 16 at 64px)."""

    @fnn.compact
    def __call__(self, x, mode=FP32, train: bool = False):
        from frostnet_tpu.nn import QuantStub, dequant

        x = QuantStub(name="quant")(x, mode)
        x = QConvBNAct(16, 3, strides=2, padding=1, name="c1")(x, mode, train)
        x = QConvBNAct(32, 3, strides=2, padding=1, name="c2")(x, mode, train)
        s1 = QConvBNAct(32, 3, strides=2, padding=1, name="c3")(x, mode, train)
        s2 = QConvBNAct(32, 3, strides=2, padding=1, name="c4")(s1, mode, train)
        return [dequant(s1), dequant(s2)]


def _det_batch(rng, bs=16, size=64):
    imgs = rng.randn(bs, size, size, 3).astype(np.float32) * 0.1
    boxes = np.zeros((bs, 1, 4), np.float32)
    labels = np.zeros((bs, 1), np.int32)
    for b in range(bs):
        w = rng.randint(16, 33)
        x0 = rng.randint(0, size - w)
        y0 = rng.randint(0, size - w)
        cls = rng.randint(0, 2)
        # class 0: red square, class 1: green square
        imgs[b, y0:y0 + w, x0:x0 + w, cls] += 2.0
        boxes[b, 0] = [x0 / size, y0 / size, (x0 + w) / size, (y0 + w) / size]
        labels[b, 0] = cls
    return {"image": imgs, "boxes": boxes, "labels": labels,
            "valid": np.ones((bs, 1), bool)}



def test_detection_learns_synthetic_boxes():
    from frostnet_tpu.detection.anchors import make_priors
    from frostnet_tpu.detection.evaluate import evaluate_map
    from frostnet_tpu.detection.models import SSDHead
    from frostnet_tpu.detection.train import DetState, make_det_train_step
    from frostnet_tpu.optim import get_optimizer, set_warmup

    priors = jnp.asarray(make_priors(TINY_CFG))
    feat = TinyFeat()
    head = SSDHead(num_classes=3, anchor_counts=(4, 4))
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((16, 64, 64, 3), jnp.float32)
    fv = jax.jit(lambda r, x: feat.init(r, x, mode=QAT, train=True))(rng, sample)
    sources = jax.eval_shape(lambda v, x: feat.apply(v, x), fv, sample)
    hv = jax.jit(lambda r, s: head.init(r, s, train=True))(
        rng, [jnp.zeros(s.shape, s.dtype) for s in sources])
    assert priors.shape[0] == 8 * 8 * 4 + 4 * 4 * 4

    tx = get_optimizer("QSGD", 5e-3, clip_by=1e-3)
    state = DetState(
        step=jnp.zeros([], jnp.int32),
        feat_params=fv["params"], feat_batch_stats=fv.get("batch_stats", {}),
        feat_quant=fv.get("quant", {}),
        head_params=hv["params"], head_batch_stats=hv.get("batch_stats", {}),
        opt_state=tx.init((fv["params"], hv["params"])), rng=rng, tx=tx)

    fp_step = make_det_train_step(feat, head, FP32, priors, 3)
    qat_step = make_det_train_step(feat, head, QAT, priors, 3)

    rngnp = np.random.RandomState(0)
    first = None
    for i in range(30):   # StatAssist warm-up
        state, m = fp_step(state, {k: jnp.asarray(v)
                                   for k, v in _det_batch(rngnp).items()})
        if first is None:
            first = float(m["loss"])
    state = state.replace(opt_state=set_warmup(state.opt_state, False))
    for i in range(90):   # QAT phase
        state, m = qat_step(state, {k: jnp.asarray(v)
                                    for k, v in _det_batch(rngnp).items()})
    last = float(m["loss"])
    assert last < 0.5 * first, (first, last)

    # synthetic mAP well above chance on held-out scenes
    class _EvalDS:
        def __iter__(self):
            r = np.random.RandomState(123)
            for _ in range(4):
                yield _det_batch(r, bs=8)

    res = evaluate_map(
        feat, head,
        {"params": state.feat_params, "batch_stats": state.feat_batch_stats,
         "quant": state.feat_quant},
        {"params": state.head_params, "batch_stats": state.head_batch_stats},
        _EvalDS(), np.asarray(priors), QAT_FROZEN, num_classes=3)
    assert res["mAP"] > 0.5, res


# ---------------------------------------------------------------------------
# segmentation: bright disk on noise -> 2-class mask
# ---------------------------------------------------------------------------

def _seg_batch(rng, bs=8, size=64):
    imgs = rng.randn(bs, size, size, 3).astype(np.float32) * 0.2
    labels = np.zeros((bs, size, size), np.int32)
    yy, xx = np.mgrid[0:size, 0:size]
    for b in range(bs):
        cx, cy = rng.randint(16, size - 16, 2)
        r = rng.randint(8, 16)
        mask = (xx - cx) ** 2 + (yy - cy) ** 2 < r ** 2
        imgs[b, mask, :] += 1.5
        labels[b, mask] = 1
    return {"image": imgs, "label": labels}



def test_segmentation_learns_blob_miou():
    from frostnet_tpu.optim import get_optimizer, set_warmup
    from frostnet_tpu.segmentation.models import get_seg_model
    from frostnet_tpu.segmentation.train import make_seg_train_step
    from frostnet_tpu.train.state import create_train_state
    from frostnet_tpu.utils.metrics import miou_from_confusion

    model = get_seg_model("mobilenetv3_RE_small", num_classes=2)
    tx = get_optimizer("QSGD", 2e-2, clip_by=1e-3)
    sample = jnp.zeros((8, 64, 64, 3), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), sample,
                               init_kwargs={"mode": QAT, "train": True})

    fp_step = make_seg_train_step(model, FP32, None, 255, 2)
    qat_step = make_seg_train_step(model, QAT, None, 255, 2)

    rngnp = np.random.RandomState(0)
    first = None
    for i in range(20):
        state, m = fp_step(state, {k: jnp.asarray(v)
                                   for k, v in _seg_batch(rngnp).items()})
        if first is None:
            first = float(m["loss"])
    state = state.replace(opt_state=set_warmup(state.opt_state, False))
    cm = None
    for i in range(60):
        state, m = qat_step(state, {k: jnp.asarray(v)
                                    for k, v in _seg_batch(rngnp).items()})
        cm = m["cm"]
    assert float(m["loss"]) < 0.5 * first, (first, float(m["loss"]))
    _, miou = miou_from_confusion(cm)
    # all-background prediction scores ~0.46 mIoU here (big bg class IoU,
    # zero disk IoU); require clear disk learning
    assert float(miou) > 0.7, float(miou)
