"""FCN-score protocol (gan/eval_cityscapes): hist/score formulas oracle-matched
against the reference's numpy util (Style_Transfer/scripts/eval_cityscapes/
util.py), plus an end-to-end score_pairs drive with a real seg model."""
import pytest
import importlib.util
import sys

import numpy as np
import jax
import jax.numpy as jnp

from frostnet_tpu.gan.eval_cityscapes import (

    fast_hist,
    get_scores,
    make_seg_predict_fn,
    score_pairs,
)



# Heavy tier: excluded from `pytest -m "not slow"` (the sub-15-min fast signal)
pytestmark = pytest.mark.slow

def _load_reference_util():
    if "ref_cs_util" in sys.modules:
        return sys.modules["ref_cs_util"]
    spec = importlib.util.spec_from_file_location(
        "ref_cs_util",
        "/root/reference/Style_Transfer/scripts/eval_cityscapes/util.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sys.modules["ref_cs_util"] = mod
    return mod


def test_hist_and_scores_match_reference_util():
    ref = _load_reference_util()
    rng = np.random.RandomState(0)
    n = 7
    hist = np.zeros((n, n), np.int64)
    rhist = np.zeros((n, n), np.int64)
    for _ in range(5):
        gt = rng.randint(-1, n + 1, 500)   # includes out-of-range ignores
        gt = np.where(gt == n, 255, gt)     # an ignore label too
        pred = rng.randint(0, n, 500)
        hist += fast_hist(gt, pred, n)
        rhist += ref.fast_hist(gt, pred, n)
    np.testing.assert_array_equal(hist, rhist)

    ours = get_scores(hist)
    want = ref.get_scores(rhist)
    for o, w in zip(ours[:3], want[:3]):
        np.testing.assert_allclose(o, w, rtol=1e-12)
    np.testing.assert_allclose(ours[3], want[3], rtol=1e-12)
    np.testing.assert_allclose(ours[4], want[4], rtol=1e-12)


def test_score_pairs_end_to_end_with_seg_model():
    from frostnet_tpu.nn import QAT, QAT_FROZEN
    from frostnet_tpu.segmentation import get_seg_model

    ncls = 8
    model = get_seg_model("mobilenetv3_RE_small", num_classes=ncls)
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(
        lambda k, x: model.init(k, x, mode=QAT, train=True))(
            jax.random.PRNGKey(0), x0)
    predict = make_seg_predict_fn(
        model, variables, QAT_FROZEN,
        mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))

    rng = np.random.RandomState(1)
    pairs = [(rng.rand(64, 64, 3).astype(np.float32),
              rng.randint(0, ncls, (64, 64))) for _ in range(2)]
    scores = score_pairs(predict, pairs, ncls)
    assert scores["frames"] == 2
    assert 0.0 <= scores["mean_pixel_acc"] <= 1.0
    assert scores["hist"].sum() == 2 * 64 * 64


def test_perfect_prediction_scores_one():
    rng = np.random.RandomState(2)
    label = rng.randint(0, 5, (32, 32))
    scores = score_pairs(lambda img: label, [(None, label)], 5)
    assert scores["mean_pixel_acc"] > 0.999999
    assert scores["mean_class_iou"] > 0.999999
