"""Detection-core golden tests: our vectorized jittable matcher/encoder/NMS
against the reference's box_utils (run under torch CPU as an oracle)."""
import importlib.util
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from frostnet_tpu.detection import anchors as anc
from frostnet_tpu.detection.boxes import (
    decode,
    encode,
    jaccard,
    match_priors,
    point_form,
)
from frostnet_tpu.detection.losses import multibox_loss
from frostnet_tpu.detection.nms import nms_fixed


@pytest.fixture(scope="module")
def ref_box_utils():
    if "ref_box_utils" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "ref_box_utils", "/root/reference/Object_Detection/layers/box_utils.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sys.modules["ref_box_utils"] = mod
    return sys.modules["ref_box_utils"]


def _rand_boxes(n, seed):
    rng = np.random.RandomState(seed)
    xy = rng.rand(n, 2) * 0.7
    wh = rng.rand(n, 2) * 0.29 + 0.01
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


def test_priors_match_reference_cfg():
    priors = anc.make_priors(anc.VOC_CFG)
    assert priors.shape == (8732, 4)  # canonical SSD300 prior count
    assert priors.min() >= 0 and priors.max() <= 1
    tdsod = anc.make_priors(anc.TDSOD_VOC_CFG)
    assert tdsod.shape[0] == 8732 - 4 + 16  # 2x2 last map instead of 1x1


def test_jaccard_matches_reference(ref_box_utils):
    a, b = _rand_boxes(7, 0), _rand_boxes(11, 1)
    want = ref_box_utils.jaccard(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    got = np.asarray(jaccard(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_encode_decode_match_reference(ref_box_utils):
    priors = anc.make_priors(anc.VOC_CFG)[:50]
    matched = _rand_boxes(50, 2)
    var = [0.1, 0.2]
    want = ref_box_utils.encode(torch.from_numpy(matched),
                                torch.from_numpy(priors), var).numpy()
    got = np.asarray(encode(jnp.asarray(matched), jnp.asarray(priors), var))
    np.testing.assert_allclose(got, want, atol=1e-5)

    loc = (np.random.RandomState(3).randn(50, 4) * 0.5).astype(np.float32)
    want2 = ref_box_utils.decode(torch.from_numpy(loc),
                                 torch.from_numpy(priors), var).numpy()
    got2 = np.asarray(decode(jnp.asarray(loc), jnp.asarray(priors), var))
    np.testing.assert_allclose(got2, want2, atol=1e-5)


@pytest.mark.parametrize("seed,num_gt", [(0, 3), (1, 1), (2, 6)])
def test_match_matches_reference(ref_box_utils, seed, num_gt):
    priors = anc.make_priors(anc.VOC_CFG)
    truths = _rand_boxes(num_gt, seed)
    labels = np.random.RandomState(seed).randint(0, 20, (num_gt,))
    var = [0.1, 0.2]

    loc_t = torch.zeros(1, priors.shape[0], 4)
    conf_t = torch.zeros(1, priors.shape[0], dtype=torch.long)
    ref_box_utils.match(0.5, torch.from_numpy(truths), torch.from_numpy(priors),
                        var, torch.from_numpy(labels), loc_t, conf_t, 0)

    # pad GT to fixed shape like the TPU loss does
    G = 8
    tp = np.zeros((G, 4), np.float32)
    lp = np.zeros((G,), np.int32)
    vp = np.zeros((G,), bool)
    tp[:num_gt], lp[:num_gt], vp[:num_gt] = truths, labels, True
    loc, conf = match_priors(jnp.asarray(tp), jnp.asarray(lp), jnp.asarray(vp),
                             jnp.asarray(priors), 0.5, tuple(var))
    np.testing.assert_array_equal(np.asarray(conf), conf_t[0].numpy())
    np.testing.assert_allclose(np.asarray(loc), loc_t[0].numpy(), atol=1e-5)


def test_multibox_loss_finite_and_positive():
    priors = jnp.asarray(anc.make_priors(anc.VOC_CFG))
    B, P, C, G = 2, priors.shape[0], 21, 10
    rng = np.random.RandomState(0)
    loc_pred = jnp.asarray(rng.randn(B, P, 4).astype(np.float32) * 0.1)
    conf_pred = jnp.asarray(rng.randn(B, P, C).astype(np.float32))
    gt = np.zeros((B, G, 4), np.float32)
    gl = np.zeros((B, G), np.int32)
    gv = np.zeros((B, G), bool)
    for b in range(B):
        gt[b, :3] = _rand_boxes(3, b)
        gl[b, :3] = rng.randint(0, 20, 3)
        gv[b, :3] = True
    ll, lc = multibox_loss(loc_pred, conf_pred, jnp.asarray(gt), jnp.asarray(gl),
                           jnp.asarray(gv), priors)
    assert np.isfinite(float(ll)) and float(ll) > 0
    assert np.isfinite(float(lc)) and float(lc) > 0


def test_nms_matches_reference(ref_box_utils):
    rng = np.random.RandomState(0)
    boxes = _rand_boxes(40, 5)
    scores = rng.rand(40).astype(np.float32)
    keep_t, count = ref_box_utils.nms(torch.from_numpy(boxes),
                                      torch.from_numpy(scores), 0.5, 200)
    want = set(keep_t[:count].tolist())

    b, s, keep = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 40)
    # map our kept rows back to original indices by matching scores
    kept_scores = np.asarray(s)[np.asarray(keep)]
    got = set(int(np.argmin(np.abs(scores - ks))) for ks in kept_scores)
    assert got == want
