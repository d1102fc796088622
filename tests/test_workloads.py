"""Workload wiring tests (trace-only where possible to keep CPU compile cost
down; numerics of the underlying blocks are covered by the golden tests).

- SSD/TDSOD: source pyramid geometry must match the anchor configs
  (feature_maps lists in data/config.py:17-49) so head outputs align with
  the prior count.
- Segmentation: logits at input resolution, 19 classes.
- GAN: generator preserves shape in [-1,1]; one pix2pix D/G step runs.
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from frostnet_tpu import nn as fnn_q
from frostnet_tpu.detection import (
    TDSOD_VOC_CFG,
    VOC_CFG,
    build_ssd,
    build_tdsod,
    make_priors,
)
from frostnet_tpu.gan import SyntheticPairs, define_d, define_g, make_net_state, make_pix2pix_steps
from frostnet_tpu.nn import FP32, QAT
from frostnet_tpu.optim import adam, qadam
from frostnet_tpu.segmentation import MobileNetV3Seg

# Heavy tier: excluded from `pytest -m "not slow"` (the sub-15-min fast signal)
pytestmark = pytest.mark.slow


def _trace_init(model, x, **kw):
    return jax.eval_shape(lambda k, v: model.init(k, v, **kw), jax.random.PRNGKey(0), x)


def test_ssd_source_geometry_matches_anchor_cfg():
    feat, head = build_ssd(num_classes=21)
    x = jnp.zeros((1, 300, 300, 3))
    fv = _trace_init(feat, x, mode=fnn_q.QAT, train=True)
    fv = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), fv)
    sources = jax.eval_shape(lambda v, i: feat.apply(v, i, mode=FP32), fv, x)
    assert [s.shape[1] for s in sources] == VOC_CFG["feature_maps"]

    sources_z = [jnp.zeros(s.shape, s.dtype) for s in sources]
    hv = _trace_init(head, sources_z, train=True)
    hv = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), hv)
    loc, conf = jax.eval_shape(lambda v, s: head.apply(v, s), hv, sources_z)
    priors = make_priors(VOC_CFG)
    assert loc.shape == (1, priors.shape[0], 4)
    assert conf.shape == (1, priors.shape[0], 21)


def test_tdsod_source_geometry_matches_anchor_cfg():
    feat, head = build_tdsod(num_classes=21)
    x = jnp.zeros((1, 300, 300, 3))
    fv = _trace_init(feat, x, mode=fnn_q.QAT, train=True)
    fv = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), fv)
    sources = jax.eval_shape(lambda v, i: feat.apply(v, i, mode=FP32), fv, x)
    assert [s.shape[1] for s in sources] == TDSOD_VOC_CFG["feature_maps"]
    priors = make_priors(TDSOD_VOC_CFG)
    sources_z = [jnp.zeros(s.shape, s.dtype) for s in sources]
    hv = _trace_init(head, sources_z, train=True)
    hv = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), hv)
    loc, conf = jax.eval_shape(lambda v, s: head.apply(v, s), hv, sources_z)
    assert loc.shape == (1, priors.shape[0], 4)


def test_seg_model_output_geometry():
    m = MobileNetV3Seg(num_classes=19, mode="small", relu_only=True)
    x = jnp.zeros((2, 96, 96, 3))
    v = _trace_init(m, x, mode=fnn_q.QAT, train=True)
    v = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), v)
    out = jax.eval_shape(lambda vv, xx: m.apply(vv, xx, mode=FP32), v, x)
    assert out.shape == (2, 96, 96, 19)
    assert "quant" in v  # quant region exists
    # the float tail must NOT have observers
    assert "project" not in v["quant"] and "auxlayer" not in v["quant"]


def test_pix2pix_steps_run():
    netG = define_g(netG="resnet_6blocks", quantized=True)
    netD = define_d()
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 32, 32, 3))
    g_state = make_net_state(netG, qadam(2e-4, b1=0.5), rng, x,
                             init_kwargs={"mode": QAT, "train": True})
    d_state = make_net_state(netD, adam(2e-4, b1=0.5), rng,
                             jnp.concatenate([x, x], -1), init_kwargs={"train": True})
    d_step, g_step = make_pix2pix_steps(netG, netD, QAT)
    batch = next(iter(SyntheticPairs(32, 1, 1)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    d_state, md = d_step(g_state, d_state, batch)
    g_state, mg = g_step(g_state, d_state, batch)
    assert np.isfinite(float(md["loss_D"]))
    assert np.isfinite(float(mg["loss_G"]))
    # generator output stays in tanh range
    out = netG.apply(g_state.variables, batch["A"], mode=fnn_q.QAT_FROZEN)
    assert float(jnp.abs(out).max()) <= 1.0 + 1e-5


def test_cyclegan_steps_run():
    from frostnet_tpu.gan import ImagePool
    from frostnet_tpu.gan.models import make_cyclegan_steps

    netG_A = define_g(netG="resnet_6blocks", quantized=True)
    netG_B = define_g(netG="resnet_6blocks", quantized=True)
    netD_A = define_d()
    netD_B = define_d()
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 32, 32, 3))
    g_tx = qadam(2e-4, b1=0.5)
    gA = make_net_state(netG_A, g_tx, rng, x, init_kwargs={"mode": QAT, "train": True})
    gB = make_net_state(netG_B, g_tx, jax.random.fold_in(rng, 1), x,
                        init_kwargs={"mode": QAT, "train": True})
    joint = g_tx.init((gA.params, gB.params))
    dA = make_net_state(netD_A, adam(2e-4), rng, x, init_kwargs={"train": True})
    dB = make_net_state(netD_B, adam(2e-4), jax.random.fold_in(rng, 2), x,
                        init_kwargs={"train": True})
    g_step, d_step = make_cyclegan_steps(netG_A, netG_B, netD_A, netD_B, QAT)
    batch = {k: jnp.asarray(v) for k, v in next(iter(SyntheticPairs(32, 1, 1))).items()}
    gA, gB, joint, fake_a, fake_b, m = g_step(gA, gB, dA, dB, batch, joint)
    assert np.isfinite(float(m["loss_G"]))
    pool = ImagePool(4, 0)
    dA, loss_da = d_step(dA, batch["B"], jnp.asarray(pool.query(np.asarray(fake_b))))
    assert np.isfinite(float(loss_da))
