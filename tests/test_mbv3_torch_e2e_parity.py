"""MBv3 quant-op region parity vs torch's full QAT/convert pipeline.

test_torch_e2e_parity pins the FrostNet (pure-ReLU ops) end to end; the MBv3
ops — Hswish/Hsigmoid chains built from FloatFunctional + a hooked standalone
ReLU6, the SE gate mul, the unfused-ConvBN+Hswish pattern — have their
*training* dynamics pinned in test_qat_trajectory_parity. This test closes
the remaining static leg: one full quantized region

    QuantStub -> Bottleneck(HS, SE) -> DeQuantStub

(the reference's mobilenetv3.py:114-155 block, exercising expand ConvBN +
_Hswish, depthwise ConvBN, SEModule (fc stack + _Hsigmoid + gate mul),
standalone _Hswish, linear project, FloatFunctional skip add) run through
torch's own fuse -> prepare_qat('qnnpack') -> calibrate -> convert with the
SAME weights and calibration data as our mode-based pipeline:

  1. FP32 anchor: float forwards agree to f32 tolerance;
  2. with torch's observer/BN state copied in, QAT-sim outputs match within
     ~one quantum of the output grid;
  3. our INT8 outputs match torch.quantization.convert's within a few
     quanta (the SE fc runs integer-Linear there vs float-with-quantized-
     weights here, and quantized avg-pool rounds — bounded, not bit-equal).
"""
import importlib.util

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn
import torch.ao.quantization as tq
import flax.linen as fnn

from frostnet_tpu.nn import FP32, INT8, QAT, QAT_FROZEN, QuantMode
from frostnet_tpu.nn.blocks import BottleneckV3
from frostnet_tpu.nn.quant_ops import QuantStub, dequant
from frostnet_tpu.quant.observer import ObserverState

# Heavy tier: excluded from `pytest -m "not slow"` (the sub-15-min fast signal)
pytestmark = pytest.mark.slow

BS, IMG, CIN, COUT, EXP = 4, 16, 16, 16, 24


def _load_ref_mbv3():
    spec = importlib.util.spec_from_file_location(
        "ref_mbv3",
        "/root/reference/Classification/models/imagenet/mobilenetv3.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _JWrap(fnn.Module):
    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        x = QuantStub(name="quant")(x, mode)
        x = BottleneckV3(out_channels=COUT, exp_size=EXP, kernel_size=3,
                         strides=1, se=True, nl="HS", name="block")(
            x, mode, train)
        return dequant(x)


def _batches(n, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randn(BS, IMG, IMG, CIN).astype(np.float32) for _ in range(n)]


@pytest.fixture(scope="module")
def calibrated_pair():
    ref = _load_ref_mbv3()
    torch.manual_seed(0)

    class TWrap(tnn.Module):
        def __init__(self):
            super().__init__()
            self.quant = tq.QuantStub()
            self.block = ref.Bottleneck(CIN, COUT, EXP, 3, 1, se=True,
                                        nl="HS")
            self.dequant = tq.DeQuantStub()

        def forward(self, x):
            return self.dequant(self.block(self.quant(x)))

    tw = TWrap()
    tw.eval()

    # float weights, captured before fuse
    w_expand = tw.block.conv[0].cb.cb[0].weight.detach().numpy()
    w_dw = tw.block.conv[1].cb[0].weight.detach().numpy()
    w_fc1 = tw.block.conv[2].fc[0].weight.detach().numpy()
    w_fc2 = tw.block.conv[2].fc[2].weight.detach().numpy()
    w_proj = tw.block.conv[4].cb[0].weight.detach().numpy()

    jw = _JWrap()
    x0 = jnp.zeros((BS, IMG, IMG, CIN), jnp.float32)
    variables = jax.jit(lambda k, x: jw.init(k, x, mode=QAT, train=True))(
        jax.random.PRNGKey(0), x0)
    params = jax.tree.map(lambda v: v, variables["params"])
    blk = dict(params["block"])
    blk["expand"] = {**blk["expand"],
                    "kernel": jnp.asarray(w_expand.transpose(2, 3, 1, 0))}
    blk["dw"] = {**blk["dw"],
                 "kernel": jnp.asarray(w_dw.transpose(2, 3, 1, 0))}
    blk["project"] = {**blk["project"],
                      "kernel": jnp.asarray(w_proj.transpose(2, 3, 1, 0))}
    blk["se"] = dict(blk["se"])
    blk["se"]["fc1"] = {"kernel": jnp.asarray(w_fc1.T[:, :, None, None])}
    blk["se"]["fc2"] = {"kernel": jnp.asarray(w_fc2.T[:, :, None, None])}
    params = {**params, "block": blk}
    variables = {**variables, "params": params}

    # FP32 anchor
    xt = _batches(1, seed=99)[0]
    with torch.no_grad():
        want_fp = tw(torch.from_numpy(xt.transpose(0, 3, 1, 2))).numpy()
    got_fp = np.asarray(jax.jit(
        lambda v, i: jw.apply(v, i, mode=FP32))(variables, jnp.asarray(xt)))
    np.testing.assert_allclose(got_fp.transpose(0, 3, 1, 2), want_fp,
                               atol=2e-5, rtol=1e-4)

    # torch fuse -> prepare_qat -> calibrate (same shim as the FrostNet test:
    # the reference's fuse_model calls torch.quantization.fuse_modules, which
    # in torch 2.x dispatches to the eval fuser — swap in the qat variant)
    tw.train()
    orig_fuse = torch.quantization.fuse_modules
    torch.quantization.fuse_modules = tq.fuse_modules_qat
    try:
        tw.block.fuse_model()
    finally:
        torch.quantization.fuse_modules = orig_fuse
    tw.qconfig = tq.get_default_qat_qconfig("qnnpack")
    tq.prepare_qat(tw, inplace=True)

    apply_qat = jax.jit(lambda v, i: jw.apply(
        v, i, mode=QAT, train=True, mutable=["quant", "batch_stats"]))
    variables = dict(variables)
    for xb in _batches(3, seed=7):
        with torch.no_grad():
            tw(torch.from_numpy(xb.transpose(0, 3, 1, 2)))
        _, mutated = apply_qat(variables, jnp.asarray(xb))
        variables.update(mutated)

    tw.eval()
    tw.apply(tq.disable_observer)
    return tw, jw, variables


def _inner(fq):
    o = getattr(fq, "activation_post_process", fq)
    return getattr(o, "activation_post_process", o)


def _torch_observer_map(tw):
    """our 'quant' path -> torch observer, for the whole wrapped region."""
    b = tw.block
    return {
        ("quant", "act"): _inner(tw.quant),
        ("block", "expand", "w_obs"): _inner(
            b.conv[0].cb.cb[0].weight_fake_quant),
        ("block", "expand", "act_obs"): _inner(b.conv[0].cb.cb[0]),
        ("block", "expand_hs", "relu6_obs"): _inner(b.conv[0].act.relu6),
        ("block", "expand_hs", "quant_mul", "act"): _inner(
            b.conv[0].act.quant_mul1),
        ("block", "dw", "w_obs"): _inner(b.conv[1].cb[0].weight_fake_quant),
        ("block", "dw", "act_obs"): _inner(b.conv[1].cb[0]),
        ("block", "se", "fc1", "w_obs"): _inner(
            b.conv[2].fc[0].weight_fake_quant),
        ("block", "se", "fc1", "act_obs"): _inner(b.conv[2].fc[0]),
        ("block", "se", "fc2", "w_obs"): _inner(
            b.conv[2].fc[2].weight_fake_quant),
        ("block", "se", "fc2", "act_obs"): _inner(b.conv[2].fc[2]),
        ("block", "se", "hsig", "relu6_obs"): _inner(b.conv[2].fc[3].relu6),
        ("block", "se", "quant_mul", "act"): _inner(b.conv[2].quant_mul),
        ("block", "dw_hs", "relu6_obs"): _inner(b.conv[3].relu6),
        ("block", "dw_hs", "quant_mul", "act"): _inner(b.conv[3].quant_mul1),
        ("block", "project", "w_obs"): _inner(
            b.conv[4].cb[0].weight_fake_quant),
        ("block", "project", "act_obs"): _inner(b.conv[4].cb[0]),
        ("block", "skip_add", "act"): _inner(b.skip_add),
    }


def _walk(tree, path=()):
    if isinstance(tree, ObserverState):
        yield path, tree
        return
    for k in tree:
        yield from _walk(tree[k], path + (k,))


def test_observers_track_torch(calibrated_pair):
    """Independent calibration lands every observer near torch's (20% of
    span envelope — same policy as the FrostNet e2e test; the Hswish
    chains round through two extra grids)."""
    tw, jw, variables = calibrated_pair
    omap = _torch_observer_map(tw)
    seen = set()
    for path, obs in _walk(variables["quant"]):
        assert path in omap, f"unmapped observer path {path}"
        seen.add(path)
        tobs = omap[path]
        t_lo, t_hi = float(tobs.min_val), float(tobs.max_val)
        span = max(t_hi - t_lo, 1e-3)
        assert abs(float(obs.min_val) - t_lo) / span < 0.20, (path, t_lo, t_hi)
        assert abs(float(obs.max_val) - t_hi) / span < 0.20, (path, t_lo, t_hi)
    assert seen == set(omap), f"missing observers: {set(omap) - seen}"


def _synced(tw, variables):
    omap = _torch_observer_map(tw)

    def rebuild(tree, path=()):
        if isinstance(tree, ObserverState):
            tobs = omap[path]
            return ObserverState(min_val=jnp.float32(float(tobs.min_val)),
                                 max_val=jnp.float32(float(tobs.max_val)))
        return {k: rebuild(v, path + (k,)) for k, v in tree.items()}

    bn_map = {
        "expand": tw.block.conv[0].cb.cb[0].bn,
        "dw": tw.block.conv[1].cb[0].bn,
        "project": tw.block.conv[4].cb[0].bn,
    }
    bs = {"block": {}}
    for name, bn in bn_map.items():
        bs["block"][name] = {
            "mean": jnp.asarray(bn.running_mean.detach().numpy()),
            "var": jnp.asarray(bn.running_var.detach().numpy())}
    return {**variables, "quant": rebuild(variables["quant"]),
            "batch_stats": bs}


def test_qat_sim_outputs_match_torch(calibrated_pair):
    """With torch's observers/BN stats copied in, the fake-quant sim of the
    whole region matches torch's prepared-eval forward within ~one quantum
    of the output (skip_add) grid."""
    tw, jw, variables = calibrated_pair
    synced = _synced(tw, variables)
    xt = _batches(1, seed=123)[0]
    with torch.no_grad():
        want = tw(torch.from_numpy(xt.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(jax.jit(lambda v, i: jw.apply(v, i, mode=QAT_FROZEN))(
        synced, jnp.asarray(xt)))
    out_obs = _torch_observer_map(tw)[("block", "skip_add", "act")]
    quantum = (float(out_obs.max_val) - float(out_obs.min_val)) / 255.0
    diff = np.abs(got.transpose(0, 3, 1, 2) - want).max()
    assert diff <= 1.5 * quantum, (diff, quantum)


def test_int8_outputs_match_torch_converted(calibrated_pair):
    """True-INT8 vs torch.quantization.convert on the same synced state: the
    integer conv/mul/add chain agrees to a few output quanta (the SE fc and
    avg-pool are integer ops there vs float-with-quantized-weights here)."""
    tw, jw, variables = calibrated_pair
    synced = _synced(tw, variables)
    tconv = tq.convert(tw.eval(), inplace=False)
    xt = _batches(1, seed=321)[0]
    with torch.no_grad():
        want = tconv(torch.from_numpy(xt.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(jax.jit(lambda v, i: jw.apply(v, i, mode=INT8))(
        synced, jnp.asarray(xt)))
    out_obs = _torch_observer_map(tw)[("block", "skip_add", "act")]
    quantum = (float(out_obs.max_val) - float(out_obs.min_val)) / 255.0
    diff = np.abs(got.transpose(0, 3, 1, 2) - want).max()
    assert diff <= 4 * quantum, (diff, quantum)


def test_re_bottleneck_region_matches_torch(tmp_path):
    """The RE bottleneck's BARE post-SE nn.ReLU (reference mobilenetv3.py:137)
    gets NO observer in torch eager QAT (ReLU is in the no-observe
    passthrough set, unlike ReLU6 — verified round 5, and the round-5
    relu_obs addition was reverted accordingly). Pin the whole RE+SE
    region's synced QAT-sim and converted-INT8 outputs like the HS region
    above; the observer-map equality also asserts no extra observer
    exists at the bare-relu site."""
    ref = _load_ref_mbv3()
    torch.manual_seed(5)

    class TWrap(tnn.Module):
        def __init__(self):
            super().__init__()
            self.quant = tq.QuantStub()
            self.block = ref.Bottleneck(CIN, COUT, EXP, 3, 1, se=True,
                                        nl="RE")
            self.dequant = tq.DeQuantStub()

        def forward(self, x):
            return self.dequant(self.block(self.quant(x)))

    class JWrap(fnn.Module):
        @fnn.compact
        def __call__(self, x, mode: QuantMode = QuantMode(),
                     train: bool = False):
            x = QuantStub(name="quant")(x, mode)
            x = BottleneckV3(out_channels=COUT, exp_size=EXP, kernel_size=3,
                             strides=1, se=True, nl="RE", name="block")(
                x, mode, train)
            return dequant(x)

    tw = TWrap()
    tw.eval()
    w_expand = tw.block.conv[0].cbr[0].weight.detach().numpy()
    w_dw = tw.block.conv[1].cb[0].weight.detach().numpy()
    w_fc1 = tw.block.conv[2].fc[0].weight.detach().numpy()
    w_fc2 = tw.block.conv[2].fc[2].weight.detach().numpy()
    w_proj = tw.block.conv[4].cb[0].weight.detach().numpy()

    jw = JWrap()
    x0 = jnp.zeros((BS, IMG, IMG, CIN), jnp.float32)
    variables = jax.jit(lambda k, x: jw.init(k, x, mode=QAT, train=True))(
        jax.random.PRNGKey(1), x0)
    params = jax.tree.map(lambda v: v, variables["params"])
    blk = dict(params["block"])
    blk["expand"] = {**blk["expand"],
                     "kernel": jnp.asarray(w_expand.transpose(2, 3, 1, 0))}
    blk["dw"] = {**blk["dw"], "kernel": jnp.asarray(w_dw.transpose(2, 3, 1, 0))}
    blk["project"] = {**blk["project"],
                      "kernel": jnp.asarray(w_proj.transpose(2, 3, 1, 0))}
    blk["se"] = dict(blk["se"])
    blk["se"]["fc1"] = {"kernel": jnp.asarray(w_fc1.T[:, :, None, None])}
    blk["se"]["fc2"] = {"kernel": jnp.asarray(w_fc2.T[:, :, None, None])}
    variables = {**variables, "params": {**params, "block": blk}}

    tw.train()
    orig_fuse = torch.quantization.fuse_modules
    torch.quantization.fuse_modules = tq.fuse_modules_qat
    try:
        tw.block.fuse_model()
    finally:
        torch.quantization.fuse_modules = orig_fuse
    tw.qconfig = tq.get_default_qat_qconfig("qnnpack")
    tq.prepare_qat(tw, inplace=True)

    apply_qat = jax.jit(lambda v, i: jw.apply(
        v, i, mode=QAT, train=True, mutable=["quant", "batch_stats"]))
    variables = dict(variables)
    for xb in _batches(3, seed=17):
        with torch.no_grad():
            tw(torch.from_numpy(xb.transpose(0, 3, 1, 2)))
        _, mutated = apply_qat(variables, jnp.asarray(xb))
        variables.update(mutated)
    tw.eval()
    tw.apply(tq.disable_observer)

    b = tw.block
    omap = {
        ("quant", "act"): _inner(tw.quant),
        ("block", "expand", "w_obs"): _inner(b.conv[0].cbr[0].weight_fake_quant),
        ("block", "expand", "act_obs"): _inner(b.conv[0].cbr[0]),
        ("block", "dw", "w_obs"): _inner(b.conv[1].cb[0].weight_fake_quant),
        ("block", "dw", "act_obs"): _inner(b.conv[1].cb[0]),
        ("block", "se", "fc1", "w_obs"): _inner(b.conv[2].fc[0].weight_fake_quant),
        ("block", "se", "fc1", "act_obs"): _inner(b.conv[2].fc[0]),
        ("block", "se", "fc2", "w_obs"): _inner(b.conv[2].fc[2].weight_fake_quant),
        ("block", "se", "fc2", "act_obs"): _inner(b.conv[2].fc[2]),
        ("block", "se", "hsig", "relu6_obs"): _inner(b.conv[2].fc[3].relu6),
        ("block", "se", "quant_mul", "act"): _inner(b.conv[2].quant_mul),
        ("block", "project", "w_obs"): _inner(b.conv[4].cb[0].weight_fake_quant),
        ("block", "project", "act_obs"): _inner(b.conv[4].cb[0]),
        ("block", "skip_add", "act"): _inner(b.skip_add),
    }
    seen = {p for p, _ in _walk(variables["quant"])}
    assert seen == set(omap), (seen ^ set(omap))

    def rebuild(tree, path=()):
        if isinstance(tree, ObserverState):
            tobs = omap[path]
            return ObserverState(min_val=jnp.float32(float(tobs.min_val)),
                                 max_val=jnp.float32(float(tobs.max_val)))
        return {k: rebuild(v, path + (k,)) for k, v in tree.items()}

    bn_map = {"expand": b.conv[0].cbr[0].bn, "dw": b.conv[1].cb[0].bn,
              "project": b.conv[4].cb[0].bn}
    bs = {"block": {n: {"mean": jnp.asarray(m.running_mean.detach().numpy()),
                        "var": jnp.asarray(m.running_var.detach().numpy())}
                    for n, m in bn_map.items()}}
    synced = {**variables, "quant": rebuild(variables["quant"]),
              "batch_stats": bs}

    xt = _batches(1, seed=55)[0]
    out_obs = omap[("block", "skip_add", "act")]
    quantum = (float(out_obs.max_val) - float(out_obs.min_val)) / 255.0

    with torch.no_grad():
        want_qat = tw(torch.from_numpy(xt.transpose(0, 3, 1, 2))).numpy()
    got_qat = np.asarray(jax.jit(lambda v, i: jw.apply(v, i, mode=QAT_FROZEN))(
        synced, jnp.asarray(xt)))
    assert np.abs(got_qat.transpose(0, 3, 1, 2) - want_qat).max() <= 1.5 * quantum

    tconv = tq.convert(tw.eval(), inplace=False)
    with torch.no_grad():
        want_i8 = tconv(torch.from_numpy(xt.transpose(0, 3, 1, 2))).numpy()
    got_i8 = np.asarray(jax.jit(lambda v, i: jw.apply(v, i, mode=INT8))(
        synced, jnp.asarray(xt)))
    assert np.abs(got_i8.transpose(0, 3, 1, 2) - want_i8).max() <= 4 * quantum
