"""INT8 conv formulation equivalence (frostnet_tpu/nn/conv.py INT8 branch).

Round 4 replaced the single s32 ``lax.conv`` lowering with shape-routed
fuse-friendly formulations (1x1 stride-1/2 as dot_general, depthwise as k*k
shifted integer multiply-adds) because the s32 conv epilogue cannot fuse on
TPU (VERDICT r3: seg INT8 bytes doubled). The integer math must stay
BIT-IDENTICAL across formulations (int32 addition is exact under
reordering), matching the reference's single torch.ao.nn.quantized.Conv2d
semantics (torch fuses at the backend, not per shape).

This test pins every routed shape class against the generic zp-padded s32
``lax.conv`` + analytic zero-point correction, computed here from the
module's own frozen operands (``int8_params_only=True``): same quantized
weights, bias, and output grid — only the integer contraction differs.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frostnet_tpu.nn import INT8, QAT
from frostnet_tpu.nn.conv import QConvBNAct, apply_activation
from frostnet_tpu.quant import FBGEMM, QNNPACK, quantize
from frostnet_tpu.quant.qtensor import QTensor

# name, features, k, stride, padding, dilation, groups, cin
CASES = [
    ("1x1_s1", 8, 1, 1, 0, 1, 1, 6),        # dot_general path
    ("1x1_s2", 8, 1, 2, 0, 1, 1, 6),        # dot_general + slice path
    ("dw_k3_s1", 6, 3, 1, 1, 1, 6, 6),      # shifted multiply-add path
    ("dw_k3_s2", 6, 3, 2, 1, 1, 6, 6),      # ... with stride
    ("dw_k3_dil2", 6, 3, 1, 2, 2, 6, 6),    # ... with dilation (atrous seg)
    ("dw_k5", 6, 5, 1, 2, 1, 6, 6),         # ... larger taps (MBv3 5x5)
    ("dw_mult2", 12, 3, 1, 1, 1, 6, 6),     # ... channel multiplier 2
    ("dense_3x3", 8, 3, 1, 1, 1, 1, 6),     # generic s32 lax.conv path
    ("stem_3x3_im2col", 16, 3, 2, 1, 1, 1, 3),   # im2col auto-engaged (27<=32)
    ("stem_7x7_im2col", 32, 7, 2, 3, 1, 1, 1),   # im2col 7x7 stem (49<=64)
]


def _generic_int8(xq, qw, w_scale, bf, out_scale, out_zp, *, stride, padding,
                  dilation, groups, act, aspec):
    """The one-formulation reference: zp-pad + s32 conv + analytic zp fix."""
    x8 = (xq.q.astype(jnp.int32) - 128).astype(jnp.int8)
    zp_eff = (xq.zero_point - 128).astype(jnp.int32)
    x8p = jax.lax.pad(x8, zp_eff.astype(jnp.int8),
                      ((0, 0, 0), (padding, padding, 0),
                       (padding, padding, 0), (0, 0, 0)))
    acc = jax.lax.conv_general_dilated(
        x8p, qw, (stride, stride), ((0, 0), (0, 0)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, preferred_element_type=jnp.int32)
    acc = acc - zp_eff * jnp.sum(qw.astype(jnp.int32), axis=(0, 1, 2))
    w_scale_b = (jnp.asarray(w_scale).reshape((1, 1, 1, -1))
                 if jnp.ndim(w_scale) else w_scale)
    y = acc.astype(jnp.float32) * (xq.scale * w_scale_b) + bf
    y = apply_activation(y, act)
    return quantize(y, out_scale, out_zp, aspec)


@pytest.mark.parametrize("qconfig", [QNNPACK, FBGEMM], ids=["qnnpack", "fbgemm"])
@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_int8_formulation_bit_identical_to_generic(case, qconfig):
    name, feat, k, stride, pad, dil, groups, cin = case
    model = QConvBNAct(features=feat, kernel_size=k, strides=stride,
                       padding=pad, dilation=dil, groups=groups, act="relu",
                       qconfig=qconfig)
    rng = np.random.RandomState(0)
    xf = jnp.asarray(rng.randn(2, 11, 13, cin).astype(np.float32) * 1.5)
    key = jax.random.PRNGKey(0)
    v = jax.jit(lambda kk, xx: model.init(kk, xx, mode=QAT, train=True))(key, xf)
    # calibrate observers with one QAT batch so the output grid is real
    _, mut = jax.jit(
        lambda vv, xx: model.apply(vv, xx, mode=QAT, train=True,
                                   mutable=["quant", "batch_stats"])
    )(v, xf)
    v = {"params": v["params"], **mut}

    # nonzero-zero-point uint8 input: exercises the analytic zp correction
    xq = QTensor(jnp.asarray(rng.randint(0, 256, (2, 11, 13, cin), np.uint8)),
                 jnp.float32(0.043), jnp.int32(117))

    got = jax.jit(lambda vv, xx: model.apply(vv, xx, mode=INT8))(v, xq)
    qw, w_scale, bf, out_scale, out_zp = jax.jit(
        lambda vv, xx: model.apply(vv, xx, mode=INT8, int8_params_only=True)
    )(v, xq)
    want = jax.jit(
        lambda xx: _generic_int8(xx, qw, w_scale, bf, out_scale, out_zp,
                                 stride=stride, padding=pad, dilation=dil,
                                 groups=groups, act="relu",
                                 aspec=qconfig.activation))(xq)

    assert got.q.dtype == want.dtype
    np.testing.assert_array_equal(np.asarray(got.q), np.asarray(want))
    np.testing.assert_allclose(float(got.scale), float(out_scale))
    assert int(got.zero_point) == int(out_zp)


def test_im2col_auto_gate():
    """The auto gate engages exactly where the modeled byte saving is >=2x
    (k^2*Cin <= 2*Cout): stems yes, body 3x3 Cin==Cout no."""
    from frostnet_tpu.nn.conv import _im2col_auto_profitable

    assert _im2col_auto_profitable(3, 3, 3, 32)        # mobile stem 3->32
    assert _im2col_auto_profitable(3, 3, 3, 16)        # tiny stem, boundary
    assert not _im2col_auto_profitable(7, 7, 3, 64)    # resnet/GAN 7x7 stem
    assert not _im2col_auto_profitable(3, 3, 64, 64)   # resnet body
    assert not _im2col_auto_profitable(3, 3, 6, 8)     # the dense_3x3 case

    # margin override: 1.0 also engages 7x7x3 stems, never Cin=Cout bodies
    from frostnet_tpu.nn.conv import set_im2col_gate_margin
    try:
        set_im2col_gate_margin(1.0)
        assert _im2col_auto_profitable(7, 7, 3, 64)
        assert not _im2col_auto_profitable(3, 3, 64, 64)
    finally:
        set_im2col_gate_margin(2.0)


@pytest.mark.parametrize("case", [
    # dense shapes the AUTO gate rejects: force the im2col route and pin it
    # bit-identical anyway (the whole-net A/B may widen the gate later)
    ("dense_3x3_forced", 8, 3, 1, 1, 1, 1, 6),
    ("dense_3x3_s2_forced", 8, 3, 2, 1, 1, 1, 6),
    ("dense_3x3_dil2_forced", 8, 3, 1, 2, 2, 1, 6),
    ("dense_7x7_forced", 8, 7, 2, 3, 1, 1, 6),
    ("dense_5x5_pad0_forced", 8, 5, 1, 0, 1, 1, 6),
], ids=lambda c: c[0])
def test_im2col_forced_bit_identical(case):
    from frostnet_tpu.nn import conv as conv_mod

    name, feat, k, stride, pad, dil, groups, cin = case
    model = QConvBNAct(features=feat, kernel_size=k, strides=stride,
                       padding=pad, dilation=dil, groups=groups, act="relu",
                       qconfig=QNNPACK)
    rng = np.random.RandomState(1)
    xf = jnp.asarray(rng.randn(2, 13, 15, cin).astype(np.float32) * 1.5)
    key = jax.random.PRNGKey(0)
    v = jax.jit(lambda kk, xx: model.init(kk, xx, mode=QAT, train=True))(key, xf)
    _, mut = jax.jit(
        lambda vv, xx: model.apply(vv, xx, mode=QAT, train=True,
                                   mutable=["quant", "batch_stats"])
    )(v, xf)
    v = {"params": v["params"], **mut}
    xq = QTensor(jnp.asarray(rng.randint(0, 256, (2, 13, 15, cin), np.uint8)),
                 jnp.float32(0.043), jnp.int32(117))
    try:
        conv_mod.set_int8_dense_im2col(True)
        got = jax.jit(lambda vv, xx: model.apply(vv, xx, mode=INT8))(v, xq)
    finally:
        conv_mod.set_int8_dense_im2col(None)
    # the generic one-formulation reference: forced OFF -> s32 lax.conv
    try:
        conv_mod.set_int8_dense_im2col(False)
        want = jax.jit(lambda vv, xx: model.apply(vv, xx, mode=INT8))(v, xq)
    finally:
        conv_mod.set_int8_dense_im2col(None)
    np.testing.assert_array_equal(np.asarray(got.q), np.asarray(want.q))
    np.testing.assert_allclose(float(got.scale), float(want.scale))
    assert int(got.zero_point) == int(want.zero_point)


def test_stem_im2col_routing_visible_in_hlo():
    """Structural pin for the serving default: an INT8 stem conv (3x3 s2
    3->32 — the shape class the +18% cls A/B/A validated) must lower as a
    dot (im2col route), and a body conv (Cin=Cout) must keep lax.conv —
    visible in the lowered StableHLO, so a silent routing regression fails
    here without a chip."""
    def lowered_text(cin, cout):
        model = QConvBNAct(features=cout, kernel_size=3, strides=2,
                           padding=1, act="relu", qconfig=QNNPACK)
        rng = np.random.RandomState(0)
        xf = jnp.asarray(rng.randn(1, 16, 16, cin).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), xf, mode=QAT, train=True)
        _, mut = model.apply(v, xf, mode=QAT, train=True,
                             mutable=["quant", "batch_stats"])
        v = {"params": v["params"], **mut}
        xq = QTensor(jnp.asarray(rng.randint(0, 256, (1, 16, 16, cin),
                                             np.uint8)),
                     jnp.float32(0.04), jnp.int32(120))
        return jax.jit(
            lambda xx: model.apply(v, xx, mode=INT8)).lower(xq).as_text()

    stem = lowered_text(3, 32)       # gate engages: 27 <= 64
    assert "dot_general" in stem or "dot" in stem
    assert "convolution" not in stem

    body = lowered_text(32, 32)      # gate rejects: 288 > 64
    assert "convolution" in body
