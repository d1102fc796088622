"""Tests for the space-to-depth small-Cout conv (ops/s2d_conv.py).

Equality vs ``lax.conv`` SAME is checked on integer-valued float inputs:
every product and partial sum stays well inside f32's exact-integer range,
so the result must be BIT-equal no matter how the transform reorders the
contraction. Real-valued inputs are then checked to normal f32 tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frostnet_tpu.ops import s2d_conv


def _ref_conv(x, w):
    k = w.shape[0]
    p = k // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _int_valued(key, shape, lo=-4, hi=5):
    return jax.random.randint(key, shape, lo, hi, jnp.int32).astype(jnp.float32)


@pytest.mark.parametrize("k,block,cin,cout,hw", [
    (7, 4, 8, 3, 16),    # the GAN tail shape family
    (7, 4, 8, 3, 24),    # hw not a power of two
    (5, 4, 4, 2, 16),    # k//2 < block
    (3, 4, 4, 1, 8),     # tiny kernel
    (7, 2, 4, 3, 12),    # block smaller than k//2 (pb=2, kb=5)
    (9, 4, 4, 2, 16),    # k//2 == block
])
def test_bit_equal_on_integer_data(k, block, cin, cout, hw):
    kx, kw = jax.random.split(jax.random.PRNGKey(k * 100 + block))
    x = _int_valued(kx, (2, hw, hw, cin))
    w = _int_valued(kw, (k, k, cin, cout))
    pb = -(-(k // 2) // block)
    kb = 2 * pb + 1
    got = s2d_conv.conv_same_s2d(x, w, block, pb, kb)
    ref = _ref_conv(x, w)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_close_on_real_data():
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (2, 16, 16, 8), jnp.float32)
    w = jax.random.normal(kw, (7, 7, 8, 3), jnp.float32) * 0.1
    got = s2d_conv.conv_same_s2d(x, w, 4, 1, 3)
    ref = _ref_conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradients_flow_and_match():
    kx, kw = jax.random.split(jax.random.PRNGKey(3))
    x = _int_valued(kx, (1, 8, 8, 4), -2, 3)
    w = _int_valued(kw, (7, 7, 4, 3), -2, 3)

    g_ref = jax.grad(lambda w_: jnp.sum(_ref_conv(x, w_) ** 2))(w)
    g_got = jax.grad(lambda w_: jnp.sum(
        s2d_conv.conv_same_s2d(x, w_, 4, 1, 3) ** 2))(w)
    np.testing.assert_array_equal(np.asarray(g_got), np.asarray(g_ref))


def test_plan_gates():
    # the GAN tail: huge win, accepted
    assert s2d_conv.plan(7, 4, 256, 256, 3) == (1, 3)
    # large cout: packed channels exceed a lane tile -> rejected
    assert s2d_conv.plan(7, 4, 256, 256, 64) is None
    # non-divisible spatial dims -> rejected
    assert s2d_conv.plan(7, 4, 255, 256, 3) is None
    # even kernel -> rejected
    assert s2d_conv.plan(4, 4, 256, 256, 3) is None
    # 1x1 -> rejected
    assert s2d_conv.plan(1, 4, 256, 256, 3) is None
    # 3x3 cout=3: multiplier (3*4/3)^2=16 vs gain 16 -> no 2x margin
    assert s2d_conv.plan(3, 4, 256, 256, 3) is None


def test_qconvbnact_tail_route_matches_native(monkeypatch):
    """The GAN-tail geometry: pad=0 valid 7x7 on a pre-padded input, cout=3.

    The canvas logic in QConvBNAct._conv_s2d must reproduce the native conv
    bit-for-bit on integer-valued data (zero extra padding + slicing only).
    """
    from frostnet_tpu.nn.conv import QConvBNAct

    model = QConvBNAct(3, 7, padding=0, use_bn=False, use_bias=True,
                       act=None, quantized=False)
    kx = jax.random.PRNGKey(11)
    # 22x22 input (not divisible by 4) -> 16x16 output, like 262 -> 256
    x = _int_valued(kx, (2, 22, 22, 8))
    variables = model.init(jax.random.PRNGKey(12), x)
    # integer-valued weights so the comparison is exact
    w = _int_valued(jax.random.PRNGKey(13), (7, 7, 8, 3))
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    variables = {"params": {**variables["params"], "kernel": w}}

    got = model.apply(variables, x)
    assert got.shape == (2, 16, 16, 3)

    monkeypatch.setattr(s2d_conv, "plan", lambda *a: None)  # force native
    ref = model.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_qconvbnact_s2d_route_is_taken():
    """plan() accepts the tail shape, so the route must actually engage."""
    from frostnet_tpu.nn.conv import QConvBNAct

    model = QConvBNAct(3, 7, padding=0, use_bn=False, use_bias=True,
                       act=None, quantized=False)
    x = jnp.zeros((1, 22, 22, 8), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    bound = model.bind(variables)
    w = variables["params"]["kernel"]
    y = bound._conv_s2d(x, w, (1, 1), ((0, 0), (0, 0)), (1, 1))
    assert y is not None and y.shape == (1, 16, 16, 3)


def test_set_s2d_float_conv_toggle():
    """set_s2d_float_conv(False) must force the native conv route."""
    from frostnet_tpu.nn import conv as conv_mod

    model = conv_mod.QConvBNAct(3, 7, padding=0, use_bn=False, use_bias=True,
                                act=None, quantized=False)
    x = jnp.zeros((1, 22, 22, 8), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    bound = model.bind(variables)
    w = variables["params"]["kernel"]
    try:
        conv_mod.set_s2d_float_conv(False)
        assert bound._conv_s2d(x, w, (1, 1), ((0, 0), (0, 0)), (1, 1)) is None
    finally:
        conv_mod.set_s2d_float_conv(True)
    y = bound._conv_s2d(x, w, (1, 1), ((0, 0), (0, 0)), (1, 1))
    assert y is not None
