"""Tests for the flag-gated float depthwise shifted-MA route
(QConvBNAct._conv_dw_ma, nn/conv.py).

The route lowers a float depthwise conv as k*k shifted multiply-adds (the
float twin of the INT8 depthwise formulation). It accumulates in f32, so on
integer-valued float inputs every product and partial sum is exact and the
result must be BIT-equal to ``lax.conv_general_dilated`` regardless of
contraction order; real-valued inputs are then checked to f32 tolerance.
Advisor round-4 finding: this route previously had no CI coverage.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frostnet_tpu.nn import conv as conv_mod
from frostnet_tpu.nn.conv import QConvBNAct


@pytest.fixture(autouse=True)
def _enable_dw_ma():
    conv_mod.set_dw_ma_float_conv(True)
    yield
    conv_mod.set_dw_ma_float_conv(False)


def _int_valued(key, shape, lo=-4, hi=5):
    return jax.random.randint(key, shape, lo, hi, jnp.int32).astype(jnp.float32)


def _ref_conv(x, w, strides, padding, dilation, groups):
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def _make(cin, mult, k, stride, pad, dilation):
    return QConvBNAct(cin * mult, k, strides=stride, padding=pad,
                      dilation=dilation, groups=cin, use_bn=False,
                      use_bias=False, act=None, quantized=False)


@pytest.mark.parametrize("cin,mult,k,stride,pad,dilation,hw", [
    (8, 1, 3, 1, 1, 1, 12),   # the standard mobile depthwise 3x3
    (8, 1, 3, 2, 1, 1, 12),   # stride 2
    (4, 1, 5, 1, 2, 1, 12),   # 5x5
    (4, 1, 3, 1, 2, 2, 14),   # dilation 2 (dilated seg backbones)
    (4, 2, 3, 1, 1, 1, 10),   # channel multiplier > 1
    (4, 3, 3, 2, 0, 1, 11),   # mult>1 + stride 2 + padding 0 + odd size
    (6, 1, 3, 1, 0, 1, 9),    # padding 0
])
def test_bit_equal_vs_lax_conv_on_integer_data(cin, mult, k, stride, pad,
                                               dilation, hw):
    model = _make(cin, mult, k, stride, pad, dilation)
    kx, kw = jax.random.split(jax.random.PRNGKey(cin * 100 + k * 10 + stride))
    x = _int_valued(kx, (2, hw, hw, cin))
    w = _int_valued(kw, (k, k, 1, cin * mult))
    bound = model.bind({"params": {"kernel": w}})
    padding = ((pad, pad), (pad, pad))
    got = bound._conv_dw_ma(x, w, (stride, stride), padding,
                            (dilation, dilation))
    assert got is not None, "route must engage for depthwise shapes"
    ref = _ref_conv(x, w, (stride, stride), padding, (dilation, dilation), cin)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_close_on_real_data():
    model = _make(8, 1, 3, 1, 1, 1)
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (2, 12, 12, 8), jnp.float32)
    w = jax.random.normal(kw, (3, 3, 1, 8), jnp.float32) * 0.3
    bound = model.bind({"params": {"kernel": w}})
    got = bound._conv_dw_ma(x, w, (1, 1), ((1, 1), (1, 1)), (1, 1))
    ref = _ref_conv(x, w, (1, 1), ((1, 1), (1, 1)), (1, 1), 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradients_flow_and_match():
    model = _make(4, 1, 3, 1, 1, 1)
    kx, kw = jax.random.split(jax.random.PRNGKey(3))
    x = _int_valued(kx, (1, 8, 8, 4), -2, 3)
    w = _int_valued(kw, (3, 3, 1, 4), -2, 3)
    bound = model.bind({"params": {"kernel": w}})

    def loss_ma(w_):
        return jnp.sum(bound._conv_dw_ma(
            x, w_, (1, 1), ((1, 1), (1, 1)), (1, 1)) ** 2)

    def loss_ref(w_):
        return jnp.sum(_ref_conv(x, w_, (1, 1), ((1, 1), (1, 1)),
                                 (1, 1), 4) ** 2)

    g_got = jax.grad(loss_ma)(w)
    g_ref = jax.grad(loss_ref)(w)
    np.testing.assert_array_equal(np.asarray(g_got), np.asarray(g_ref))


def test_route_rejects_non_depthwise_and_1x1():
    bound = QConvBNAct(8, 3, padding=1, groups=1, use_bn=False, act=None,
                       quantized=False).bind(
        {"params": {"kernel": jnp.zeros((3, 3, 8, 8))}})
    # dense conv: groups == 1 -> native path
    assert bound._conv_dw_ma(jnp.zeros((1, 8, 8, 8)),
                             jnp.zeros((3, 3, 8, 8)), (1, 1),
                             ((1, 1), (1, 1)), (1, 1)) is None
    # 1x1 depthwise: nothing to shift -> native path
    bound1 = QConvBNAct(8, 1, padding=0, groups=8, use_bn=False, act=None,
                        quantized=False).bind(
        {"params": {"kernel": jnp.zeros((1, 1, 1, 8))}})
    assert bound1._conv_dw_ma(jnp.zeros((1, 8, 8, 8)),
                              jnp.zeros((1, 1, 1, 8)), (1, 1),
                              ((0, 0), (0, 0)), (1, 1)) is None


def test_set_dw_ma_float_conv_toggle():
    """set_dw_ma_float_conv(False) must force the native conv route, and
    whole-module apply must give the same output either way (f32 tolerance)."""
    model = _make(8, 1, 3, 1, 1, 1)
    x = _int_valued(jax.random.PRNGKey(5), (1, 10, 10, 8))
    variables = model.init(jax.random.PRNGKey(6), x)
    w = _int_valued(jax.random.PRNGKey(7), (3, 3, 1, 8))
    variables = {"params": {"kernel": w}}
    bound = model.bind(variables)

    on = model.apply(variables, x)
    conv_mod.set_dw_ma_float_conv(False)
    assert bound._conv_dw_ma(x, w, (1, 1), ((1, 1), (1, 1)), (1, 1)) is None
    off = model.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(on), np.asarray(off))
