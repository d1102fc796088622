"""Golden tests: frostnet_tpu.quant numerics vs PyTorch's quantization stack.

The reference's correctness contract is PyTorch QAT numerics ('qnnpack' and
'fbgemm' qconfigs — SURVEY.md §2.6). These tests pin our functional
implementation bit-faithfully against torch.ao.quantization itself (not
against reference code).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.ao.quantization as tq

from frostnet_tpu import quant as q


def rand(shape, seed=0, lo=-3.0, hi=3.0):
    rng = np.random.RandomState(seed)
    return (rng.rand(*shape) * (hi - lo) + lo).astype(np.float32)


# ---------------------------------------------------------------------------
# Observers + qparams
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 1, 2])
def test_moving_average_observer_affine_quint8(seed):
    torch_obs = tq.MovingAverageMinMaxObserver(
        averaging_constant=0.01, dtype=torch.quint8,
        qscheme=torch.per_tensor_affine, reduce_range=False)
    state = q.init_observer()
    for i in range(5):
        x = rand((4, 7), seed=seed * 10 + i)
        torch_obs(torch.from_numpy(x))
        state = q.update_observer(state, jnp.asarray(x), q.QNNPACK_ACT)
    t_scale, t_zp = torch_obs.calculate_qparams()
    scale, zp = q.calculate_qparams(state, q.QNNPACK_ACT)
    np.testing.assert_allclose(float(scale), t_scale.item(), rtol=1e-6)
    assert int(zp) == int(t_zp.item())


@pytest.mark.parametrize("seed,lo,hi", [(0, -3, 3), (1, 0.5, 2.0), (2, -2.0, -0.1)])
def test_observer_symmetric_qint8(seed, lo, hi):
    torch_obs = tq.MovingAverageMinMaxObserver(
        averaging_constant=0.01, dtype=torch.qint8,
        qscheme=torch.per_tensor_symmetric, reduce_range=False,
        quant_min=-128, quant_max=127)
    state = q.init_observer()
    for i in range(3):
        x = rand((16,), seed=seed * 5 + i, lo=lo, hi=hi)
        torch_obs(torch.from_numpy(x))
        state = q.update_observer(state, jnp.asarray(x), q.QNNPACK_WEIGHT)
    t_scale, t_zp = torch_obs.calculate_qparams()
    scale, zp = q.calculate_qparams(state, q.QNNPACK_WEIGHT)
    np.testing.assert_allclose(float(scale), t_scale.item(), rtol=1e-6)
    assert int(zp) == int(t_zp.item()) == 0


def test_observer_reduce_range_fbgemm_act():
    torch_obs = tq.MovingAverageMinMaxObserver(
        averaging_constant=0.01, dtype=torch.quint8,
        qscheme=torch.per_tensor_affine, reduce_range=True)
    state = q.init_observer()
    x = rand((32,), seed=3)
    torch_obs(torch.from_numpy(x))
    state = q.update_observer(state, jnp.asarray(x), q.FBGEMM_ACT)
    t_scale, t_zp = torch_obs.calculate_qparams()
    scale, zp = q.calculate_qparams(state, q.FBGEMM_ACT)
    np.testing.assert_allclose(float(scale), t_scale.item(), rtol=1e-6)
    assert int(zp) == int(t_zp.item())


def test_per_channel_observer_symmetric():
    torch_obs = tq.MovingAveragePerChannelMinMaxObserver(
        averaging_constant=0.01, ch_axis=0, dtype=torch.qint8,
        qscheme=torch.per_channel_symmetric, reduce_range=False,
        quant_min=-128, quant_max=127)
    state = q.init_observer(num_channels=6)
    for i in range(3):
        x = rand((6, 3, 3, 3), seed=20 + i)
        torch_obs(torch.from_numpy(x))
        state = q.update_observer(state, jnp.asarray(x), q.FBGEMM_WEIGHT, channel_axis=0)
    t_scale, t_zp = torch_obs.calculate_qparams()
    scale, zp = q.calculate_qparams(state, q.FBGEMM_WEIGHT)
    np.testing.assert_allclose(np.asarray(scale), t_scale.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(zp), t_zp.numpy())


def test_minmax_running_observer():
    """averaging_constant=None -> MinMaxObserver (running min/max) semantics."""
    spec = q.QSpec(qmin=0, qmax=255, symmetric=False, averaging_constant=None)
    torch_obs = tq.MinMaxObserver(dtype=torch.quint8, qscheme=torch.per_tensor_affine)
    state = q.init_observer()
    for i in range(4):
        x = rand((10,), seed=40 + i)
        torch_obs(torch.from_numpy(x))
        state = q.update_observer(state, jnp.asarray(x), spec)
    t_scale, t_zp = torch_obs.calculate_qparams()
    scale, zp = q.calculate_qparams(state, spec)
    np.testing.assert_allclose(float(scale), t_scale.item(), rtol=1e-6)
    assert int(zp) == int(t_zp.item())


def test_uninitialized_observer_identity_qparams():
    scale, zp = q.calculate_qparams(q.init_observer(), q.QNNPACK_ACT)
    assert float(scale) == 1.0 and int(zp) == 0


# ---------------------------------------------------------------------------
# Fake-quant forward/backward
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("scale,zp", [(0.0213, 7), (0.1, 0), (0.004, 255)])
def test_fake_quant_per_tensor_forward(scale, zp):
    x = rand((64,), seed=5, lo=-2, hi=2)
    ref = torch.fake_quantize_per_tensor_affine(
        torch.from_numpy(x), scale, zp, 0, 255).numpy()
    out = q.fake_quantize(jnp.asarray(x), jnp.float32(scale), jnp.int32(zp), q.QNNPACK_ACT)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_fake_quant_per_channel_forward():
    x = rand((4, 5), seed=6)
    scales = np.array([0.01, 0.02, 0.005, 0.03], dtype=np.float32)
    zps = np.zeros(4, dtype=np.int32)
    ref = torch.fake_quantize_per_channel_affine(
        torch.from_numpy(x), torch.from_numpy(scales), torch.from_numpy(zps),
        0, -128, 127).numpy()
    out = q.fake_quantize(jnp.asarray(x), jnp.asarray(scales),
                          jnp.asarray(zps, dtype=jnp.int32), q.QNNPACK_WEIGHT,
                          channel_axis=0)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_fake_quant_ste_gradient():
    """STE: unit gradient inside the representable range, zero where clamped."""
    scale, zp = 0.05, 128
    x = np.linspace(-10, 10, 101, dtype=np.float32)

    tx = torch.from_numpy(x).requires_grad_(True)
    tout = torch.fake_quantize_per_tensor_affine(tx, scale, zp, 0, 255)
    tout.sum().backward()

    f = lambda v: q.fake_quantize(v, jnp.float32(scale), jnp.int32(zp), q.QNNPACK_ACT).sum()
    g = jax.grad(f)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), tx.grad.numpy(), atol=1e-6)
    assert float(g.min()) == 0.0 and float(g.max()) == 1.0  # both regimes hit


def test_quantize_dequantize_roundtrip():
    x = rand((32,), seed=9)
    spec = q.QNNPACK_ACT
    state = q.update_observer(q.init_observer(), jnp.asarray(x), spec)
    scale, zp = q.calculate_qparams(state, spec)
    qx = q.quantize(jnp.asarray(x), scale, zp, spec)
    assert qx.dtype == jnp.uint8
    dq = q.dequantize(qx, scale, zp)
    fq = q.fake_quantize(jnp.asarray(x), scale, zp, spec)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(fq), atol=1e-6)


# ---------------------------------------------------------------------------
# BN folding
# ---------------------------------------------------------------------------

def test_fold_bn_matches_eval_conv_bn():
    """conv(x, fold(W)) == BN_eval(conv(x, W)) — checked against torch."""
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(3, 8, 3, bias=False)
    bn = torch.nn.BatchNorm2d(8)
    bn.running_mean.uniform_(-1, 1)
    bn.running_var.uniform_(0.5, 2.0)
    bn.weight.data.uniform_(0.5, 1.5)
    bn.bias.data.uniform_(-1, 1)
    conv.eval(); bn.eval()
    x = torch.randn(2, 3, 16, 16)
    want = bn(conv(x)).detach().numpy()

    # torch OIHW -> jax HWIO
    w_hwio = jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0))
    wf, bf = q.fold_bn(
        w_hwio, None,
        jnp.asarray(bn.weight.detach().numpy()),
        jnp.asarray(bn.bias.detach().numpy()),
        jnp.asarray(bn.running_mean.numpy()),
        jnp.asarray(bn.running_var.numpy()),
        eps=bn.eps)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))  # NCHW -> NHWC
    out = jax.lax.conv_general_dilated(
        xj, wf, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")) + bf
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), want, atol=2e-5, rtol=1e-5)


def test_freeze_matches_int8_mode():
    """freeze() is convert(): jitted INT8 apply with constant-folded weights."""
    from frostnet_tpu.models import create_model
    from frostnet_tpu import nn as fq
    from frostnet_tpu.quant import freeze

    model = create_model("frostnet_quant_small_0_35", num_classes=10)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 32, 32, 3))
    v = jax.jit(lambda k, xx: model.init(k, xx, mode=fq.QAT, train=True))(key, x)
    frozen = freeze(model, v)
    want = jax.jit(lambda vv, xx: model.apply(vv, xx, mode=fq.INT8))(v, x)
    np.testing.assert_allclose(np.asarray(frozen(x)), np.asarray(want), atol=1e-6)
