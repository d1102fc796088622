"""Exactness tests for the fused dense 3x3/s1 INT8 Pallas conv.

The kernel (ops/pallas_int8_conv.py) must be BIT-IDENTICAL to the unfused
XLA composition in nn/conv.py's INT8 dense branch: same integer conv, same
zero-point correction, same f32 dequant/bias/act/requant op sequence.
Runs in interpret mode on the CPU mesh; the same code path runs compiled
on the real chip (A/B-measured in runs/, see PARITY.md).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frostnet_tpu.nn import INT8, QAT
from frostnet_tpu.nn.conv import QConvBNAct, set_pallas_int8_dense
from frostnet_tpu.quant import get_qconfig
from frostnet_tpu.quant.qtensor import QTensor


@pytest.fixture(autouse=True)
def _restore_flag():
    yield
    set_pallas_int8_dense(None)


def _calibrated_block(qconfig, act, key, cin=128, cout=128, hw=8, batch=2):
    """A QConvBNAct with realistic observer state from a QAT forward."""
    model = QConvBNAct(cout, 3, padding=1, act=act, qconfig=qconfig)
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.normal(k1, (batch, hw, hw, cin), jnp.float32)
    variables = model.init(k2, x, mode=QAT, train=True)
    # one observed forward so scales/zps are non-trivial
    _, updates = model.apply(variables, x, mode=QAT, train=True,
                             mutable=["quant", "batch_stats"])
    variables = {**variables, **updates}
    xq = QTensor(
        jax.random.randint(k1, (batch, hw, hw, cin), 0, 256, jnp.int32)
        .astype(jnp.uint8),
        jnp.float32(0.043), jnp.int32(117))
    return model, variables, xq


@pytest.mark.parametrize("variant", ["resident", "preshift"])
@pytest.mark.parametrize("backend", ["qnnpack", "fbgemm"])
@pytest.mark.parametrize("act", [None, "relu"])
def test_kernel_bit_identical_to_xla_path(backend, act, variant, monkeypatch):
    from frostnet_tpu.ops import pallas_int8_conv as pic

    qconfig = get_qconfig(backend)
    model, variables, xq = _calibrated_block(qconfig, act, key=7)

    set_pallas_int8_dense(False)
    ref = model.apply(variables, xq, mode=INT8)
    monkeypatch.setattr(pic, "VARIANT", variant)
    set_pallas_int8_dense(True)  # off-TPU -> interpret mode
    got = model.apply(variables, xq, mode=INT8)

    assert isinstance(ref, QTensor) and isinstance(got, QTensor)
    np.testing.assert_array_equal(np.asarray(ref.q), np.asarray(got.q))
    np.testing.assert_array_equal(np.asarray(ref.scale), np.asarray(got.scale))
    np.testing.assert_array_equal(np.asarray(ref.zero_point),
                                  np.asarray(got.zero_point))


def test_shape_gate_rejects_unsupported():
    from frostnet_tpu.ops.pallas_int8_conv import usable

    ok = usable(3, 3, (1, 1), (1, 1), 1, "relu", (2, 10, 10, 128), 128)
    assert ok is not None
    assert usable(1, 1, (1, 1), (1, 1), 1, "relu", (2, 10, 10, 128), 128) is None
    assert usable(3, 3, (2, 2), (1, 1), 1, "relu", (2, 10, 10, 128), 128) is None
    assert usable(3, 3, (1, 1), (2, 2), 1, "relu", (2, 10, 10, 128), 128) is None
    assert usable(3, 3, (1, 1), (1, 1), 2, "relu", (2, 10, 10, 128), 128) is None
    assert usable(3, 3, (1, 1), (1, 1), 1, "hswish", (2, 10, 10, 128), 128) is None
    # ragged channels fall back to XLA
    assert usable(3, 3, (1, 1), (1, 1), 1, "relu", (2, 10, 10, 96), 128) is None
    assert usable(3, 3, (1, 1), (1, 1), 1, "relu", (2, 10, 10, 128), 96) is None


@pytest.mark.parametrize("variant", ["resident", "preshift"])
def test_h_tiling_matches_whole_image(variant, monkeypatch):
    """Force a tile split (th < H) and compare against the XLA path."""
    from frostnet_tpu.ops import pallas_int8_conv as pic

    qconfig = get_qconfig("qnnpack")
    model, variables, xq = _calibrated_block(qconfig, "relu", key=3, hw=16)

    set_pallas_int8_dense(False)
    ref = model.apply(variables, xq, mode=INT8)

    monkeypatch.setattr(pic, "VARIANT", variant)
    monkeypatch.setattr(pic, "pick_h_tile",
                        lambda hp, wp, cin, cout, variant=None: 4)
    set_pallas_int8_dense(True)
    got = model.apply(variables, xq, mode=INT8)
    np.testing.assert_array_equal(np.asarray(ref.q), np.asarray(got.q))


def test_gan_resnet_block_uses_kernel_and_matches():
    """End-to-end through a ResnetBlock (the shape the kernel targets)."""
    from frostnet_tpu.gan.networks import ResnetBlock

    qconfig = get_qconfig("qnnpack")
    model = ResnetBlock(128, qconfig=qconfig)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 128), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x, QAT, True)
    _, updates = model.apply(variables, x, QAT, True,
                             mutable=["quant", "batch_stats"])
    variables = {**variables, **updates}
    xq = QTensor(
        jax.random.randint(jax.random.PRNGKey(2), (2, 8, 8, 128), 0, 256,
                           jnp.int32).astype(jnp.uint8),
        jnp.float32(0.031), jnp.int32(131))

    set_pallas_int8_dense(False)
    ref = model.apply(variables, xq, INT8, False)
    set_pallas_int8_dense(True)
    got = model.apply(variables, xq, INT8, False)
    np.testing.assert_array_equal(np.asarray(ref.q), np.asarray(got.q))
