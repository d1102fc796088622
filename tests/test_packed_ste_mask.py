"""Bit-packed STE-mask residuals (quant/fake_quant.py, round 5, opt-in).

Packing 8 mask booleans per byte is lossless, so the fake-quant FORWARD and
GRADIENTS must be bit-equal with the flag on vs off — including shapes whose
element count is not a multiple of 8, per-channel qparams, saturated inputs
(the mask's whole point), and a full QAT train step on a small conv block.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from frostnet_tpu.quant import QNNPACK, fake_quantize
from frostnet_tpu.quant import fake_quant as fq_mod


@pytest.fixture(autouse=True)
def _reset():
    yield
    fq_mod.set_packed_ste_mask(False)


def _fq_grad(x, scale, zp, spec, channel_axis=None):
    def loss(x_):
        y = fake_quantize(x_, scale, zp, spec, channel_axis)
        return jnp.sum(y * jnp.arange(1.0, 1.0 + y.size).reshape(y.shape))

    return jax.grad(loss)(x)


@pytest.mark.parametrize("shape", [(7,), (3, 5), (2, 5, 5, 3), (8, 16)])
def test_grads_bit_equal_packed_vs_plain(shape):
    rng = np.random.RandomState(0)
    # wide range so plenty of elements saturate (mask=False)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 4.0)
    scale = jnp.float32(0.02)
    zp = jnp.int32(128)
    spec = QNNPACK.activation

    y_plain = fake_quantize(x, scale, zp, spec)
    g_plain = _fq_grad(x, scale, zp, spec)
    fq_mod.set_packed_ste_mask(True)
    y_packed = fake_quantize(x, scale, zp, spec)
    g_packed = _fq_grad(x, scale, zp, spec)

    np.testing.assert_array_equal(np.asarray(y_plain), np.asarray(y_packed))
    np.testing.assert_array_equal(np.asarray(g_plain), np.asarray(g_packed))
    # sanity: saturation actually exercised
    assert (np.asarray(g_plain) == 0).any()
    assert (np.asarray(g_plain) != 0).any()


def test_grads_bit_equal_per_channel():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 6).astype(np.float32) * 3.0)
    spec = QNNPACK.weight
    scale = jnp.asarray(rng.rand(6).astype(np.float32) * 0.05 + 0.01)
    zp = jnp.zeros((6,), jnp.int32)

    g_plain = _fq_grad(x, scale, zp, spec, channel_axis=-1)
    fq_mod.set_packed_ste_mask(True)
    g_packed = _fq_grad(x, scale, zp, spec, channel_axis=-1)
    np.testing.assert_array_equal(np.asarray(g_plain), np.asarray(g_packed))


def test_qat_train_step_bit_equal():
    """One whole QAT train step on a conv block: params/grads/observers
    identical with packed residuals."""
    import optax

    from frostnet_tpu.nn import QAT
    from frostnet_tpu.nn.conv import QConvBNAct

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 9, 9, 5).astype(np.float32))
    tgt = jnp.asarray(rng.randn(2, 9, 9, 8).astype(np.float32))
    block = QConvBNAct(features=8, kernel_size=3, padding=1, act="relu")
    variables = jax.jit(
        lambda k, i: block.init(k, i, mode=QAT, train=True))(
            jax.random.PRNGKey(0), x)
    tx = optax.sgd(0.05)
    opt_state = tx.init(variables["params"])

    def run_step():
        @jax.jit
        def step(v, o):
            def loss_fn(p):
                out, mut = block.apply({**v, "params": p}, x, mode=QAT,
                                       train=True,
                                       mutable=["quant", "batch_stats"])
                return jnp.mean((out - tgt) ** 2), mut

            (loss, mut), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(v["params"])
            upd, o2 = tx.update(grads, o, v["params"])
            return optax.apply_updates(v["params"], upd), grads, loss

        return step(variables, opt_state)

    p_plain, g_plain, l_plain = run_step()
    fq_mod.set_packed_ste_mask(True)
    p_packed, g_packed, l_packed = run_step()

    assert float(l_plain) == float(l_packed)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_packed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(p_plain), jax.tree.leaves(p_packed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
