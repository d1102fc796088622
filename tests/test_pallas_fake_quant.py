"""Pallas fused fake-quant kernel vs the reference XLA composite (interpret
mode on CPU; the real kernel runs on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from frostnet_tpu import quant as q
from frostnet_tpu.ops.pallas_fake_quant import fake_quant_observe


def test_matches_composite_forward_and_stats():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 13, 17, 5).astype(np.float32) * 3)
    scale, zp = jnp.float32(0.0213), jnp.int32(7)

    y, mn, mx = fake_quant_observe(x, scale, zp, 0, 255, True)
    want = q.fake_quantize(x, scale, zp, q.QNNPACK_ACT)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-6)
    assert float(mn) == float(x.min())
    assert float(mx) == float(x.max())


def test_ste_gradient_matches_composite():
    rng = np.random.RandomState(1)
    x = jnp.asarray(np.linspace(-8, 8, 1024, dtype=np.float32).reshape(4, 256))
    scale, zp = jnp.float32(0.05), jnp.int32(128)

    def loss_pallas(v):
        y, mn, mx = fake_quant_observe(v, scale, zp, 0, 255, True)
        return jnp.sum(y * y)

    def loss_ref(v):
        y = q.fake_quantize(v, scale, zp, q.QNNPACK_ACT)
        return jnp.sum(y * y)

    g1 = jax.grad(loss_pallas)(x)
    g2 = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
