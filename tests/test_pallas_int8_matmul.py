"""Pallas s8xs8->s32 matmul + fused requant: bit-exact vs the XLA spec."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frostnet_tpu.ops.pallas_int8_matmul import (
    int8_matmul_requant, reference_int8_matmul_requant)


@pytest.mark.parametrize("m,k,n", [(256, 136, 816), (100, 24, 144), (17, 8, 40)])
def test_matches_xla_spec_bitwise(m, k, n):
    rng = np.random.RandomState(0)
    x8 = jnp.asarray(rng.randint(-128, 128, (m, k), np.int8))
    w8 = jnp.asarray(rng.randint(-128, 128, (k, n), np.int8))
    scale = jnp.asarray(rng.rand(n).astype(np.float32) * 1e-3 + 1e-4)
    bias = jnp.asarray(rng.randn(n).astype(np.float32) * 0.1)
    out_scale = jnp.float32(0.02)
    out_zp = jnp.float32(7.0)

    want = reference_int8_matmul_requant(x8, w8, scale, bias, out_scale, out_zp)
    got = int8_matmul_requant(x8, w8, scale, bias, out_scale, out_zp,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_saturates_to_uint8_range():
    x8 = jnp.full((8, 16), 127, jnp.int8)
    w8 = jnp.full((16, 128), 127, jnp.int8)
    big = int8_matmul_requant(x8, w8, jnp.ones((128,)), jnp.zeros((128,)),
                              jnp.float32(1.0), jnp.float32(0.0),
                              interpret=True)
    assert int(np.asarray(big).max()) == 255
    small = int8_matmul_requant(-x8, w8, jnp.ones((128,)), jnp.zeros((128,)),
                                jnp.float32(1.0), jnp.float32(0.0),
                                interpret=True)
    assert int(np.asarray(small).min()) == 0
