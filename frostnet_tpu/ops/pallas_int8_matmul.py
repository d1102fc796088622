"""Pallas TPU kernel: s8 x s8 -> s32 matmul with the requant epilogue fused.

The INT8 serving path's 1x1 convolutions are matmuls over (batch*H*W, Cin)
x (Cin, Cout). XLA fuses the requant epilogue into its conv, but each 1x1
still round-trips its operands through HBM per op. This kernel is the
building block for keeping the whole epilogue in VMEM:

    acc   = X_s8 @ W_s8                      (MXU, int32 accumulate)
    y     = acc * scale[c] + bias[c]         (f32, per-out-channel)
    out   = clamp(round_half_even(y/out_s) + out_zp, 0, 255) -> uint8

matching nn/conv.py's INT8 branch numerics exactly (fold the x-scale *
w-scale product and the zero-point-correction bias into scale/bias before
calling). Grid tiles M x N; K is kept whole (mobile-net channel dims are
small). Kernel playbook: /opt/skills/guides/pallas_guide.md.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, scale_ref, bias_ref, qparams_ref, out_ref):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * scale_ref[0, :] + bias_ref[0, :]
    inv_s = qparams_ref[0]
    zp = qparams_ref[1]
    q = jnp.round(y * inv_s) + zp        # round-half-even like torch/XLA
    # Mosaic has no f32->u8 cast; clamp in f32, hop through i32
    out_ref[:] = jnp.clip(q, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def int8_matmul_requant(x8, w8, scale, bias, out_scale, out_zp,
                        block_m: int = 512, block_n: int = 256,
                        interpret: bool = False):
    """(M,K) s8 @ (K,N) s8 -> (M,N) u8 with fused dequant-bias-requant.

    scale/bias are per-out-channel f32 (N,); out_scale/out_zp scalars.
    M and N need not be tile-multiples (padded here, cropped on return).
    """
    m, k = x8.shape
    k2, n = w8.shape
    assert k == k2
    bm = min(block_m, -(-m // 8) * 8)
    bn = min(block_n, -(-n // 128) * 128)
    mp = -(-m // bm) * bm
    np_ = -(-n // bn) * bn
    if mp != m:
        x8 = jnp.pad(x8, ((0, mp - m), (0, 0)))
    if np_ != n:
        w8 = jnp.pad(w8, ((0, 0), (0, np_ - n)))
        scale = jnp.pad(scale, (0, np_ - n))
        bias = jnp.pad(bias, (0, np_ - n))

    qparams = jnp.stack([1.0 / out_scale.astype(jnp.float32),
                         out_zp.astype(jnp.float32)])
    out = pl.pallas_call(
        _kernel,
        grid=(mp // bm, np_ // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.uint8),
        interpret=interpret,
    )(x8, w8, scale.astype(jnp.float32).reshape(1, -1),
      bias.astype(jnp.float32).reshape(1, -1), qparams)
    return out[:m, :n]


def reference_int8_matmul_requant(x8, w8, scale, bias, out_scale, out_zp):
    """Plain-XLA spec for tests and A/B timing."""
    acc = jax.lax.dot_general(
        x8, w8, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * scale + bias
    q = jnp.round(y / out_scale) + out_zp
    return jnp.clip(q, 0, 255).astype(jnp.uint8)
