"""Fake-quantization primitives with straight-through-estimator gradients.

Replaces the ``FakeQuantize`` modules PyTorch's ``prepare_qat`` inserts in the
reference (SURVEY.md §2.6 row 1). On TPU these are pure elementwise ops that
XLA fuses into the producing conv/matmul epilogue — no module graph needed.

Forward numerics match aten's fake_quantize kernels:
    q   = clamp(round(x / scale) + zero_point, qmin, qmax)
    out = (q - zero_point) * scale
with round-half-to-even (jnp.round == std::nearbyint under default FP env).

Backward is the standard STE with range masking: dL/dx = g where the
pre-clamp integer landed inside [qmin, qmax], else 0 (matches
fake_quantize_per_tensor_affine_cachemask). scale/zero_point are
observer-derived, not learned, so they get zero cotangents.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .observer import ObserverState, calculate_qparams
from .qtypes import QSpec


def _fq_fwd_math(x, scale, zero_point, qmin, qmax):
    inv = 1.0 / scale
    qraw = jnp.round(x * inv) + zero_point
    q = jnp.clip(qraw, qmin, qmax)
    out = (q - zero_point) * scale
    mask = (qraw >= qmin) & (qraw <= qmax)
    return out.astype(x.dtype), mask


# Bit-packed STE-mask residuals (round 5, opt-in): the QAT train step is
# HBM-bound, and every activation fake-quant stores its in-range mask as a
# residual for the backward — XLA materializes it at 1 byte/element (bool).
# Packing 8 booleans/byte cuts that residual 8x with EXACT gradients
# (tests/test_packed_ste_mask.py). ROUND-5 WHOLE-STEP A/B: REJECTED —
# 902 vs 3,016 img/s on the driver bench (runs/packed_mask_ab_r05.txt):
# the cross-element pack/unpack reshuffle cannot fuse into the surrounding
# elementwise chains, and the added materialization passes cost ~3x more
# than the saved mask bytes. Stays OFF; flag kept for other hardware.
_PACKED_STE_MASK: bool = False


def set_packed_ste_mask(enabled: bool) -> None:
    global _PACKED_STE_MASK
    _PACKED_STE_MASK = enabled


_BIT_WEIGHTS = tuple(1 << i for i in range(8))


def _pack_mask(mask):
    flat = mask.reshape(-1)
    n = flat.shape[0]
    pad = (-n) % 8
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    bits = flat.reshape(-1, 8).astype(jnp.uint8)
    w = jnp.asarray(_BIT_WEIGHTS, jnp.uint8)
    return jnp.sum(bits * w, axis=1, dtype=jnp.uint8)


def _unpack_mask(packed, n, shape):
    bits = (packed[:, None] >> jnp.arange(8, dtype=jnp.uint8)) & jnp.uint8(1)
    return bits.reshape(-1)[:n].astype(jnp.bool_).reshape(shape)


@jax.custom_vjp
def _fake_quant(x, scale, zero_point, qmin, qmax):
    out, _ = _fq_fwd_math(x, scale, zero_point, qmin, qmax)
    return out


def _fake_quant_fwd(x, scale, zero_point, qmin, qmax):
    out, mask = _fq_fwd_math(x, scale, zero_point, qmin, qmax)
    if _PACKED_STE_MASK:
        return out, _pack_mask(mask)
    return out, mask


def _fake_quant_bwd(res, g):
    if res.dtype == jnp.uint8:
        # packed residual; g has the primal's shape, so recover it from g
        mask = _unpack_mask(res, g.size, g.shape)
    else:
        mask = res
    return (jnp.where(mask, g, 0.0).astype(g.dtype), None, None, None, None)


_fake_quant.defvjp(_fake_quant_fwd, _fake_quant_bwd)


def _reshape_qparams(scale, zero_point, x, channel_axis: Optional[int]):
    if channel_axis is None:
        return scale, zero_point.astype(jnp.float32)
    shape = [1] * x.ndim
    shape[channel_axis % x.ndim] = x.shape[channel_axis % x.ndim]
    return scale.reshape(shape), zero_point.astype(jnp.float32).reshape(shape)


def fake_quantize(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    zero_point: jnp.ndarray,
    spec: QSpec,
    channel_axis: Optional[int] = None,
) -> jnp.ndarray:
    """Quantize-dequantize ``x`` on the integer grid of ``spec`` (STE grads)."""
    s, zp = _reshape_qparams(
        jax.lax.stop_gradient(scale), jax.lax.stop_gradient(zero_point), x, channel_axis
    )
    return _fake_quant(x, s, zp, float(spec.qmin), float(spec.qmax))


def fake_quantize_observed(
    x: jnp.ndarray,
    state: ObserverState,
    spec: QSpec,
    channel_axis: Optional[int] = None,
) -> jnp.ndarray:
    """fake_quantize with (scale, zp) computed from observer state."""
    scale, zp = calculate_qparams(state, spec)
    return fake_quantize(x, scale, zp, spec, channel_axis)


def quantize(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    zero_point: jnp.ndarray,
    spec: QSpec,
    channel_axis: Optional[int] = None,
) -> jnp.ndarray:
    """Real quantization to the integer grid (used by the freeze pass)."""
    s, zp = _reshape_qparams(scale, zero_point, x, channel_axis)
    q = jnp.clip(jnp.round(x / s) + zp, spec.qmin, spec.qmax)
    return q.astype(spec.storage_dtype)


def dequantize(
    q: jnp.ndarray,
    scale: jnp.ndarray,
    zero_point: jnp.ndarray,
    channel_axis: Optional[int] = None,
) -> jnp.ndarray:
    s, zp = _reshape_qparams(scale, zero_point, q, channel_axis)
    return (q.astype(jnp.float32) - zp) * s
