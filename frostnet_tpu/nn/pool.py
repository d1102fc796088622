"""Pooling ops that understand quantized tensors.

PyTorch's quantized pooling keeps the input's (scale, zero_point) and rounds
the integer average (no new observer) — reference classifier head uses
AdaptiveAvgPool2d inside the quant region (frostnet.py:295-299).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..quant.qtensor import QTensor


def global_avg_pool(x, keepdims: bool = True):
    """Mean over spatial dims (NHWC). QTensor in -> QTensor out (same grid)."""
    if isinstance(x, QTensor):
        m = jnp.mean(x.q.astype(jnp.float32), axis=(1, 2), keepdims=keepdims)
        q = jnp.clip(jnp.round(m), 0, 255).astype(x.q.dtype)
        return QTensor(q, x.scale, x.zero_point)
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def avg_pool(x, window: int, strides: int | None = None, padding="VALID"):
    import flax.linen as fnn

    strides = strides or window
    if isinstance(x, QTensor):
        m = fnn.avg_pool(
            x.q.astype(jnp.float32), (window, window), (strides, strides), padding
        )
        q = jnp.clip(jnp.round(m), 0, 255).astype(x.q.dtype)
        return QTensor(q, x.scale, x.zero_point)
    return fnn.avg_pool(x, (window, window), (strides, strides), padding)


def max_pool(x, window: int, strides: int | None = None, padding="VALID"):
    import flax.linen as fnn

    strides = strides or window
    if isinstance(x, QTensor):
        return QTensor(
            fnn.max_pool(x.q, (window, window), (strides, strides), padding),
            x.scale,
            x.zero_point,
        )
    return fnn.max_pool(x, (window, window), (strides, strides), padding)
