"""BatchNorm folding as pure parameter transforms.

Replaces ``torch.quantization.fuse_modules`` conv+BN(+act) folding (called by
every ``fuse_model()`` in the reference, e.g. frostnet.py:27-60,334-337).
There is no module graph to rewrite here: folding is a function over the
parameter pytree.

Two regimes:
  * eval/freeze: fold running statistics into (W, b) once — :func:`fold_bn`.
  * QAT training: the conv module scales W by gamma/sqrt(running_var+eps)
    before weight fake-quant and un-scales the conv output before applying
    real batch-stats BN — the torch.nn.intrinsic.qat.ConvBn2d recipe; see
    frostnet_tpu.nn.conv.QConvBNAct. The helper :func:`bn_scale_factor` lives
    here so numerics are defined in one place.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def bn_scale_factor(gamma: jnp.ndarray, running_var: jnp.ndarray, eps: float) -> jnp.ndarray:
    """gamma / sqrt(running_var + eps), the per-output-channel BN scale."""
    return gamma / jnp.sqrt(running_var + eps)


def fold_bn(
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold inference-time BN into conv weight/bias.

    ``w`` is HWIO (output channel = last axis, the JAX conv convention).
    Returns (w_folded, b_folded) such that
    ``conv(x, w_folded) + b_folded == bn(conv(x, w) + b)`` with running stats.
    """
    sf = bn_scale_factor(gamma, running_var, eps)
    w_folded = w * sf.reshape((1,) * (w.ndim - 1) + (-1,))
    if b is None:
        b = jnp.zeros_like(running_mean)
    b_folded = (b - running_mean) * sf + beta
    return w_folded.astype(w.dtype), b_folded.astype(jnp.float32)
