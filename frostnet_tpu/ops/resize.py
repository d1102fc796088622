"""Bilinear resize with torch ``F.interpolate`` semantics.

The segmentation/GAN paths upsample with ``align_corners=True`` bilinear
(e.g. Semantic_Segmentation/model/mobilenetv3.py:66, layers/LRASPP.py:45).
jax.image.resize only implements half-pixel sampling, so we build the
separable interpolation as two small dense matrices applied with einsum —
which XLA maps onto the MXU (faster than gather-based resizes on TPU).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _linear_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """(n_out, n_in) row-stochastic interpolation matrix (host-computed)."""
    if n_out == 1:
        pos = np.zeros((1,), np.float64)
    elif align_corners:
        pos = np.linspace(0.0, n_in - 1.0, n_out)
    else:
        pos = np.clip((np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5, 0.0, n_in - 1.0)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    w = (pos - lo).astype(np.float64)
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), lo] += (1.0 - w).astype(np.float32)
    m[np.arange(n_out), hi] += w.astype(np.float32)
    return m


def resize_bilinear(
    x: jnp.ndarray,
    size: Tuple[int, int],
    align_corners: bool = True,
) -> jnp.ndarray:
    """NHWC bilinear resize to (H, W) = size, matching torch numerics."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x
    mh = jnp.asarray(_linear_matrix(h_in, h_out, align_corners))
    mw = jnp.asarray(_linear_matrix(w_in, w_out, align_corners))
    y = jnp.einsum("oh,nhwc->nowc", mh, x.astype(jnp.float32))
    y = jnp.einsum("pw,nwoc->npoc", mw, jnp.swapaxes(y, 1, 2))
    return jnp.swapaxes(y, 1, 2).astype(x.dtype)


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """NHWC nearest resize (torch 'nearest': floor of src index)."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = size
    ih = (np.arange(h_out) * (h_in / h_out)).astype(np.int64)
    iw = (np.arange(w_out) * (w_in / w_out)).astype(np.int64)
    return x[:, ih][:, :, iw]
