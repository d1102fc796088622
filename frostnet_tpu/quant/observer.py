"""Functional quantization observers.

TPU-native replacement for PyTorch's ``MinMaxObserver`` /
``MovingAverageMinMaxObserver`` / ``MovingAveragePerChannelMinMaxObserver``
modules that ``prepare_qat`` inserts in the reference (SURVEY.md §2.6 row 1).

Observers here are *pure state*: a ``(min_val, max_val)`` pair living in a
pytree (flax ``'quant'`` collection), updated inside the jitted train step.
No module graph rewriting: "preparing" a model for QAT is just starting to
call these updates.

Numerics follow torch.ao.quantization.observer exactly:
  * uninitialized state is (+inf, -inf);
  * first update snaps to the batch min/max;
  * subsequent MovingAverage updates: ``m += c * (batch_min - m)`` with
    averaging_constant c (default 0.01);
  * ``averaging_constant=None`` selects plain running min/max
    (MinMaxObserver semantics, used for weights at freeze time).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from .qtypes import QSpec, SCALE_EPS


class ObserverState(NamedTuple):
    min_val: jnp.ndarray  # f32, scalar or (C,)
    max_val: jnp.ndarray


def init_observer(num_channels: Optional[int] = None) -> ObserverState:
    """Fresh observer. ``num_channels=None`` -> per-tensor (scalar state)."""
    shape = () if num_channels is None else (num_channels,)
    return ObserverState(
        min_val=jnp.full(shape, jnp.inf, dtype=jnp.float32),
        max_val=jnp.full(shape, -jnp.inf, dtype=jnp.float32),
    )


def _batch_min_max(x: jnp.ndarray, channel_axis: Optional[int]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    x = x.astype(jnp.float32)
    if channel_axis is None:
        return jnp.min(x), jnp.max(x)
    axes = tuple(i for i in range(x.ndim) if i != (channel_axis % x.ndim))
    return jnp.min(x, axis=axes), jnp.max(x, axis=axes)


def update_observer(
    state: ObserverState,
    x: jnp.ndarray,
    spec: QSpec,
    channel_axis: Optional[int] = None,
) -> ObserverState:
    """One observer step on a batch of values (pure; jittable)."""
    bmin, bmax = _batch_min_max(x, channel_axis)
    uninit = jnp.isinf(state.min_val)
    c = spec.averaging_constant
    if c is None:
        new_min = jnp.minimum(jnp.where(uninit, bmin, state.min_val), bmin)
        new_max = jnp.maximum(jnp.where(uninit, bmax, state.max_val), bmax)
    else:
        new_min = jnp.where(uninit, bmin, state.min_val + c * (bmin - state.min_val))
        new_max = jnp.where(uninit, bmax, state.max_val + c * (bmax - state.max_val))
    return ObserverState(new_min, new_max)


def calculate_qparams(state: ObserverState, spec: QSpec) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(scale, zero_point) from observed min/max.

    Bit-faithful port of the formulas in
    torch.ao.quantization.observer.UniformQuantizationObserverBase._calculate_qparams
    (affine and symmetric branches). Uninitialized observers yield (1.0, 0)
    like PyTorch's check_min_max_valid early-out.
    """
    qmin, qmax = spec.qmin, spec.qmax
    min_neg = jnp.minimum(state.min_val, 0.0)
    max_pos = jnp.maximum(state.max_val, 0.0)
    if spec.symmetric:
        amax = jnp.maximum(-min_neg, max_pos)
        scale = amax / ((qmax - qmin) / 2.0)
        scale = jnp.maximum(scale, SCALE_EPS)
        # signed symmetric grid -> zp 0; unsigned symmetric -> mid-grid 128.
        zp_val = 0 if spec.qmin < 0 else 128
        zero_point = jnp.full_like(scale, zp_val, dtype=jnp.int32)
    else:
        scale = (max_pos - min_neg) / float(qmax - qmin)
        scale = jnp.maximum(scale, SCALE_EPS)
        zero_point = qmin - jnp.round(min_neg / scale)
        zero_point = jnp.clip(zero_point, qmin, qmax).astype(jnp.int32)
    uninit = jnp.isinf(state.min_val)
    scale = jnp.where(uninit, 1.0, scale).astype(jnp.float32)
    zero_point = jnp.where(uninit, 0, zero_point)
    return scale, zero_point
