"""QTensor — a quantized tensor flowing through the frozen INT8 graph.

After :func:`frostnet_tpu.quant.freeze` (the ``torch.quantization.convert``
equivalent), activations travel as (int storage, scale, zero_point) triples,
exactly like qnnpack's quantized tensors. Registered as a pytree so QTensors
pass through jit/pjit.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class QTensor(NamedTuple):
    q: jnp.ndarray           # uint8/int8 storage
    scale: jnp.ndarray       # f32 scalar
    zero_point: jnp.ndarray  # int32 scalar

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    def dequantize(self) -> jnp.ndarray:
        return (self.q.astype(jnp.float32) - self.zero_point.astype(jnp.float32)) * self.scale
