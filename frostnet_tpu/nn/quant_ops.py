"""Quantization boundary and observed-arithmetic modules.

TPU-native equivalents of the reference's explicit quant-graph plumbing:

  * :class:`QuantStub` / :func:`dequant` — the QuantStub/DeQuantStub pair
    wrapping every quant region (reference frostnet.py:304-306,318-330).
  * :class:`QAdd` / :class:`QCat` / :class:`QMul` / :class:`QAddReLU` — the
    ``nn.quantized.FloatFunctional`` requant points every skip/cat/mul uses
    (reference frostnet.py:121-122, qtdsod.py:299-310, LRASPP.py:39).
    Each carries its own activation observer, exactly like FloatFunctional's
    activation_post_process. Scalar variants (add_scalar/mul_scalar) carry
    no observer, matching torch.

All are thin flax modules over pure ops; in QAT mode XLA fuses the
quantize-dequantize epilogue into the producing op, and in INT8 mode the ops
consume/produce :class:`~frostnet_tpu.quant.qtensor.QTensor`.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as fnn
import jax.numpy as jnp

from ..quant import (
    QConfig,
    QNNPACK,
    QSpec,
    calculate_qparams,
    fake_quantize,
    init_observer,
    quantize,
    update_observer,
)
from ..quant.qtensor import QTensor
from .mode import QuantMode


def apply_observer(
    module: fnn.Module,
    obs,
    x: jnp.ndarray,
    spec: QSpec,
    mode: QuantMode,
    channel_axis: Optional[int] = None,
):
    """Update a flax observer variable and (maybe) fake-quantize ``x``.

    The functional analogue of a FakeQuantize module call: observer update is
    gated by ``mode.observe`` (the ``disable_observer`` switch), fake-quant by
    ``mode.fake_quant``.
    """
    if mode.observe and not module.is_initializing():
        obs.value = update_observer(obs.value, x, spec, channel_axis)
    if mode.fake_quant:
        scale, zp = calculate_qparams(obs.value, spec)
        x = fake_quantize(x, scale, zp, spec, channel_axis)
    return x


def observed_fake_quant(
    module: fnn.Module,
    name: str,
    x: jnp.ndarray,
    spec: QSpec,
    mode: QuantMode,
    channel_axis: Optional[int] = None,
):
    """Create-or-get an observer variable under ``name`` and apply it.

    NOTE: the variable is created whenever this is called — blocks must call
    it unconditionally (any mode) so the 'quant' collection has a stable
    structure from init through INT8 freeze.
    """
    nc = None if channel_axis is None else x.shape[channel_axis]
    obs = module.variable("quant", name, lambda: init_observer(nc))
    return apply_observer(module, obs, x, spec, mode, channel_axis)


def observed_standalone_act(module: fnn.Module, name: str, x, spec: QSpec,
                            mode: QuantMode):
    """The numerics of a STANDALONE torch activation module under eager
    quantization (a bare ``nn.ReLU``/``nn.ReLU6`` that is not fused into a
    preceding ConvBn): ``prepare_qat`` hooks a FakeQuantize onto the module
    output, so during QAT the activation output is observed AND requantized
    on its own grid; ``convert`` maps it to nnq.ReLU6, which clamps on
    the INPUT grid with NO requant (reference mobilenetv3.py:46-56 _Hswish
    relu6). NOTE: this applies to ReLU6 only — a bare nn.ReLU is in torch's
    no-observe passthrough set and gets no FakeQuantize (verified against
    prepare_qat on the reference RE bottleneck, round 5), so plain relu
    sites must NOT use this helper. Mirror both: QTensor inputs
    (INT8 mode) pass through untouched — the caller already clamped on the
    integer grid — while the float/QAT path applies the observer; the
    observer variable exists in EVERY mode so the pytree stays stable."""
    nc = None
    obs = module.variable("quant", name, lambda: init_observer(nc))
    if isinstance(x, QTensor):
        return x
    return apply_observer(module, obs, x, spec, mode)


def stored_qparams(module: fnn.Module, name: str, spec: QSpec):
    """Read frozen (scale, zero_point) for INT8 inference from observer state."""
    obs = module.variable("quant", name, lambda: init_observer(None))
    return calculate_qparams(obs.value, spec)


def _requant(x_f32: jnp.ndarray, scale, zp, spec: QSpec) -> QTensor:
    return QTensor(quantize(x_f32, scale, zp, spec), scale, zp)


class QuantStub(fnn.Module):
    """Entry of a quant region: observes/fake-quants the float input, or in
    INT8 mode produces the initial QTensor (reference frostnet.py:305,319)."""

    qconfig: QConfig = QNNPACK

    @fnn.compact
    def __call__(self, x, mode: QuantMode):
        spec = self.qconfig.activation
        if mode.int8:
            scale, zp = stored_qparams(self, "act", spec)
            return _requant(x, scale, zp, spec)
        return observed_fake_quant(self, "act", x, spec, mode)


def dequant(x):
    """DeQuantStub: in INT8 mode converts QTensor back to float; otherwise a
    no-op marker (fake-quant tensors are already float)."""
    if isinstance(x, QTensor):
        return x.dequantize()
    return x


class _QBinary(fnn.Module):
    """Shared machinery for observed binary ops (FloatFunctional equivalent)."""

    qconfig: QConfig = QNNPACK

    def _finish(self, out_f32, mode: QuantMode):
        spec = self.qconfig.activation
        if mode.int8:
            scale, zp = stored_qparams(self, "act", spec)
            return _requant(out_f32, scale, zp, spec)
        out = observed_fake_quant(self, "act", out_f32, spec, mode)
        # fake-quant's f32 scale promotes the result; materialize in the
        # incoming compute dtype (bf16 runs are bandwidth-bound)
        return out.astype(out_f32.dtype)

    @staticmethod
    def _as_f32(x):
        return x.dequantize() if isinstance(x, QTensor) else x


class QAdd(_QBinary):
    """FloatFunctional.add — skip connections get their own requant scale."""

    @fnn.compact
    def __call__(self, a, b, mode: QuantMode, qparams_only: bool = False):
        if qparams_only:  # fused INT8 block reads the grid, runs the add itself
            return stored_qparams(self, "act", self.qconfig.activation)
        return self._finish(self._as_f32(a) + self._as_f32(b), mode)


class QAddReLU(_QBinary):
    """FloatFunctional.add_relu (reference resnet.py add_relu sites)."""

    @fnn.compact
    def __call__(self, a, b, mode: QuantMode):
        return self._finish(fnn.relu(self._as_f32(a) + self._as_f32(b)), mode)


class QMul(_QBinary):
    """FloatFunctional.mul (hswish/hsigmoid gates, LRASPP attention mul)."""

    @fnn.compact
    def __call__(self, a, b, mode: QuantMode):
        return self._finish(self._as_f32(a) * self._as_f32(b), mode)


class QCat(_QBinary):
    """FloatFunctional.cat (CascadePreEx concat, TDSOD dense cats)."""

    @fnn.compact
    def __call__(self, xs, mode: QuantMode, axis: int = -1,
                 qparams_only: bool = False):
        if qparams_only:  # fused INT8 block reads the grid, runs the cat itself
            return stored_qparams(self, "act", self.qconfig.activation)
        out = jnp.concatenate([self._as_f32(x) for x in xs], axis=axis)
        return self._finish(out, mode)


def add_scalar(x, s: float):
    """FloatFunctional.add_scalar — no observer, matching torch."""
    if isinstance(x, QTensor):
        # scale unchanged; shift the zero point (qnnpack add_scalar semantics).
        return QTensor(x.q, x.scale, x.zero_point - jnp.round(s / x.scale).astype(jnp.int32))
    return x + s


def mul_scalar(x, s: float):
    """FloatFunctional.mul_scalar — no observer, scale absorbs the factor."""
    if isinstance(x, QTensor):
        return QTensor(x.q, x.scale * s, x.zero_point)
    return x * s
