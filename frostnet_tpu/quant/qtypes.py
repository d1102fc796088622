"""Quantization type specs and backend presets.

TPU-native re-design of the quantization configuration the reference obtains from
``torch.quantization.get_default_qat_qconfig('qnnpack'|'fbgemm')`` (reference:
Classification/train.py:168, Classification/latency_check.py:222).

Instead of module-swapping QConfig objects, quantization here is explicit data:
a :class:`QSpec` describes the integer grid for one tensor (activation or weight),
and a :class:`QConfig` bundles the activation and weight specs for a backend.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

# torch.finfo(torch.float32).eps — the scale floor used by PyTorch observers.
SCALE_EPS = float(jnp.finfo(jnp.float32).eps)


@dataclasses.dataclass(frozen=True)
class QSpec:
    """Integer grid for one tensor.

    Attributes:
      qmin/qmax: inclusive integer range (e.g. 0..255 for quint8 affine).
      symmetric: True -> zero_point fixed (0 for signed grids), scale from max|x|.
      per_channel: True -> one (scale, zero_point) per output channel (axis 0 of
        an OIHW-style weight; we store weights HWIO so the channel axis is -1).
      dtype: storage dtype after freeze (int8 used for both signed/unsigned by
        offsetting; we keep uint8 grids in int32 zero-points).
      averaging_constant: EMA constant of the MovingAverage observer; None means
        plain running min/max (MinMaxObserver semantics).
    """

    qmin: int
    qmax: int
    symmetric: bool
    per_channel: bool = False
    averaging_constant: Optional[float] = 0.01

    @property
    def unsigned(self) -> bool:
        return self.qmin >= 0

    @property
    def storage_dtype(self):
        return jnp.uint8 if self.unsigned else jnp.int8


# ---------------------------------------------------------------------------
# Backend presets — numerics mirror torch.ao.quantization default QAT qconfigs.
# ---------------------------------------------------------------------------

# 'qnnpack' (mobile): per-tensor affine quint8 activations (full 0..255 range),
# per-tensor symmetric qint8 weights.  Reference qconfig sites: SURVEY.md §2.6.
QNNPACK_ACT = QSpec(qmin=0, qmax=255, symmetric=False, per_channel=False)
QNNPACK_WEIGHT = QSpec(qmin=-128, qmax=127, symmetric=True, per_channel=False)

# 'fbgemm' (x86): activations use reduce_range (0..127), weights per-channel
# symmetric qint8.  Reference: Classification/latency_check.py:222.
FBGEMM_ACT = QSpec(qmin=0, qmax=127, symmetric=False, per_channel=False)
FBGEMM_WEIGHT = QSpec(qmin=-128, qmax=127, symmetric=True, per_channel=True)


@dataclasses.dataclass(frozen=True)
class QConfig:
    activation: QSpec
    weight: QSpec
    name: str = "custom"


QNNPACK = QConfig(activation=QNNPACK_ACT, weight=QNNPACK_WEIGHT, name="qnnpack")
FBGEMM = QConfig(activation=FBGEMM_ACT, weight=FBGEMM_WEIGHT, name="fbgemm")

_BACKENDS = {"qnnpack": QNNPACK, "fbgemm": FBGEMM}


def get_qconfig(backend: str = "qnnpack") -> QConfig:
    """Equivalent of ``get_default_qat_qconfig(backend)``."""
    try:
        return _BACKENDS[backend]
    except KeyError:
        raise ValueError(f"unknown quant backend {backend!r}; options: {list(_BACKENDS)}")
