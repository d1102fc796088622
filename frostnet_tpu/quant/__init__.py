"""TPU-native INT8 quantization-aware-training core.

Functional replacement for the torch.quantization stack the reference relies
on (FakeQuantize/observers/fuse/prepare_qat/convert — SURVEY.md §2.6): here
quantization is explicit state in the parameter pytree plus pure ops that XLA
fuses into conv epilogues, not a module-graph rewrite.
"""
from .qtypes import (
    QSpec,
    QConfig,
    QNNPACK,
    FBGEMM,
    QNNPACK_ACT,
    QNNPACK_WEIGHT,
    FBGEMM_ACT,
    FBGEMM_WEIGHT,
    SCALE_EPS,
    get_qconfig,
)
from .observer import ObserverState, init_observer, update_observer, calculate_qparams
from .fake_quant import (
    fake_quantize,
    fake_quantize_observed,
    quantize,
    dequantize,
)
from .folding import fold_bn, bn_scale_factor
from .freeze import freeze
from .export import export_int8, load_int8
from .serialize import export_serving, load_serving
from .qtensor import QTensor

__all__ = [
    "QSpec",
    "QConfig",
    "QNNPACK",
    "FBGEMM",
    "QNNPACK_ACT",
    "QNNPACK_WEIGHT",
    "FBGEMM_ACT",
    "FBGEMM_WEIGHT",
    "SCALE_EPS",
    "get_qconfig",
    "ObserverState",
    "init_observer",
    "update_observer",
    "calculate_qparams",
    "fake_quantize",
    "fake_quantize_observed",
    "quantize",
    "dequantize",
    "fold_bn",
    "bn_scale_factor",
    "freeze",
    "export_int8",
    "load_int8",
    "export_serving",
    "load_serving",
    "QTensor",
]
