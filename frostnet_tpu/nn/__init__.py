"""Quant-ready NN block library (the reference's L1 layer, TPU-native)."""
from .mode import QuantMode, FP32, QAT, QAT_FROZEN, INT8
from .conv import QConvBNAct, apply_activation, kaiming_normal_fan_out
from .quant_ops import (
    QuantStub,
    dequant,
    QAdd,
    QAddReLU,
    QMul,
    QCat,
    add_scalar,
    mul_scalar,
    observed_fake_quant,
    stored_qparams,
)
from .pool import global_avg_pool, avg_pool, max_pool
from .blocks import (
    QHswish,
    QHsigmoid,
    QDense,
    QSEModule,
    InvertedResidual,
    BottleneckV3,
)

__all__ = [
    "QuantMode",
    "FP32",
    "QAT",
    "QAT_FROZEN",
    "INT8",
    "QConvBNAct",
    "apply_activation",
    "kaiming_normal_fan_out",
    "QuantStub",
    "dequant",
    "QAdd",
    "QAddReLU",
    "QMul",
    "QCat",
    "add_scalar",
    "mul_scalar",
    "observed_fake_quant",
    "stored_qparams",
    "global_avg_pool",
    "avg_pool",
    "max_pool",
    "QHswish",
    "QHsigmoid",
    "QDense",
    "QSEModule",
    "InvertedResidual",
    "BottleneckV3",
]
