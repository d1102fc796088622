"""CIFAR-sized model variants (reference Classification/models/cifar/*).

The reference's CIFAR zoo reuses the ImageNet quantizable architectures with
small-input tweaks; the only structural change is AlexNet's stem (3x3/1
conv, no first maxpool, 6x6 adaptive pool — cifar/alexnet.py:23-40). Here:
``cifar_alexnet`` applies that stem change; the remaining names alias the
ImageNet models with ``num_classes=10`` defaults, exactly how the reference
consumes them (its cifar/resnet.py etc. are byte-level copies of the
imagenet files).
"""
from __future__ import annotations

from typing import Any

import flax.linen as fnn
import jax.numpy as jnp

from ..nn import QConvBNAct, QDense, QuantMode, QuantStub, dequant, max_pool
from ..quant import QConfig, QNNPACK
from ..quant.qtensor import QTensor
from .vgg import _flatten


class CifarAlexNet(fnn.Module):
    """AlexNet with the reference's CIFAR stem (cifar/alexnet.py:23-40)."""

    num_classes: int = 10
    drop_rate: float = 0.5
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype,
                  use_bn=False, use_bias=True)
        if self.quantized:
            x = QuantStub(self.qconfig, name="quant")(x, mode)
        x = QConvBNAct(64, 3, padding=1, act="relu", name="conv1", **kw)(x, mode, train)
        x = QConvBNAct(192, 5, padding=2, act="relu", name="conv2", **kw)(x, mode, train)
        x = max_pool(x, 3, 2)
        x = QConvBNAct(384, 3, padding=1, act="relu", name="conv3", **kw)(x, mode, train)
        x = QConvBNAct(256, 3, padding=1, act="relu", name="conv4", **kw)(x, mode, train)
        x = QConvBNAct(256, 3, padding=1, act="relu", name="conv5", **kw)(x, mode, train)
        x = max_pool(x, 3, 2)
        x = _flatten(x)
        for j in range(2):
            if not isinstance(x, QTensor):
                x = fnn.Dropout(self.drop_rate, deterministic=not train)(x)
            x = QDense(4096, use_bias=True, act="relu", quantized=self.quantized,
                       qconfig=self.qconfig, name=f"fc{j}")(x, mode)
        x = QDense(self.num_classes, use_bias=True, quantized=self.quantized,
                   qconfig=self.qconfig, name="fc2")(x, mode)
        return dequant(x)


def cifar_factories():
    from . import create_model

    reg = {"cifar_alexnet": lambda **kw: CifarAlexNet(**{"num_classes": 10, **kw})}

    def alias(name, target):
        def make(t=target, **kwargs):
            kwargs.setdefault("num_classes", 10)
            return create_model(t, **kwargs)

        reg[name] = make

    for t in ("qresnet18", "qresnet50", "qmobilenet_v2_ReLU",
              "qmobilenet_v3_large_HS", "qmobilenet_v3_small_HS", "qvgg16_bn"):
        alias(f"cifar_{t[1:] if t.startswith('q') else t}", t)
    return reg
