"""Quantizable VGG + AlexNet.

Re-implements reference Classification/models/imagenet/vgg.py:25-213 and
alexnet.py:17-74 (quant/dequant-wrapped torchvision nets with conv(+bn)+relu
fusion). Public specs: VGG A/B/D/E configs with optional BN; AlexNet's 5-conv
trunk + 3 FC head.
"""
from __future__ import annotations

from typing import Any

import flax.linen as fnn
import jax.numpy as jnp

from ..nn import (
    QConvBNAct,
    QDense,
    QuantMode,
    QuantStub,
    dequant,
    max_pool,
)
from ..quant import QConfig, QNNPACK
from ..quant.qtensor import QTensor

_VGG_CFGS = {
    "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "B": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "D": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
          512, 512, 512, "M"],
    "E": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512,
          "M", 512, 512, 512, 512, "M"],
}


def _flatten(x):
    if isinstance(x, QTensor):
        return QTensor(x.q.reshape(x.q.shape[0], -1), x.scale, x.zero_point)
    return x.reshape(x.shape[0], -1)


class VGG(fnn.Module):
    cfg: str = "D"
    batch_norm: bool = False
    num_classes: int = 1000
    drop_rate: float = 0.5
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)
        if self.quantized:
            x = QuantStub(self.qconfig, name="quant")(x, mode)
        i = 0
        for v in _VGG_CFGS[self.cfg]:
            if v == "M":
                x = max_pool(x, 2, 2)
            else:
                x = QConvBNAct(v, 3, padding=1, use_bn=self.batch_norm,
                               use_bias=not self.batch_norm, act="relu",
                               name=f"conv{i}", **kw)(x, mode, train)
                i += 1
        # adaptive 7x7 pooling is a no-op at 224 input; keep spatial dims
        x = _flatten(x)
        for j, feats in enumerate((4096, 4096)):
            x = QDense(feats, use_bias=True, act="relu", quantized=self.quantized,
                       qconfig=self.qconfig, name=f"fc{j}")(x, mode)
            if not isinstance(x, QTensor):
                x = fnn.Dropout(self.drop_rate, deterministic=not train)(x)
        x = QDense(self.num_classes, use_bias=True, quantized=self.quantized,
                   qconfig=self.qconfig, name="fc2")(x, mode)
        return dequant(x)


class AlexNet(fnn.Module):
    num_classes: int = 1000
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
        x = QConvBNAct(64, 11, strides=4, padding=2, act="relu", name="conv1", **kw)(
            x, mode, train)
        x = max_pool(x, 3, 2)
        x = QConvBNAct(192, 5, padding=2, act="relu", name="conv2", **kw)(x, mode, train)
        x = max_pool(x, 3, 2)
        x = QConvBNAct(384, 3, padding=1, act="relu", name="conv3", **kw)(x, mode, train)
        x = QConvBNAct(256, 3, padding=1, act="relu", name="conv4", **kw)(x, mode, train)
        x = QConvBNAct(256, 3, padding=1, act="relu", name="conv5", **kw)(x, mode, train)
        x = max_pool(x, 3, 2)
        x = _flatten(x)
        for j, feats in enumerate((4096, 4096)):
            if not isinstance(x, QTensor):
                x = fnn.Dropout(self.drop_rate, deterministic=not train)(x)
            x = QDense(feats, use_bias=True, act="relu", quantized=self.quantized,
                       qconfig=self.qconfig, name=f"fc{j}")(x, mode)
        x = QDense(self.num_classes, use_bias=True, quantized=self.quantized,
                   qconfig=self.qconfig, name="fc2")(x, mode)
        return dequant(x)


def vgg_factories():
    reg = {}
    for name, cfg in (("vgg11", "A"), ("vgg13", "B"), ("vgg16", "D"), ("vgg19", "E")):
        for bn in (False, True):
            for quant in (True, False):
                rname = f"{'q' if quant else ''}{name}{'_bn' if bn else ''}"

                def make(c=cfg, b=bn, q=quant, **kwargs):
                    kwargs.setdefault("num_classes", 1000)
                    return VGG(cfg=c, batch_norm=b, quantized=q, **kwargs)

                reg[rname] = make
    for quant in (True, False):
        reg[f"{'q' if quant else ''}alexnet"] = (
            lambda q=quant, **kw: AlexNet(quantized=q, **{"num_classes": 1000, **kw}))
    return reg
