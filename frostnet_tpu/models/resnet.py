"""Quantizable ResNet family (18/34/50/101/152 + ResNeXt).

Re-implements reference Classification/models/imagenet/resnet.py:23-174
(QuantizableBasicBlock/Bottleneck with FloatFunctional add_relu joins,
conv+bn+relu fusion boundaries) on the frostnet_tpu block library.
Architecture is the public ResNet spec: 7x7/2 stem + maxpool, 4 stages,
global pool, linear classifier.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as fnn
import jax.numpy as jnp

from ..nn import (
    QAddReLU,
    QConvBNAct,
    QDense,
    QuantMode,
    QuantStub,
    dequant,
    global_avg_pool,
    max_pool,
)
from ..quant import QConfig, QNNPACK
from ..quant.qtensor import QTensor


class BasicBlock(fnn.Module):
    features: int
    strides: int = 1
    groups: int = 1
    base_width: int = 64
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32
    expansion = 1

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)
        in_c = (x.q if isinstance(x, QTensor) else x).shape[-1]
        identity = x
        out = QConvBNAct(self.features, 3, strides=self.strides, padding=1,
                         act="relu", name="conv1", **kw)(x, mode, train)
        out = QConvBNAct(self.features, 3, padding=1, act=None, name="conv2", **kw)(
            out, mode, train)
        if self.strides != 1 or in_c != self.features:
            identity = QConvBNAct(self.features, 1, strides=self.strides, act=None,
                                  name="downsample", **kw)(x, mode, train)
        if self.quantized:
            return QAddReLU(self.qconfig, name="add_relu")(out, identity, mode)
        return fnn.relu(out + (identity.dequantize() if isinstance(identity, QTensor) else identity))


class Bottleneck(fnn.Module):
    features: int
    strides: int = 1
    groups: int = 1
    base_width: int = 64
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32
    expansion = 4

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)
        in_c = (x.q if isinstance(x, QTensor) else x).shape[-1]
        width = int(self.features * (self.base_width / 64.0)) * self.groups
        out_c = self.features * 4
        identity = x
        out = QConvBNAct(width, 1, act="relu", name="conv1", **kw)(x, mode, train)
        out = QConvBNAct(width, 3, strides=self.strides, padding=1, groups=self.groups,
                         act="relu", name="conv2", **kw)(out, mode, train)
        out = QConvBNAct(out_c, 1, act=None, name="conv3", **kw)(out, mode, train)
        if self.strides != 1 or in_c != out_c:
            identity = QConvBNAct(out_c, 1, strides=self.strides, act=None,
                                  name="downsample", **kw)(x, mode, train)
        if self.quantized:
            return QAddReLU(self.qconfig, name="skip_add_relu")(out, identity, mode)
        return fnn.relu(out + (identity.dequantize() if isinstance(identity, QTensor) else identity))


class ResNet(fnn.Module):
    block: Any = BasicBlock
    layers: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 1000
    groups: int = 1
    width_per_group: int = 64
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)
        if self.quantized:
            x = QuantStub(self.qconfig, name="quant")(x, mode)
        x = QConvBNAct(64, 7, strides=2, padding=3, act="relu", name="stem", **kw)(
            x, mode, train)
        x = max_pool(_pad1(x), 3, 2, "VALID")
        for si, (feats, n) in enumerate(zip((64, 128, 256, 512), self.layers)):
            for bi in range(n):
                x = self.block(
                    features=feats, strides=(2 if bi == 0 and si > 0 else 1),
                    groups=self.groups, base_width=self.width_per_group,
                    name=f"layer{si + 1}_{bi}", **kw,
                )(x, mode, train)
        x = global_avg_pool(x, keepdims=False)
        if isinstance(x, QTensor):
            x = QTensor(x.q.reshape(x.q.shape[0], -1), x.scale, x.zero_point)
        x = QDense(self.num_classes, use_bias=True, quantized=self.quantized,
                   qconfig=self.qconfig, name="fc")(x, mode)
        return dequant(x)


def _pad1(x):
    """1-px pad before the 3x3/2 maxpool. QTensor pads with the zero point
    (represents 0.0); post-relu activations are >= zp so the max semantics
    match torch's -inf padding."""
    if isinstance(x, QTensor):
        q = jnp.pad(x.q, ((0, 0), (1, 1), (1, 1), (0, 0)))
        zp = x.zero_point.astype(x.q.dtype)
        mask = jnp.pad(jnp.ones_like(x.q), ((0, 0), (1, 1), (1, 1), (0, 0)))
        return QTensor(jnp.where(mask > 0, q, zp), x.scale, x.zero_point)
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)


def resnet_factories():
    cfgs = {
        "resnet18": (BasicBlock, (2, 2, 2, 2), {}),
        "resnet34": (BasicBlock, (3, 4, 6, 3), {}),
        "resnet50": (Bottleneck, (3, 4, 6, 3), {}),
        "resnet101": (Bottleneck, (3, 4, 23, 3), {}),
        "resnet152": (Bottleneck, (3, 8, 36, 3), {}),
        "resnext101_32x8d": (Bottleneck, (3, 4, 23, 3),
                             {"groups": 32, "width_per_group": 8}),
    }
    reg = {}
    for name, (blk, layers, extra) in cfgs.items():
        for quant in (True, False):
            rname = f"{'q' if quant else ''}{name}"

            def make(b=blk, l=layers, e=extra, q=quant, **kwargs):
                kwargs.setdefault("num_classes", 1000)
                return ResNet(block=b, layers=l, quantized=q, **e, **kwargs)

            reg[rname] = make
    return reg
