"""Quantizable MobileNetV2.

Re-implements the behavior of reference Classification/models/imagenet/
mobilenet.py (QuantizableMobileNetV2 subclassing torchvision's MobileNetV2
with FloatFunctional skip adds; ReLU6 replaced by ReLU for quantization via
`_replace_relu`, utils.py:9-43). Architecture is the public MobileNetV2
spec: stem 32ch /2, inverted-residual stages (t,c,n,s), 1280-ch head,
dropout 0.2, linear classifier.
"""
from __future__ import annotations

from typing import Any

import flax.linen as fnn
import jax.numpy as jnp

from ..nn import (
    InvertedResidual,
    QConvBNAct,
    QDense,
    QuantMode,
    QuantStub,
    dequant,
    global_avg_pool,
)
from ..quant import QConfig, QNNPACK
from ..quant.qtensor import QTensor
from .frostnet import make_divisible

# (expand_ratio, channels, repeats, stride)
_SETTINGS = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


class MobileNetV2(fnn.Module):
    num_classes: int = 1000
    width_mult: float = 1.0
    dilated: bool = False        # output-stride 16 (segmentation backbone)
    drop_rate: float = 0.2
    relu6: bool = False          # quant models use plain ReLU (_replace_relu)
    quantized: bool = True
    input_stub: bool = True  # False when wrapped inside another quant region
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False,
                 features_only: bool = False):
        act = "relu6" if self.relu6 else "relu"
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)
        wm = self.width_mult

        if self.quantized and self.input_stub:
            x = QuantStub(self.qconfig, name="quant")(x, mode)

        in_c = make_divisible(32 * wm)
        x = QConvBNAct(in_c, 3, strides=2, padding=1, act=act, name="conv_stem", **kw)(
            x, mode, train)

        feats = []
        cur_stride, dilation = 2, 1
        bidx = 0
        for t, c, n, s in _SETTINGS:
            out_c = make_divisible(c * wm)
            for i in range(n):
                stride = s if i == 0 else 1
                if self.dilated and cur_stride * stride > 16:
                    dilation *= stride
                    stride = 1
                cur_stride *= stride
                x = InvertedResidual(
                    out_channels=out_c, strides=stride, expand_ratio=t,
                    dilation=dilation, name=f"block{bidx}", **kw,
                )(x, mode, train)
                bidx += 1
            feats.append(x)

        last_c = make_divisible(1280 * wm) if wm > 1.0 else 1280
        x = QConvBNAct(last_c, 1, act=act, name="conv_head", **kw)(x, mode, train)

        if features_only:
            # c1(/4), c2(/8), c3(/16), c4(/32 or /16 dilated) — the
            # segmentation backbone contract (backbones/mobilenetv2.py:10-146)
            return [dequant(f) for f in (feats[1], feats[2], feats[4], feats[6])]

        x = global_avg_pool(x, keepdims=False)
        if not isinstance(x, QTensor):
            x = fnn.Dropout(rate=self.drop_rate, deterministic=not train)(x)
        else:
            x = x.dequantize() if not self.quantized else x
        if isinstance(x, QTensor):
            x = QTensor(x.q.reshape(x.q.shape[0], -1), x.scale, x.zero_point)
        x = QDense(self.num_classes, use_bias=True, quantized=self.quantized,
                   qconfig=self.qconfig, name="classifier")(x, mode)
        return dequant(x)


def mobilenetv2_factories():
    reg = {}
    for quant in (True, False):
        for relu6, suffix in ((False, "ReLU"), (True, "ReLU6")):
            name = f"{'q' if quant else ''}mobilenet_v2_{suffix}"

            def make(q=quant, r6=relu6, **kwargs):
                kwargs.setdefault("num_classes", 1000)
                return MobileNetV2(quantized=q, relu6=r6, **kwargs)

            reg[name] = make
    reg["mobilenet_v2"] = lambda **kw: MobileNetV2(quantized=False, **kw)
    reg["qmobilenet_v2"] = lambda **kw: MobileNetV2(quantized=True, **kw)
    return reg
