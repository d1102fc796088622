"""Quantizable MobileNetV3 (large/small, HS and RE variants).

Re-implements the architecture of reference Classification/models/imagenet/
mobilenetv3.py:158-384 (stage tables :160-270, head :295-326) on the
frostnet_tpu block library. Width scaling quirks preserved: channels scale by
``int(c*wm)`` (no divisibility rounding), and stem/last-bneck channels scale
only for width>1 (:273,297-299).

The RE variants exist because pure-ReLU networks quantize better (the
reference latency table's mobilenet_v3_*_ReLU rows, Classification/README.md).
"""
from __future__ import annotations

from typing import Any

import flax.linen as fnn
import jax.numpy as jnp

from ..nn import (
    BottleneckV3,
    QConvBNAct,
    QHswish,
    QSEModule,
    QuantMode,
    QuantStub,
    dequant,
    global_avg_pool,
)
from ..quant import QConfig, QNNPACK
from ..quant.qtensor import QTensor

# (kernel, exp_size, out_c, se, nl, stride); nl is overridden to 'RE'
# everywhere when RE=True (reference :158-270).
_LARGE = (
    [(3, 16, 16, False, "RE", 1), (3, 64, 24, False, "RE", 2), (3, 72, 24, False, "RE", 1)],
    [(5, 72, 40, True, "RE", 2), (5, 120, 40, True, "RE", 1), (5, 120, 40, True, "RE", 1)],
    [
        (3, 240, 80, False, "HS", 2), (3, 200, 80, False, "HS", 1),
        (3, 184, 80, False, "HS", 1), (3, 184, 80, False, "HS", 1),
        (3, 480, 112, True, "HS", 1), (3, 672, 112, True, "HS", 1),
    ],
    [(5, 672, 160, True, "HS", 2), (5, 960, 160, True, "HS", 1), (5, 960, 160, True, "HS", 1)],
)
_SMALL = (
    [(3, 16, 16, True, "RE", 2)],
    [(3, 72, 24, False, "RE", 2), (3, 88, 24, False, "RE", 1)],
    [
        (5, 96, 40, True, "HS", 2), (5, 240, 40, True, "HS", 1),
        (5, 240, 40, True, "HS", 1), (5, 120, 48, True, "HS", 1),
        (5, 144, 48, True, "HS", 1),
    ],
    [(5, 288, 96, True, "HS", 2), (5, 576, 96, True, "HS", 1), (5, 576, 96, True, "HS", 1)],
)


class MobileNetV3(fnn.Module):
    num_classes: int = 1000
    mode: str = "large"
    width_mult: float = 1.0
    relu_only: bool = False          # the RE variants
    dilated: bool = False            # output-stride-16 trunk for segmentation
    drop_rate: float = 0.2
    quantized: bool = True
    input_stub: bool = True  # False when wrapped inside another quant region
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    def _hs(self, name):
        return QHswish(self.qconfig, name=name)

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False,
                 features_only: bool = False):
        wm = self.width_mult
        settings = _LARGE if self.mode == "large" else _SMALL
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)

        def scale_big(c):  # stem/last channels scale only above 1.0 (:273)
            return int(c * wm) if wm > 1.0 else c

        if self.quantized and self.input_stub:
            x = QuantStub(self.qconfig, name="quant")(x, mode)

        stem_c = scale_big(16)
        hs = not self.relu_only
        x = QConvBNAct(stem_c, 3, strides=2, padding=1,
                       act=None if hs else "relu", name="conv1", **kw)(x, mode, train)
        if hs:
            x = self._hs("conv1_hs")(x, mode) if self.quantized else _hswish_f(x)

        feats = []
        for si, stage in enumerate(settings):
            dilation = 2 if (self.dilated and si == 3) else 1
            for bi, (k, exp, c, se, nl, s) in enumerate(stage):
                if self.relu_only:
                    nl = "RE"
                if self.dilated and si == 3 and bi == len(stage) - 1:
                    exp, c = exp // 2, c // 2  # reference :193-196 dilated halving
                x = BottleneckV3(
                    out_channels=int(c * wm), exp_size=int(exp * wm), kernel_size=k,
                    strides=s if dilation == 1 else 1, dilation=dilation,
                    se=se, nl=nl, name=f"layer{si + 1}_{bi}", **kw,
                )(x, mode, train)
            feats.append(x)

        last_c = scale_big((960 if self.mode == "large" else 576) // (2 if self.dilated else 1))
        x = QConvBNAct(last_c, 1, act=None if hs else "relu", name="layer5", **kw)(
            x, mode, train)
        if hs:
            x = self._hs("layer5_hs")(x, mode) if self.quantized else _hswish_f(x)
        feats.append(x)

        if features_only or self.dilated:
            # all stage outputs [l1, l2, l3, l4, last_conv]; the segmentation
            # wrapper's (c1..c4) = ours [1..4] (backbones/mobilenetv3.py:200-212)
            return feats

        if self.mode == "small":
            x = QSEModule(quantized=self.quantized, qconfig=self.qconfig,
                          name="cls_se")(x, mode)
        if not isinstance(x, QTensor):
            x = fnn.Dropout(rate=self.drop_rate, deterministic=not train)(x)
        x = global_avg_pool(x, keepdims=True)
        mid = 1280 if self.mode == "large" else 1024
        x = QConvBNAct(mid, 1, use_bn=False, use_bias=True, act=None,
                       name="cls_conv1", **kw)(x, mode, train)
        x = self._hs("cls_hs")(x, mode) if self.quantized else _hswish_f(x)
        x = QConvBNAct(self.num_classes, 1, use_bn=False, use_bias=True, act=None,
                       name="cls_conv2", **kw)(x, mode, train)
        if self.quantized:
            x = dequant(x)
        return x.reshape(x.shape[0], x.shape[-1])


def _hswish_f(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def mobilenetv3_factories():
    reg = {}
    for m in ("large", "small"):
        for relu_only, suffix in ((False, "HS"), (True, "ReLU")):
            for quant in (True, False):
                name = f"{'q' if quant else ''}mobilenet_v3_{m}_{suffix}"

                def make(mode=m, ro=relu_only, q=quant, **kwargs):
                    kwargs.setdefault("num_classes", 1000)
                    return MobileNetV3(mode=mode, relu_only=ro, quantized=q, **kwargs)

                reg[name] = make
    return reg
