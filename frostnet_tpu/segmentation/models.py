"""Segmentation models: quant-region backbone+head, float tail.

Re-implements the wrapper pattern of Semantic_Segmentation/model/
mobilenetv3.py:26-67 (and mobilenetv2.py): the quantized region is
QuantStub -> dilated backbone -> LR-ASPP head -> two DeQuantStubs; the float
tail projects both streams to nclass, adds, and bilinearly upsamples to the
input size. Only the quant region sees fake-quant/INT8; the tail always runs
float — expressed here by `quantized=False` tail convs rather than a module
split.
"""
from __future__ import annotations

from typing import Any

import flax.linen as fnn
import jax.numpy as jnp

from ..models.mobilenetv2 import MobileNetV2
from ..models.mobilenetv3 import MobileNetV3
from ..nn import QConvBNAct, QuantMode, QuantStub, dequant
from ..ops.resize import resize_bilinear
from ..quant import QConfig, QNNPACK
from .heads import LRASPPHead


class MobileNetV3Seg(fnn.Module):
    """MobileNetV3 + LR-ASPP semantic segmentation (model/mobilenetv3.py)."""

    num_classes: int = 19
    mode: str = "large"          # 'large' | 'small'
    relu_only: bool = False      # the RE variants (general_details.py choices)
    dataset: str = "city"        # picks the LR-ASPP pool geometry
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        size = x.shape[1:3]
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)

        # ---- quant region (the reference's `self.quantized` submodule) ----
        if self.quantized:
            x = QuantStub(self.qconfig, name="quant")(x, mode)
        feats = MobileNetV3(
            mode=self.mode, relu_only=self.relu_only, dilated=True,
            input_stub=False, name="backbone", **kw,
        )(x, mode, train)
        c1, c4 = feats[1], feats[4]
        pw, ps = (37, 12) if self.dataset == "city" else (25, 8)
        c1, c4 = LRASPPHead(pw, ps, name="head", **kw)(c1, c4, mode, train)
        c1, c4 = dequant(c1), dequant(c4)

        # ---- float tail (model/mobilenetv3.py:57-66) ----
        c4 = QConvBNAct(self.num_classes, 1, use_bn=False, use_bias=True, act=None,
                        quantized=False, name="project")(c4, mode, train)
        c1 = QConvBNAct(self.num_classes, 1, use_bn=False, use_bias=True, act=None,
                        quantized=False, name="auxlayer")(c1, mode, train)
        out = c1 + c4
        return resize_bilinear(out, size, align_corners=True)


class MobileNetV2Seg(fnn.Module):
    """MobileNetV2 + LR-ASPP (model/mobilenetv2.py pattern)."""

    num_classes: int = 19
    dataset: str = "city"
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        size = x.shape[1:3]
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)
        if self.quantized:
            x = QuantStub(self.qconfig, name="quant")(x, mode)
        feats = MobileNetV2(dilated=True, input_stub=False, name="backbone", **kw)(
            x, mode, train, features_only=True)
        c1, c4 = feats[0], feats[3]
        pw, ps = (37, 12) if self.dataset == "city" else (25, 8)
        c1, c4 = LRASPPHead(pw, ps, name="head", **kw)(c1, c4, mode, train)
        c1, c4 = dequant(c1), dequant(c4)
        c4 = QConvBNAct(self.num_classes, 1, use_bn=False, use_bias=True, act=None,
                        quantized=False, name="project")(c4, mode, train)
        c1 = QConvBNAct(self.num_classes, 1, use_bn=False, use_bias=True, act=None,
                        quantized=False, name="auxlayer")(c1, mode, train)
        out = c1 + c4
        return resize_bilinear(out, size, align_corners=True)


SEG_MODELS = {}
for _m in ("large", "small"):
    for _re, _suffix in ((False, ""), (True, "_RE")):
        _name = f"mobilenetv3{_suffix}_{_m}"

        def _make(mode=_m, re=_re, **kwargs):
            kwargs.setdefault("num_classes", 19)
            return MobileNetV3Seg(mode=mode, relu_only=re, **kwargs)

        SEG_MODELS[_name] = _make
SEG_MODELS["mobilenetv2"] = lambda **kw: MobileNetV2Seg(**{"num_classes": 19, **kw})


def _espnetv2(**kw):
    from .espnet import ESPNetv2Seg

    kw.setdefault("num_classes", 20)
    kw.pop("dataset", None)  # ESPNet heads use fixed PSP geometry (the
    # trainer passes dataset= for the LR-ASPP pool sizes; n/a here)
    return ESPNetv2Seg(**kw)


SEG_MODELS["espnetv2"] = _espnetv2


def _espnet(**kw):
    from .espnet import ESPNetSeg

    kw.setdefault("num_classes", 20)
    kw.pop("dataset", None)
    return ESPNetSeg(**kw)


SEG_MODELS["espnet"] = _espnet


def get_seg_model(name: str, **kwargs):
    """Dispatch mirroring Semantic_Segmentation/train.py:91-126 model names."""
    try:
        return SEG_MODELS[name](**kwargs)
    except KeyError:
        raise ValueError(f"unknown seg model {name!r}; options: {sorted(SEG_MODELS)}")
