"""Tiny-DSOD detection network (quantized feat / float head).

Re-implements Object_Detection/qtdsod.py: depthwise stem (:174-202), four
dense stages of dwd blocks joined with observed cats (:224-278,339-361), the
down/up-sampling FPN-style fusion with observed qadd/qcat joins
(:280-310,365-389), six dequantized sources, and the ConvBN head (:449-514).
Bilinear upsampling uses align_corners=False (reference F.interpolate
default).
"""
from __future__ import annotations

from typing import Any, List

import flax.linen as fnn
import jax.numpy as jnp

from ..nn import QAdd, QCat, QConvBNAct, QuantMode, QuantStub, dequant, max_pool
from ..ops.resize import resize_bilinear
from ..quant import QConfig, QNNPACK
from ..quant.qtensor import QTensor
from .models import SSDHead


def _shape(x):
    return (x.q if isinstance(x, QTensor) else x).shape


def _maxpool_ceil(x, k=2, s=2):
    """MaxPool2d(ceil_mode=True): pad bottom/right so the window covers the
    trailing rows/cols like torch's ceil mode."""
    h, w = _shape(x)[1], _shape(x)[2]
    ph = (-h) % s if h % s else 0
    pw = (-w) % s if w % s else 0
    if ph or pw:
        if isinstance(x, QTensor):
            q = jnp.pad(x.q, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
            x = QTensor(q, x.scale, x.zero_point)
        else:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return max_pool(x, k, s)


class _DwdBlock(fnn.Module):
    """1x1 conv_bn + depthwise 3x3 conv_bn (qtdsod.py:77-93)."""

    oup: int
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode, train):
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)
        x = QConvBNAct(self.oup, 1, padding=0, act="relu", name="dwd1", **kw)(x, mode, train)
        return QConvBNAct(self.oup, 3, padding=1, groups=self.oup, act="relu",
                          name="dwd2", **kw)(x, mode, train)


class TDSODFeat(fnn.Module):
    """QSSD_TDSOD_Feat (qtdsod.py:204-447)."""

    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)

        def conv(o, k, s, p, g, act, name):
            return QConvBNAct(o, k, strides=s, padding=p, groups=g, act=act,
                              name=name, **kw)

        def cat(xs, name):
            if self.quantized:
                return QCat(self.qconfig, name=name)(xs, mode, axis=-1)
            return jnp.concatenate(xs, axis=-1)

        def add(a, b, name):
            if self.quantized:
                return QAdd(self.qconfig, name=name)(a, b, mode)
            return a + b

        if self.quantized:
            x = QuantStub(self.qconfig, name="quant")(x, mode)

        # stem (qtdsod.py:174-194)
        x = conv(64, 3, 2, 1, 1, "relu", "base1")(x, mode, train)
        x = conv(64, 1, 1, 0, 1, "relu", "base2")(x, mode, train)
        x = conv(64, 3, 1, 1, 64, "relu", "base3")(x, mode, train)
        x = conv(128, 1, 1, 0, 1, "relu", "base4")(x, mode, train)
        x = conv(128, 3, 1, 1, 128, "relu", "base5")(x, mode, train)
        x = max_pool(x, 2, 2)  # 75x75

        # dense stages: (n_blocks, growth, transition)
        for si, (n, g) in enumerate([(4, 32), (6, 48), (6, 64), (6, 80)]):
            for it in range(n):
                blk = _DwdBlock(g, name=f"ddb{si}_{it}", **kw)(x, mode, train)
                x = cat([x, blk], f"qcat_ddb{si}_{it}")
            if si == 0:
                x = conv(128, 1, 1, 0, 1, "relu", "trans0_conv")(x, mode, train)
                x = _maxpool_ceil(x)              # 38x38
                infeat_1 = x
            elif si == 1:
                x = conv(128, 1, 1, 0, 1, "relu", "trans1_conv")(x, mode, train)
                x = _maxpool_ceil(x)              # 19x19
            elif si == 2:
                x = conv(256, 1, 1, 0, 1, "relu", "trans2")(x, mode, train)
            else:
                x = conv(64, 1, 1, 0, 1, "relu", "trans3")(x, mode, train)
        infeat_2 = x                              # 19x19, 64ch

        def down0(xin, i):
            y = _maxpool_ceil(xin)
            return conv(64, 1, 1, 0, 1, "relu", f"downfeat0_{i}")(y, mode, train)

        def down1(xin, i):
            y = QConvBNAct(64, 1, padding=0, act=None, name=f"downfeat1_{i}a", **kw)(
                xin, mode, train)
            return conv(64, 3, 2, 1, 64, "relu", f"downfeat1_{i}b")(y, mode, train)

        infeat_3 = cat([down0(infeat_1, 0), down1(infeat_1, 0)], "qcat0")  # 19x19,128
        h, w = _shape(infeat_3)[1], _shape(infeat_3)[2]

        def crop(t):
            if isinstance(t, QTensor):
                return QTensor(t.q[:, :h, :w], t.scale, t.zero_point)
            return t[:, :h, :w]

        s0 = cat([crop(infeat_3), crop(infeat_2)], "qcat1")                # 19x19,192
        s1 = cat([down0(s0, 1), down1(s0, 1)], "qcat2")                    # 10x10,128
        s2 = cat([down0(s1, 2), down1(s1, 2)], "qcat3")                    # 5x5,128
        s3 = cat([down0(s2, 3), down1(s2, 3)], "qcat4")                    # 3x3,128
        s4 = cat([down0(s3, 4), down1(s3, 4)], "qcat5")                    # 2x2,128

        def up(t, target, i):
            tf = dequant(t) if isinstance(t, QTensor) else t
            th, tw = _shape(target)[1], _shape(target)[2]
            y = resize_bilinear(tf, (th, tw), align_corners=False)
            if self.quantized:
                y = QuantStub(self.qconfig, name=f"requant_up{i}")(y, mode)
            return conv(128, 3, 1, 1, 128, "relu", f"upfeat{i}")(y, mode, train)

        sources: List = [s4]
        u = s4
        for i, tgt in enumerate([s3, s2, s1, infeat_3, infeat_1]):
            u = add(up(u, tgt, i), tgt, f"qadd{i + 1}")
            sources.append(u)
        sources = sources[::-1]
        return [dequant(s) for s in sources]


class TDSODHead(fnn.Module):
    """QSSD_TDSOD_HEAD (qtdsod.py:449-514): 3x3 ConvBN loc/conf per source."""

    num_classes: int = 21
    anchor_counts = (4, 6, 6, 6, 4, 4)
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, sources, mode: QuantMode = QuantMode(), train: bool = False):
        return SSDHead(self.num_classes, self.anchor_counts, self.dtype,
                       name="head")(sources, mode, train)


def build_tdsod(num_classes: int = 21, quantized: bool = True,
                qconfig: QConfig = QNNPACK, dtype=jnp.float32):
    """(feat, head) pair (qtdsod.py:516+)."""
    return (TDSODFeat(quantized=quantized, qconfig=qconfig, dtype=dtype),
            TDSODHead(num_classes=num_classes, dtype=dtype))
