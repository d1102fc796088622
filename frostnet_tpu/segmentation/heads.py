"""Segmentation heads: Lite R-ASPP and R-ASPP.

Re-implements Semantic_Segmentation/model/layers/LRASPP.py:8-50 and
RASPP.py:8-82: two-branch attention head — 1x1 ConvBNReLU features times an
hsigmoid-gated pooled branch, with an observed multiply (FloatFunctional) as
the join.
"""
from __future__ import annotations

from typing import Any

import flax.linen as fnn
import jax.numpy as jnp

from ..nn import QConvBNAct, QHsigmoid, QMul, QuantMode
from ..ops.resize import resize_bilinear
from ..quant import QConfig, QNNPACK
from ..quant.qtensor import QTensor
from ..nn.pool import avg_pool


def _as_f32(x):
    return x.dequantize() if isinstance(x, QTensor) else x


class LRASPP(fnn.Module):
    """Lite R-ASPP (LRASPP.py:21-50). Pool window/stride depends on dataset
    crop size: (37,12) for cityscapes 768 crops, (25,8) otherwise."""

    pool_window: int = 37
    pool_stride: int = 12
    out_channels: int = 128  # 256//2
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)
        size = (x.q if isinstance(x, QTensor) else x).shape[1:3]
        feat1 = QConvBNAct(self.out_channels, 1, act="relu", name="b0", **kw)(
            x, mode, train)
        # pooled gate branch
        win = min(self.pool_window, size[0], size[1])
        feat2 = avg_pool(x, win, min(self.pool_stride, win), "VALID")
        feat2 = QConvBNAct(self.out_channels, 1, act=None, name="b1_conv", **kw)(
            feat2, mode, train)
        feat2 = QHsigmoid(self.qconfig, name="b1_hsig")(feat2, mode) \
            if self.quantized else jnp.clip(feat2 + 3.0, 0, 6) / 6
        feat2 = _as_f32(feat2)
        feat2 = resize_bilinear(feat2, size, align_corners=True)
        if self.quantized:
            return QMul(self.qconfig, name="quant_mul")(feat1, feat2, mode)
        return feat1 * feat2


class LRASPPHead(fnn.Module):
    """_Head (LRASPP.py:8-19): LR-ASPP on c4, upsampled to c1's size."""

    pool_window: int = 37
    pool_stride: int = 12
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, c1, c4, mode: QuantMode = QuantMode(), train: bool = False):
        c4 = LRASPP(self.pool_window, self.pool_stride, quantized=self.quantized,
                    qconfig=self.qconfig, dtype=self.dtype, name="lr_aspp")(
            c4, mode, train)
        c1_size = (c1.q if isinstance(c1, QTensor) else c1).shape[1:3]
        c4 = resize_bilinear(_as_f32(c4), c1_size, align_corners=True)
        return c1, c4


class ASPPPooling(fnn.Module):
    """Global-pool branch of ASPP (RASPP.py:32-47)."""

    out_channels: int = 256
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        from ..nn.pool import global_avg_pool

        size = (x.q if isinstance(x, QTensor) else x).shape[1:3]
        p = global_avg_pool(x, keepdims=True)
        p = QConvBNAct(self.out_channels, 1, act="relu", quantized=self.quantized,
                       qconfig=self.qconfig, dtype=self.dtype, name="conv")(
            p, mode, train)
        return resize_bilinear(_as_f32(p), size, align_corners=True)


class RASPP(fnn.Module):
    """R-ASPP (RASPP.py:49-83): 1x1 + three atrous 3x3 branches + pooled
    branch, observed concat, 1x1 project."""

    atrous_rates: tuple = (6, 12, 18)
    out_channels: int = 256
    drop_rate: float = 0.1
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        from ..nn import QCat

        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)
        feats = [QConvBNAct(self.out_channels, 1, act="relu", name="b0", **kw)(
            x, mode, train)]
        for i, r in enumerate(self.atrous_rates):
            feats.append(QConvBNAct(self.out_channels, 3, padding=r, dilation=r,
                                    act="relu", name=f"b{i + 1}", **kw)(x, mode, train))
        feats.append(ASPPPooling(self.out_channels, name="b4", **kw)(x, mode, train))
        feats = [_as_f32(f) for f in feats]
        out = (QCat(self.qconfig, name="quant_cat")(feats, mode, axis=-1)
               if self.quantized else jnp.concatenate(feats, -1))
        out = QConvBNAct(self.out_channels, 1, act="relu", name="project", **kw)(
            out, mode, train)
        if not isinstance(out, QTensor):
            out = fnn.Dropout(self.drop_rate, deterministic=not train)(out)
        return out


class RASPPHead(fnn.Module):
    """_Head (RASPP.py:8-30): ASPP on c4 upsampled to c1 + 48-ch aux branch,
    concat, 3x3 project, 1x1 classifier."""

    num_classes: int = 19
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, c1, c4, mode: QuantMode = QuantMode(), train: bool = False):
        from ..nn import QCat

        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)
        c4 = RASPP(name="aspp", **kw)(c4, mode, train)
        c1_size = (c1.q if isinstance(c1, QTensor) else c1).shape[1:3]
        c4 = resize_bilinear(_as_f32(c4), c1_size, align_corners=True)
        c1 = QConvBNAct(48, 1, act="relu", name="auxlayer", **kw)(c1, mode, train)
        out = (QCat(self.qconfig, name="quant_cat")([_as_f32(c1), c4], mode, axis=-1)
               if self.quantized else jnp.concatenate([_as_f32(c1), c4], -1))
        out = QConvBNAct(256, 3, padding=1, act="relu", name="project", **kw)(
            out, mode, train)
        return QConvBNAct(self.num_classes, 1, use_bn=False, use_bias=True, act=None,
                          quantized=False, name="reduce_conv")(out, mode, train)
