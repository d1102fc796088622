"""Quantizable ShuffleNetV2.

Re-implements reference Classification/models/imagenet/shufflenetv2.py:24-154
(torchvision's quantizable variant: FloatFunctional cat at every unit join,
channel shuffle between branches). Public spec: stem 24ch, 3 stages of
(4, 8, 4) units, 1024-ch head (2048 for x2_0).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as fnn
import jax.numpy as jnp

from ..nn import (
    QCat,
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


def channel_shuffle(x, groups: int = 2):
    if isinstance(x, QTensor):
        return QTensor(channel_shuffle(x.q, groups), x.scale, x.zero_point)
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(n, h, w, c)


class ShuffleUnit(fnn.Module):
    out_channels: int
    strides: int = 1
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)
        branch_c = self.out_channels // 2

        def split(t):
            if isinstance(t, QTensor):
                c = t.q.shape[-1] // 2
                return (QTensor(t.q[..., :c], t.scale, t.zero_point),
                        QTensor(t.q[..., c:], t.scale, t.zero_point))
            c = t.shape[-1] // 2
            return t[..., :c], t[..., c:]

        if self.strides == 1:
            x1, x2 = split(x)
        else:
            x1 = QConvBNAct(x.shape[-1] if not isinstance(x, QTensor) else x.q.shape[-1],
                            3, strides=2, padding=1,
                            groups=(x.q if isinstance(x, QTensor) else x).shape[-1],
                            act=None, name="b1_dw", **kw)(x, mode, train)
            x1 = QConvBNAct(branch_c, 1, act="relu", name="b1_pw", **kw)(x1, mode, train)
            x2 = x

        x2 = QConvBNAct(branch_c, 1, act="relu", name="b2_pw1", **kw)(x2, mode, train)
        x2 = QConvBNAct(branch_c, 3, strides=self.strides, padding=1, groups=branch_c,
                        act=None, name="b2_dw", **kw)(x2, mode, train)
        x2 = QConvBNAct(branch_c, 1, act="relu", name="b2_pw2", **kw)(x2, mode, train)

        if self.quantized:
            out = QCat(self.qconfig, name="cat")([x1, x2], mode, axis=-1)
        else:
            out = jnp.concatenate([x1, x2], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleNetV2(fnn.Module):
    stage_repeats: Sequence[int] = (4, 8, 4)
    stage_channels: Sequence[int] = (24, 116, 232, 464, 1024)
    num_classes: int = 1000
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)
        if self.quantized:
            x = QuantStub(self.qconfig, name="quant")(x, mode)
        x = QConvBNAct(self.stage_channels[0], 3, strides=2, padding=1, act="relu",
                       name="conv1", **kw)(x, mode, train)
        x = max_pool(_pad_zp(x), 3, 2, "VALID")
        for si, repeats in enumerate(self.stage_repeats):
            out_c = self.stage_channels[si + 1]
            for bi in range(repeats):
                x = ShuffleUnit(out_c, strides=(2 if bi == 0 else 1),
                                name=f"stage{si + 2}_{bi}", **kw)(x, mode, train)
        x = QConvBNAct(self.stage_channels[-1], 1, act="relu", name="conv5", **kw)(
            x, mode, train)
        x = global_avg_pool(x, keepdims=False)
        if isinstance(x, QTensor):
            x = QTensor(x.q.reshape(x.q.shape[0], -1), x.scale, x.zero_point)
        x = QDense(self.num_classes, use_bias=True, quantized=self.quantized,
                   qconfig=self.qconfig, name="fc")(x, mode)
        return dequant(x)


def _pad_zp(x):
    if isinstance(x, QTensor):
        q = jnp.pad(x.q, ((0, 0), (1, 1), (1, 1), (0, 0)))
        zp = x.zero_point.astype(x.q.dtype)
        mask = jnp.pad(jnp.ones_like(x.q), ((0, 0), (1, 1), (1, 1), (0, 0)))
        return QTensor(jnp.where(mask > 0, q, zp), x.scale, x.zero_point)
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)


_CFGS = {
    "shufflenet_v2_x0_5": ((4, 8, 4), (24, 48, 96, 192, 1024)),
    "shufflenet_v2_x1_0": ((4, 8, 4), (24, 116, 232, 464, 1024)),
    "shufflenet_v2_x1_5": ((4, 8, 4), (24, 176, 352, 704, 1024)),
    "shufflenet_v2_x2_0": ((4, 8, 4), (24, 244, 488, 976, 2048)),
}


def shufflenetv2_factories():
    reg = {}
    for name, (reps, chans) in _CFGS.items():
        for quant in (True, False):
            rname = f"{'q' if quant else ''}{name}"

            def make(r=reps, c=chans, q=quant, **kwargs):
                kwargs.setdefault("num_classes", 1000)
                return ShuffleNetV2(stage_repeats=r, stage_channels=c, quantized=q, **kwargs)

            reg[rname] = make
    return reg
