"""SSDLite-MobileNetV2 detection network (feat/head split).

Re-implements Object_Detection/ssd_qmv2.py: a quantized feature net
(QuantStub -> dilated MBv2 trunk -> grouped ConvBN extras -> 6 dequantized
sources, :205-268) and a float head (3x3 ConvBN loc/conf layers per source,
:270-334). The head stays float in the reference (prepare_qat is applied to
the feat net only, qtrainval.py:241-251) — mirrored here with
``quantized=False`` head convs.
"""
from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as fnn
import jax.numpy as jnp

from ..models.frostnet import make_divisible
from ..nn import InvertedResidual, QConvBNAct, QuantMode, QuantStub, avg_pool, dequant
from ..quant import QConfig, QNNPACK
from ..quant.qtensor import QTensor

# (t, c, n, s, dilation) — ssd_qmv2.py:129-137: last two stages dilated
_SSD_MBV2_SETTINGS = [
    (1, 16, 1, 1, 1),
    (6, 24, 2, 2, 1),
    (6, 32, 3, 2, 1),
    (6, 64, 4, 2, 1),
    (6, 96, 3, 1, 1),
    (6, 160, 3, 1, 2),
    (6, 320, 1, 1, 2),
]

# extras: cfg [32,128]*3 + avgpool, strides [1,2]*3+[1], alternating 1x1 and
# grouped 3x3 (ssd_qmv2.py:188-203); head taps extras 1,3,5,6.
_EXTRAS_CFG = [32, 128, 32, 128, 32, 128, "P"]
_EXTRAS_STRIDES = [1, 2, 1, 2, 1, 2, 1]
_EXTRAS_HEAD_POS = (1, 3, 5, 6)
_ANCHOR_COUNTS = (4, 6, 6, 6, 4, 4)


class SSDMobileNetV2Feat(fnn.Module):
    """The quantized feature extractor (SSD_MobileNetV2_Feat)."""

    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)
        if self.quantized:
            x = QuantStub(self.qconfig, name="quant")(x, mode)

        x = QConvBNAct(make_divisible(32), 3, strides=2, padding=1, act="relu",
                       name="stem", **kw)(x, mode, train)
        sources: List = []
        bidx = 0
        for si, (t, c, n, s, d) in enumerate(_SSD_MBV2_SETTINGS):
            out_c = make_divisible(c)
            for i in range(n):
                x = InvertedResidual(
                    out_channels=out_c, strides=(s if i == 0 else 1),
                    expand_ratio=t, dilation=d, name=f"block{bidx}", **kw,
                )(x, mode, train)
                bidx += 1
            if si == 2:  # after features[6] — first source (ssd_qmv2.py:229-234)
                sources.append(x)
        x = QConvBNAct(1280, 1, act="relu", name="final_conv", **kw)(x, mode, train)
        sources.append(x)

        in_c = 1280
        flag = False
        for k, v in enumerate(_EXTRAS_CFG):
            if v == "P":
                x = avg_pool(x, 3, 3)
            else:
                stride = _EXTRAS_STRIDES[k]
                x = QConvBNAct(
                    v, (1, 3)[flag], strides=stride, padding=(0, 1)[stride == 2],
                    groups=(1, in_c)[flag], act=None, name=f"extra{k}", **kw,
                )(x, mode, train)
                in_c = v
            # feat forward relu's every extra output (ssd_qmv2.py:246-249)
            x = _relu_q(x)
            flag = not flag
            if k in _EXTRAS_HEAD_POS:
                sources.append(x)
        return [dequant(s) for s in sources]


def _relu_q(x):
    if isinstance(x, QTensor):
        return QTensor(jnp.maximum(x.q, x.zero_point.astype(x.q.dtype)),
                       x.scale, x.zero_point)
    return fnn.relu(x)


class SSDHead(fnn.Module):
    """Float loc/conf head (SSD_MobileNetV2_HEAD :270-334): one 3x3 ConvBN
    pair per source; outputs (loc (B,P,4), conf (B,P,C))."""

    num_classes: int = 21
    anchor_counts: Sequence[int] = _ANCHOR_COUNTS
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, sources, mode: QuantMode = QuantMode(), train: bool = False):
        locs, confs = [], []
        for i, (src, a) in enumerate(zip(sources, self.anchor_counts)):
            loc = QConvBNAct(a * 4, 3, padding=1, act=None, quantized=False,
                             dtype=self.dtype, name=f"loc{i}")(src, mode, train)
            conf = QConvBNAct(a * self.num_classes, 3, padding=1, act=None,
                              quantized=False, dtype=self.dtype,
                              name=f"conf{i}")(src, mode, train)
            locs.append(loc.reshape(loc.shape[0], -1))
            confs.append(conf.reshape(conf.shape[0], -1))
        loc = jnp.concatenate(locs, axis=1).reshape(locs[0].shape[0], -1, 4)
        conf = jnp.concatenate(confs, axis=1).reshape(
            confs[0].shape[0], -1, self.num_classes)
        return loc, conf


def build_ssd(num_classes: int = 21, quantized: bool = True,
              qconfig: QConfig = QNNPACK, dtype=jnp.float32):
    """(feat, head) pair (ssd_qmv2.py:338-363)."""
    feat = SSDMobileNetV2Feat(quantized=quantized, qconfig=qconfig, dtype=dtype)
    head = SSDHead(num_classes=num_classes, dtype=dtype)
    return feat, head
