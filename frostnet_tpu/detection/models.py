"""SSDLite-MobileNetV2 detection network (feat/head split).

Re-implements Object_Detection/ssd_qmv2.py: a quantized feature net
(QuantStub -> dilated MBv2 trunk -> grouped ConvBN extras -> 6 dequantized
sources, :205-268) and a float head (3x3 ConvBN loc/conf layers per source,
:270-334). The head stays float in the reference (prepare_qat is applied to
the feat net only, qtrainval.py:241-251) — mirrored here with
``quantized=False`` head convs.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence

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


# ---------------------------------------------------------------------------
# Pretrained float trunk import (the reference qssd recipe loads
# weights/mobilenet_v2-float.pth into the backbone before training,
# ssd_qmv2.py:338-341). The checkpoint uses the torchvision MobileNetV2 key
# layout: features.0.{0,1} stem, features.{1..17}.conv.* blocks,
# features.18.{0,1} final 1280 conv; classifier.* is ignored (strict=False
# in the reference).
# ---------------------------------------------------------------------------

def load_torch_mobilenet_v2_checkpoint(path_or_state, variables):
    """Load a torchvision-format float MobileNetV2 checkpoint into the
    SSDMobileNetV2Feat variables (trunk + final_conv; extras stay as-is).

    Returns a new variables dict with 'params' and 'batch_stats' updated.
    """
    import numpy as np

    if isinstance(path_or_state, str):
        import torch

        ckpt = torch.load(path_or_state, map_location="cpu")
    else:
        ckpt = path_or_state
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    state = {}
    for k, v in ckpt.items():
        k = k[len("module."):] if k.startswith("module.") else k
        # jnp-independent copy: torch mutates BN buffers in place and numpy
        # views alias torch storage (see frostnet_features._set)
        state[k] = np.array(getattr(v, "numpy", lambda: v)())

    from ..models.frostnet_features import flax_to_mutable

    params = flax_to_mutable(variables["params"])
    batch_stats = flax_to_mutable(variables.get("batch_stats", {}))

    def node(tree, dst: str):
        for part in dst.split("/")[:-1]:
            tree = tree.setdefault(part, {})
        return tree.setdefault(dst.split("/")[-1], {})

    def put_convbn(dst: str, conv_key: str, bn_key: Optional[str]):
        w = state.get(conv_key + ".weight")
        if w is None:
            return 0
        p = node(params, dst)
        p["kernel"] = jnp.array(w.transpose(2, 3, 1, 0))
        n = 1
        if bn_key is not None:
            p["scale"] = jnp.array(state[bn_key + ".weight"])
            p["bias_bn"] = jnp.array(state[bn_key + ".bias"])
            b = node(batch_stats, dst)
            b["mean"] = jnp.array(state[bn_key + ".running_mean"])
            b["var"] = jnp.array(state[bn_key + ".running_var"])
            n += 4
        return n

    loaded = put_convbn("stem", "features.0.0", "features.0.1")
    bidx = 0
    for (t, c, n_blocks, s, d) in _SSD_MBV2_SETTINGS:
        for _ in range(n_blocks):
            f = f"features.{bidx + 1}"
            blk = f"block{bidx}"
            if t == 1:
                loaded += put_convbn(blk + "/dw", f + ".conv.0.0", f + ".conv.0.1")
                loaded += put_convbn(blk + "/project", f + ".conv.1", f + ".conv.2")
            else:
                loaded += put_convbn(blk + "/expand", f + ".conv.0.0", f + ".conv.0.1")
                loaded += put_convbn(blk + "/dw", f + ".conv.1.0", f + ".conv.1.1")
                loaded += put_convbn(blk + "/project", f + ".conv.2", f + ".conv.3")
            bidx += 1
    loaded += put_convbn("final_conv", "features.18.0", "features.18.1")

    if loaded == 0:
        raise ValueError("no weights matched — is this a MobileNetV2 checkpoint?")
    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = batch_stats
    return out
