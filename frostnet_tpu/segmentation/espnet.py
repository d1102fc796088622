"""ESPNetv2: EESP blocks, EESPNet backbone, PSP head, segmentation model.

Re-implements Semantic_Segmentation/model/backbones/espnetv2.py (EESP
:22-115, DownSampler :117-171, EESPNet :173-310) and model/espnetv2.py
(ESPNetv2Segmentation :25-121, ESPNetv2Seg :123-133) with observed
(FloatFunctional-equivalent) joins at every hierarchical add / concat.
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as fnn
import jax.numpy as jnp

from ..nn import QAdd, QCat, QConvBNAct, QuantMode, QuantStub, avg_pool, dequant
from ..ops.resize import resize_bilinear
from ..quant import QConfig, QNNPACK
from ..quant.qtensor import QTensor


def _shape(x):
    return (x.q if isinstance(x, QTensor) else x).shape


def _relu(x):
    if isinstance(x, QTensor):
        return QTensor(jnp.maximum(x.q, x.zero_point.astype(x.q.dtype)),
                       x.scale, x.zero_point)
    return fnn.relu(x)


def _avg_pool_3x3_s2(x):
    """torch F.avg_pool2d(k=3, s=2, p=1) with count_include_pad=True."""
    if isinstance(x, QTensor):
        m = fnn.avg_pool(x.q.astype(jnp.float32), (3, 3), (2, 2),
                         padding=((1, 1), (1, 1)))
        return QTensor(jnp.clip(jnp.round(m), 0, 255).astype(x.q.dtype),
                       x.scale, x.zero_point)
    return fnn.avg_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))


# receptive-field -> dilation map for a 3x3 kernel (espnetv2.py:48)
_DILATION = {3: 1, 5: 2, 7: 3, 9: 4, 11: 5, 13: 6, 15: 7, 17: 8}


class EESP(fnn.Module):
    """REDUCE -> SPLIT -> TRANSFORM (k dilated dw branches, hierarchically
    fused with observed adds) -> MERGE (espnetv2.py:22-115)."""

    out_channels: int
    strides: int = 1
    k: int = 4
    r_lim: int = 7
    down_method: str = "esp"  # 'avg' when used inside DownSampler
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)
        n = self.out_channels // self.k
        assert n * self.k == self.out_channels, "nOut must divide k"
        ksizes = sorted(min(3 + 2 * i, self.r_lim) if (3 + 2 * i) <= self.r_lim else 3
                        for i in range(self.k))

        proj = QConvBNAct(n, 1, groups=self.k, act="relu", name="proj_1x1", **kw)(
            x, mode, train)

        outputs = []
        prev = None
        for i, ks in enumerate(ksizes):
            d = _DILATION[ks]
            # CDilated: plain dilated dw conv, no BN (espnet_utils.py:153-177)
            b = QConvBNAct(n, 3, strides=self.strides, padding=d, dilation=d,
                           groups=n, act=None, use_bn=False,
                           name=f"spp_dw{i}", **kw)(proj, mode, train)
            if i > 0:
                b = (QAdd(self.qconfig, name=f"quant_add{i}")(b, prev, mode)
                     if self.quantized else b + prev)
            outputs.append(b)
            prev = b

        merged = (QCat(self.qconfig, name="quant_cat")(outputs, mode, axis=-1)
                  if self.quantized else jnp.concatenate(outputs, axis=-1))
        merged = QConvBNAct(self.out_channels, 1, act="relu",
                            name="br_after_cat", **kw)(merged, mode, train)
        expanded = QConvBNAct(self.out_channels, 1, groups=self.k, act=None,
                              name="conv_1x1_exp", **kw)(merged, mode, train)

        if self.strides == 2 and self.down_method == "avg":
            return expanded
        if _shape(expanded) == _shape(x) and self.strides == 1:
            expanded = (QAdd(self.qconfig, name="skip_add")(expanded, x, mode)
                        if self.quantized else expanded + x)
        return _relu(expanded)


class DownSampler(fnn.Module):
    """Parallel avg-pool + strided EESP, concatenated, with raw-image
    reinforcement (espnetv2.py:117-171)."""

    out_channels: int
    k: int = 4
    r_lim: int = 9
    reinf: bool = True
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, input2=None, mode: QuantMode = QuantMode(), train: bool = False):
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)
        in_c = _shape(x)[-1]
        eesp_out = EESP(self.out_channels - in_c, strides=2, k=self.k,
                        r_lim=self.r_lim, down_method="avg", name="eesp", **kw)(
            x, mode, train)
        avg_out = _avg_pool_3x3_s2(x)
        out = (QCat(self.qconfig, name="quant_cat")([avg_out, eesp_out], mode, axis=-1)
               if self.quantized else jnp.concatenate([avg_out, eesp_out], -1))
        if self.reinf:
            reinf0 = QConvBNAct(3, 3, padding=1, act="relu", name="inp_reinf0", **kw)
            reinf1 = QConvBNAct(self.out_channels, 1, act=None, name="inp_reinf1", **kw)
            if input2 is not None:
                w1 = _shape(out)[1]
                while _shape(input2)[1] > w1:
                    input2 = _avg_pool_3x3_s2(input2)
                r = reinf0(input2, mode, train)
                r = reinf1(r, mode, train)
                out = (QAdd(self.qconfig, name="skip_add")(out, r, mode)
                       if self.quantized else out + r)
            else:
                # materialize the (unused) reinforcement params anyway — the
                # reference constructs them for level5_0 too and its forward
                # never feeds input2 there (espnetv2.py:131,285); keeping them
                # preserves state-dict parity.
                r = reinf1(reinf0(jnp.zeros((1, 1, 1, 3)), mode, train), mode, train)
                del r
        return _relu(out)


def eespnet_config(s: float = 1.0):
    """Channel config per scale factor (espnetv2.py:192-207)."""
    base, k0 = 32, 4
    config = [base] * 5
    base_s = int(math.ceil(int(base * s) / k0) * k0)
    config[0] = base if base_s > base else base_s
    for i in range(1, 5):
        config[i] = base_s * (2 ** i)
    config.append(1280 if s in (1.5, 2) else 1024)
    return config


class EESPNet(fnn.Module):
    """ESPNetv2 trunk (espnetv2.py:173-310). ``seg=True`` returns
    (l1, l2, l3, l4) multi-scale features; otherwise the classifier logits."""

    num_classes: int = 1000
    s: float = 1.0
    drop_rate: float = 0.2
    quantized: bool = True
    input_stub: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False,
                 seg: bool = False):
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)
        config = eespnet_config(self.s)
        r_lim = [13, 11, 9, 7, 5]
        reps = [0, 3, 7, 3]

        if self.quantized and self.input_stub:
            x = QuantStub(self.qconfig, name="quant")(x, mode)
        raw = x

        l1 = QConvBNAct(config[0], 3, strides=2, padding=1, act="relu",
                        name="level1", **kw)(x, mode, train)
        l2 = DownSampler(config[1], r_lim=r_lim[0], name="level2_0", **kw)(
            l1, raw, mode, train)
        l3 = DownSampler(config[2], r_lim=r_lim[1], name="level3_0", **kw)(
            l2, raw, mode, train)
        for i in range(reps[1]):
            l3 = EESP(config[2], r_lim=r_lim[2], name=f"level3_blk{i}", **kw)(
                l3, mode, train)
        l4 = DownSampler(config[3], r_lim=r_lim[2], name="level4_0", **kw)(
            l3, raw, mode, train)
        for i in range(reps[2]):
            l4 = EESP(config[3], r_lim=r_lim[3], name=f"level4_blk{i}", **kw)(
                l4, mode, train)
        if seg:
            return l1, l2, l3, l4

        l5 = DownSampler(config[4], r_lim=r_lim[3],
                         name="level5_0", **kw)(l4, None, mode, train)
        for i in range(reps[3]):
            l5 = EESP(config[4], r_lim=r_lim[4], name=f"level5_blk{i}", **kw)(
                l5, mode, train)
        l5 = QConvBNAct(config[4], 3, padding=1, groups=config[4], act="relu",
                        name="level5_dw", **kw)(l5, mode, train)
        l5 = QConvBNAct(config[5], 1, groups=4, act="relu",
                        name="level5_exp", **kw)(l5, mode, train)
        l5 = dequant(l5)
        pooled = jnp.mean(l5, axis=(1, 2))
        pooled = fnn.Dropout(self.drop_rate, deterministic=not train)(pooled)
        w = self.param("classifier_kernel",
                       fnn.initializers.normal(0.001), (config[5], self.num_classes))
        b = self.param("classifier_bias", fnn.initializers.zeros_init(),
                       (self.num_classes,))
        return pooled @ w + b


class PSPModule(fnn.Module):
    """Pyramid pooling: progressive strided avg pools + dw convs, upsampled
    and concatenated (espnet_utils.py:43-60)."""

    out_features: int
    n_stages: int = 4
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)
        h, w = _shape(x)[1:3]
        feats = x
        outs = [x]
        for i in range(self.n_stages):
            feats = _avg_pool_3x3_s2(feats)
            c = _shape(feats)[-1]
            y = QConvBNAct(c, 3, padding=1, groups=c, act=None, use_bn=False,
                           name=f"stage{i}", **kw)(feats, mode, train)
            yf = dequant(y) if isinstance(y, QTensor) else y
            yf = resize_bilinear(yf, (h, w), align_corners=True)
            outs.append(yf)
        outs = [o.dequantize() if isinstance(o, QTensor) else o for o in outs]
        cat = (QCat(self.qconfig, name="quant_cat")(outs, mode, axis=-1)
               if self.quantized else jnp.concatenate(outs, -1))
        return QConvBNAct(self.out_features, 1, act="relu", name="project", **kw)(
            cat, mode, train)


class ESPNetv2Seg(fnn.Module):
    """ESPNetv2 segmentation (model/espnetv2.py:25-133): quant region is the
    trunk + PSP cascade producing a (l1 + classes)-channel map; the float
    tail is a 1x1 conv classifier + final 2x upsample."""

    num_classes: int = 20
    s: float = 1.0
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)
        nc = self.num_classes
        if self.quantized:
            x = QuantStub(self.qconfig, name="quant")(x, mode)
        l1, l2, l3, l4 = EESPNet(s=self.s, input_stub=False, name="net", **kw)(
            x, mode, train, seg=True)

        l3_c = _shape(l3)[-1]
        l4p = QConvBNAct(l3_c, 1, act="relu", name="proj_L4_C", **kw)(l4, mode, train)
        l4u = resize_bilinear(dequant(l4p), _shape(l3)[1:3], align_corners=True)
        if self.quantized:
            l4u = QuantStub(self.qconfig, name="requant_l4")(l4u, mode)
        merged = (QCat(self.qconfig, name="quant_cat1")([l3, l4u], mode, axis=-1)
                  if self.quantized else jnp.concatenate([l3, l4u], -1))
        psp_size = 2 * l3_c
        merged = EESP(psp_size // 2, k=4, r_lim=7, name="pspMod_eesp", **kw)(
            merged, mode, train)
        merged = PSPModule(psp_size // 2, name="pspMod_psp", **kw)(merged, mode, train)
        p3 = QConvBNAct(nc, 1, act="relu", name="project_l3", **kw)(merged, mode, train)
        p3 = QConvBNAct(nc, 1, act="relu", name="act_l3", **kw)(p3, mode, train)
        p3u = resize_bilinear(dequant(p3), _shape(l2)[1:3], align_corners=True)
        if self.quantized:
            p3u = QuantStub(self.qconfig, name="requant_l3")(p3u, mode)
        m2 = (QCat(self.qconfig, name="quant_cat2")([l2, p3u], mode, axis=-1)
              if self.quantized else jnp.concatenate([l2, p3u], -1))
        m2 = QConvBNAct(nc, 1, act="relu", name="project_l2", **kw)(m2, mode, train)
        m2u = resize_bilinear(dequant(m2), _shape(l1)[1:3], align_corners=True)
        if self.quantized:
            m2u = QuantStub(self.qconfig, name="requant_l2")(m2u, mode)
        out = (QCat(self.qconfig, name="quant_cat3")([l1, m2u], mode, axis=-1)
               if self.quantized else jnp.concatenate([l1, m2u], -1))
        out = dequant(out)

        # float tail (model/espnetv2.py:123-133); C(...) is bias-free
        out = QConvBNAct(nc, 1, use_bn=False, use_bias=False, act=None,
                         quantized=False, name="classifier")(out, mode, train)
        h, w = out.shape[1:3]
        return resize_bilinear(out, (h * 2, w * 2), align_corners=True)


# ===========================================================================
# ESPNet (v1)
# ===========================================================================


class ESPBlock(fnn.Module):
    """DilatedParllelResidualBlockB (backbones/espnet.py:58-122): 1x1 reduce,
    five parallel dilated convs (d=1,2,4,8,16, no BN), hierarchical observed
    adds, concat, optional residual, CBR merge."""

    out_channels: int
    reduce_kernel: int = 1      # DownSamplerB uses a strided 3x3 reduce
    reduce_stride: int = 1
    residual: bool = True
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)
        n = self.out_channels // 5
        n1 = self.out_channels - 4 * n
        pad = (self.reduce_kernel - 1) // 2
        r = QConvBNAct(n, self.reduce_kernel, strides=self.reduce_stride,
                       padding=pad, act=None, use_bn=False, name="c1", **kw)(
            x, mode, train)
        branches = []
        for i, d in enumerate((1, 2, 4, 8, 16)):
            c = n1 if i == 0 else n
            branches.append(QConvBNAct(c, 3, padding=d, dilation=d, act=None,
                                       use_bn=False, name=f"d{d}", **kw)(
                r, mode, train))
        adds = [branches[1]]
        for i in range(2, 5):
            adds.append(QAdd(self.qconfig, name=f"quant_add{i}")(adds[-1], branches[i], mode)
                        if self.quantized else adds[-1] + branches[i])
        combine = ([branches[0]] + adds)
        out = (QCat(self.qconfig, name="quant_cat")(combine, mode, axis=-1)
               if self.quantized else jnp.concatenate(
                   [b.dequantize() if isinstance(b, QTensor) else b for b in combine], -1))
        if self.residual and self.reduce_stride == 1:
            out = (QAdd(self.qconfig, name="skip_add")(x, out, mode)
                   if self.quantized else x + out)
        return QConvBNAct(self.out_channels, 1, act="relu", name="cbr", **kw)(
            out, mode, train)


def _input_projection(x, times: int):
    """InputProjectionA (backbones/espnet.py:124-147): repeated avg-pool."""
    for _ in range(times):
        x = _avg_pool_3x3_s2(x)
    return x


class ESPNetSeg(fnn.Module):
    """ESPNet (v1) segmentation (model/espnet.py:22-145): ESPNet-C encoder
    with input reinforcement + light-weight decoder with RUM upsampling.
    Quant region covers everything except the final 1x1 classifier."""

    num_classes: int = 20
    p: int = 2
    q: int = 8
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)
        nc = self.num_classes

        def cat(xs, name):
            return (QCat(self.qconfig, name=name)(xs, mode, axis=-1)
                    if self.quantized else jnp.concatenate(
                        [v.dequantize() if isinstance(v, QTensor) else v for v in xs], -1))

        def up2(t, name):
            tf = dequant(t) if isinstance(t, QTensor) else t
            y = resize_bilinear(tf, (tf.shape[1] * 2, tf.shape[2] * 2),
                                align_corners=True)
            if self.quantized:
                y = QuantStub(self.qconfig, name=name)(y, mode)
            return y

        if self.quantized:
            x = QuantStub(self.qconfig, name="quant")(x, mode)

        # encoder (backbones/espnet.py:149-211)
        out0 = QConvBNAct(16, 3, strides=2, padding=1, act="relu",
                          name="level1", **kw)(x, mode, train)
        inp1 = _input_projection(x, 1)
        inp2 = _input_projection(x, 2)
        out0_cat = QConvBNAct(19, 1, act="relu", name="b1", **kw)(
            cat([out0, inp1], "quant_cat_e1"), mode, train)
        out1_0 = ESPBlock(64, reduce_kernel=3, reduce_stride=2, residual=False,
                          name="level2_0", **kw)(out0_cat, mode, train)
        h = out1_0
        for i in range(self.p):
            h = ESPBlock(64, name=f"level2_blk{i}", **kw)(h, mode, train)
        out1_cat = QConvBNAct(131, 1, act="relu", name="b2", **kw)(
            cat([h, out1_0, inp2], "quant_cat_e2"), mode, train)
        out2_0 = ESPBlock(128, reduce_kernel=3, reduce_stride=2, residual=False,
                          name="level3_0", **kw)(out1_cat, mode, train)
        h = out2_0
        for i in range(self.q):
            h = ESPBlock(128, name=f"level3v1_blk{i}", **kw)(h, mode, train)
        out2_cat = QConvBNAct(256, 1, act="relu", name="b3", **kw)(
            cat([out2_0, h], "quant_cat_e3"), mode, train)

        # decoder (model/espnet.py:67-111)
        enc_cls = QConvBNAct(nc, 1, act=None, use_bn=False, name="enc_classifier",
                             **kw)(out2_cat, mode, train)
        l3 = up2(QConvBNAct(nc, 1, act=None, name="b", **kw)(enc_cls, mode, train),
                 "requant_l3")
        out2_c = QConvBNAct(nc, 1, act="relu", name="up_l3", **kw)(l3, mode, train)
        out1_c = QConvBNAct(nc, 1, act=None, use_bn=False, name="level3_C", **kw)(
            out1_cat, mode, train)
        l2 = up2(ESPBlock(nc, residual=False, name="combine_l2_l3", **kw)(
            cat([out1_c, out2_c], "quant_cat_d1"), mode, train), "requant_l2")
        comb = QConvBNAct(nc, 1, act="relu", name="up_l2", **kw)(l2, mode, train)
        feat = QConvBNAct(nc, 3, padding=1, act="relu", name="conv", **kw)(
            cat([comb, out0_cat], "quant_cat_d2"), mode, train)
        featf = dequant(feat)
        feat = resize_bilinear(featf, (featf.shape[1] * 2, featf.shape[2] * 2),
                               align_corners=True)

        # float tail classifier (model/espnet.py:130-139)
        return QConvBNAct(nc, 1, act=None, use_bn=False, use_bias=False,
                          quantized=False, name="classifier")(feat, mode, train)
