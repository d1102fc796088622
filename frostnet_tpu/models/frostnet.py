"""FrostNet — the quantization-friendly mobile CNN family, TPU-native.

Re-implements the architecture of reference frostnet.py (CascadePreEx/"Frost"
bottleneck :81-145, stage tables :150-269, model registrations :354-451) as
functional flax modules in NHWC with explicit quantization modes. The stage
tables below are the published architecture spec (kernel, channels, expand
ratio, reduce factor, stride per block).

Design notes vs the reference:
  * quantization is a mode argument, not a separate registered model — the
    same parameters serve FP32 warm-up, QAT and frozen INT8 (SURVEY.md §7);
  * the reference's ``dilated`` flag stores a dilation the blocks never apply
    (frostnet.py:116-118 pass dilation=1); here ``output_stride=16|32``
    implements the intended dilated trunk for dense prediction;
  * the classifier (avgpool -> dropout -> 1x1 conv) sits inside the quant
    region, as in the reference (frostnet.py:295-306).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..nn import (
    QAdd,
    QCat,
    QConvBNAct,
    QuantMode,
    QuantStub,
    dequant,
    global_avg_pool,
)
from ..quant import QConfig, QNNPACK
from ..quant.qtensor import QTensor


def make_divisible(v, divisor: int = 8, min_value: Optional[int] = None) -> int:
    """Channel rounding from the public TF mobilenet recipe (used at
    reference frostnet.py:62-79)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# Stage tables: (kernel, channels, expand_ratio, reduce_factor, stride)
# per block, grouped into the 5 stages of reference frostnet.py:156-269.
FROSTNET_SETTINGS = {
    "large": (
        [(3, 16, 1, 1, 1), (3, 24, 6, 4, 2), (3, 24, 3, 4, 1)],
        [(5, 40, 6, 4, 2), (3, 40, 3, 4, 1)],
        [
            (5, 80, 6, 4, 2), (5, 80, 3, 4, 1), (5, 80, 3, 4, 1),
            (5, 96, 6, 4, 1), (5, 96, 3, 4, 1), (3, 96, 3, 4, 1), (3, 96, 3, 4, 1),
        ],
        [
            (5, 192, 6, 2, 2), (5, 192, 6, 4, 1), (5, 192, 6, 4, 1),
            (5, 192, 3, 4, 1), (5, 192, 3, 4, 1),
        ],
        [(5, 320, 6, 2, 1)],
    ),
    "base": (
        [(3, 16, 1, 1, 1), (5, 24, 6, 4, 2), (3, 24, 3, 4, 1)],
        [(5, 40, 3, 4, 2), (5, 40, 3, 4, 1)],
        [
            (5, 80, 3, 4, 2), (3, 80, 3, 4, 1),
            (5, 96, 3, 2, 1), (3, 96, 3, 4, 1), (5, 96, 3, 4, 1), (5, 96, 3, 4, 1),
        ],
        [(5, 192, 6, 2, 2), (5, 192, 3, 2, 1), (5, 192, 3, 2, 1), (5, 192, 3, 2, 1)],
        [(5, 320, 6, 2, 1)],
    ),
    # "tiny" is NOT a reference variant: a 5-block config for fast compile in
    # smoke tests / multi-chip dry-runs. Same block machinery, tiny depth.
    "tiny": (
        [(3, 16, 1, 1, 1)],
        [(5, 24, 3, 4, 2)],
        [(5, 40, 3, 4, 2)],
        [(5, 96, 3, 2, 2)],
        [(5, 160, 6, 2, 1)],
    ),
    "small": (
        [(3, 16, 1, 1, 1), (5, 24, 3, 4, 2), (3, 24, 3, 4, 1)],
        [(5, 40, 3, 4, 2)],
        [
            (5, 80, 3, 4, 2), (5, 80, 3, 4, 1), (3, 80, 3, 4, 1),
            (5, 96, 3, 2, 1), (5, 96, 3, 4, 1), (5, 96, 3, 4, 1),
        ],
        [(5, 192, 6, 4, 2), (5, 192, 6, 4, 1), (5, 192, 6, 4, 1)],
        [(5, 320, 6, 2, 1)],
    ),
}


class CascadePreExBottleneck(fnn.Module):
    """The Frost block (reference frostnet.py:81-145).

    CAS type: squeeze 1x1 conv -> concat with input ("cascade pre-excitation")
    -> expand 1x1 -> depthwise kxk -> linear 1x1 reduce (+ residual when
    shape-preserving). Falls back to plain MB (inverted residual) when the
    squeezed width would be < 8 channels.
    """

    out_channels: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    expand_ratio: int = 6
    reduce_factor: int = 4
    block_type: str = "CAS"
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32
    # INT8 serving: run the whole block as one fused Pallas kernel
    # (ops/pallas_frost_block) — bit-identical to the unfused path.
    fuse_int8: bool = False

    def _fused_int8(self, x, mode, train, block_type, r_channels, residual):
        """Gather the children's frozen INT8 operands and run the fused
        Pallas block kernel. Children are invoked with the same names as the
        unfused path, so the variable tree is identical."""
        from ..ops.pallas_frost_block import (
            FrostBlockSpec,
            build_params,
            frost_block_int8,
            pick_batch_tile,
        )

        b, h, w, cin = x.q.shape
        has_expand = self.expand_ratio != 1
        has_squeeze = has_expand and block_type == "CAS"
        n_channels = (r_channels + cin) if has_squeeze else cin
        e = n_channels * self.expand_ratio if has_expand else cin
        spec = FrostBlockSpec(
            h=h, w=w, cin=cin, cout=self.out_channels,
            kernel=self.kernel_size, stride=self.strides,
            has_squeeze=has_squeeze, has_expand=has_expand,
            c_sq=r_channels if has_squeeze else 0, c_e=e, residual=residual,
            act_qmax=self.qconfig.activation.qmax)
        bt = pick_batch_tile(spec, b)
        if bt is None:
            return None  # does not fit VMEM — caller falls back to unfused

        conv_kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)

        def dummy(c):
            # flax validates stored-param shapes against the call input, and
            # the params-only call never touches the data — so hand each
            # child a zero-cost stand-in with its true channel count.
            return QTensor(jnp.zeros((1, 1, 1, c), jnp.uint8), x.scale, x.zero_point)

        sq = cat = ex = add = None
        in_scale, in_zp = x.scale, x.zero_point
        if has_squeeze:
            qw, ws, bf, os_, oz = QConvBNAct(
                r_channels, 1, act="relu", name="squeeze_conv", **conv_kw
            )(x, mode, train, int8_params_only=True)
            sq = (qw, x.scale * ws, bf, os_, oz)
            cat = QCat(self.qconfig, name="quant_cat")([x], mode, qparams_only=True)
            in_scale, in_zp = cat
        if has_expand:
            qw, ws, bf, os_, oz = QConvBNAct(
                e, 1, act="relu", name="conv1", **conv_kw
            )(dummy(n_channels), mode, train, int8_params_only=True)
            ex = (qw, in_scale * ws, bf, os_, oz)
            in_scale, in_zp = os_, oz
        pad = self.dilation * (self.kernel_size - 1) // 2
        qw, ws, bf, os_, oz = QConvBNAct(
            e, self.kernel_size, strides=self.strides, padding=pad,
            dilation=self.dilation, groups=e, act="relu", name="conv2", **conv_kw
        )(dummy(e), mode, train, int8_params_only=True)
        dw = (qw, in_scale * ws, bf, os_, oz)
        in_scale, in_zp = os_, oz
        qw, ws, bf, os_, oz = QConvBNAct(
            self.out_channels, 1, act=None, name="reduce_conv", **conv_kw
        )(dummy(e), mode, train, int8_params_only=True)
        rd = (qw, in_scale * ws, bf, os_, oz)
        out_scale, out_zp = os_, oz
        if residual:
            add = QAdd(self.qconfig, name="skip_add")(x, x, mode, qparams_only=True)
            out_scale, out_zp = add

        params = build_params(spec, x_scale=x.scale, x_zp=x.zero_point,
                              sq=sq, cat=cat, ex=ex, dw=dw, rd=rd, add=add)
        out_q = frost_block_int8(
            x.q, params, spec, bt=bt,
            interpret=jax.default_backend() != "tpu")
        return QTensor(out_q, out_scale, out_zp)

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        in_channels = (x.q if isinstance(x, QTensor) else x).shape[-1]
        block_type = self.block_type
        if in_channels // self.reduce_factor < 8:
            block_type = "MB"
        r_channels = make_divisible(in_channels // self.reduce_factor)
        residual = self.strides == 1 and in_channels == self.out_channels
        conv_kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)

        if (self.fuse_int8 and mode.int8 and self.quantized
                and self.dilation == 1 and isinstance(x, QTensor)):
            out = self._fused_int8(x, mode, train, block_type, r_channels, residual)
            if out is not None:
                return out

        out = x
        if self.expand_ratio == 1:
            n_channels = in_channels
        else:
            if block_type == "CAS":
                squeezed = QConvBNAct(
                    r_channels, 1, act="relu", name="squeeze_conv", **conv_kw
                )(x, mode, train)
                out = QCat(self.qconfig, name="quant_cat")(
                    [squeezed, x], mode
                ) if self.quantized else jnp.concatenate([squeezed, x], axis=-1)
                n_channels = r_channels + in_channels
            else:
                n_channels = in_channels
            out = QConvBNAct(
                n_channels * self.expand_ratio, 1, act="relu", name="conv1", **conv_kw
            )(out, mode, train)

        e = n_channels * self.expand_ratio
        pad = self.dilation * (self.kernel_size - 1) // 2
        out = QConvBNAct(
            e,
            self.kernel_size,
            strides=self.strides,
            padding=pad,
            dilation=self.dilation,
            groups=e,
            act="relu",
            name="conv2",
            **conv_kw,
        )(out, mode, train)
        out = QConvBNAct(self.out_channels, 1, act=None, name="reduce_conv", **conv_kw)(
            out, mode, train
        )

        if residual:
            if self.quantized:
                out = QAdd(self.qconfig, name="skip_add")(x, out, mode)
            else:
                out = x + out
        return out


class FrostNet(fnn.Module):
    """FrostNet classifier (reference frostnet.py:150-351).

    ``output_stride=32`` is the classification trunk; 16 or 8 dilates the
    later stages for dense-prediction backbones.
    """

    num_classes: int = 1000
    mode: str = "large"
    width_mult: float = 1.0
    quantized: bool = True
    drop_rate: float = 0.2
    output_stride: int = 32
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32
    # INT8 serving: fuse each Frost block into one Pallas kernel where it
    # fits VMEM (ops/pallas_frost_block; bit-identical to the unfused path)
    fuse_int8: bool = False

    def _stage(self, settings, width_mult, dilation, conv_kw, name):
        blocks = []
        for i, (k, c, e, r, s) in enumerate(settings):
            out_c = make_divisible(int(c * width_mult))
            stride = s if dilation == 1 else 1
            blocks.append(
                CascadePreExBottleneck(
                    out_channels=out_c,
                    kernel_size=k,
                    strides=stride,
                    dilation=dilation,
                    expand_ratio=e,
                    reduce_factor=r,
                    fuse_int8=self.fuse_int8,
                    name=f"{name}_{i}",
                    **conv_kw,
                )
            )
        return blocks

    @fnn.compact
    def __call__(
        self,
        x,
        mode: QuantMode = QuantMode(),
        train: bool = False,
        features_only: bool = False,
    ):
        settings = FROSTNET_SETTINGS[self.mode]
        conv_kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)
        stem_c = make_divisible(int(32 * min(1.0, self.width_mult)))

        if self.quantized:
            x = QuantStub(self.qconfig, name="quant")(x, mode)

        x = QConvBNAct(stem_c, 3, strides=2, padding=1, act="relu", name="conv1", **conv_kw)(
            x, mode, train
        )

        d4 = 2 if self.output_stride <= 16 else 1
        d5 = (4 if self.output_stride <= 8 else 2) if self.output_stride <= 16 else 1

        feats = []
        for si, stage_settings in enumerate(settings):
            dilation = {3: d4, 4: d5}.get(si, 1)
            for blk in self._stage(
                stage_settings, self.width_mult, dilation, conv_kw, f"layer{si + 1}"
            ):
                x = blk(x, mode, train)
            feats.append(x)

        if features_only:
            # multi-scale features for detection/segmentation heads
            # (mirrors frostnet_features.py:342-352 returning x1,x2,x3,x5)
            return [dequant(f) for f in (feats[0], feats[1], feats[2], feats[4])]

        x = QConvBNAct(1280, 1, act="relu", name="last_layer", **conv_kw)(x, mode, train)
        x = global_avg_pool(x, keepdims=True)
        if not isinstance(x, QTensor):
            x = fnn.Dropout(rate=self.drop_rate, deterministic=not train)(x)
        x = QConvBNAct(
            self.num_classes, 1, use_bn=False, use_bias=True, act=None,
            name="classifier", **conv_kw,
        )(x, mode, train)
        if self.quantized:
            x = dequant(x)
        return x.reshape(x.shape[0], x.shape[-1])


# ---------------------------------------------------------------------------
# Model registry: frostnet_{quant_}{large|base|small}_{width} like the timm
# registrations at reference frostnet.py:354-451.
# ---------------------------------------------------------------------------

_WIDTHS = {"0_35": 0.35, "0_5": 0.5, "0_75": 0.75, "1_0": 1.0, "1_25": 1.25}


def _factories():
    reg = {}
    for m in ("large", "base", "small"):
        for wname, w in _WIDTHS.items():
            for quant in (True, False):
                name = f"frostnet_{'quant_' if quant else ''}{m}_{wname}"

                def make(mode=m, width=w, q=quant, **kwargs):
                    kwargs.setdefault("num_classes", 1000)
                    return FrostNet(mode=mode, width_mult=width, quantized=q, **kwargs)

                reg[name] = make
    return reg


FROSTNET_MODELS = _factories()
