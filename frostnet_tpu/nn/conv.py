"""QConvBNAct — the fused conv+BN(+act) block with optional quantization.

This one module covers the reference's whole fusable-layer vocabulary
(ConvBNReLU/ConvBN/ConvReLU at frostnet.py:14-60, the _ConvBNReLU family at
Semantic_Segmentation/model/layers/basic.py:11-229) across all four phases:

  FP32      : conv -> BN -> act                   (StatAssist warm-up)
  QAT train : the torch.nn.intrinsic.qat.ConvBn2d recipe —
              sf = gamma / sqrt(running_var + eps)
              y  = conv(x, fake_quant(W * sf)) / sf
              y  = BN_batchstats(y); act; fake_quant(act-output)
  QAT eval  : running-stat BN folded into (W, b), weight fake-quant on the
              folded weight, activation fake-quant on the output — identical
              numerics to torch's fused eval path.
  INT8      : true integer conv (int32 accumulation) with the folded and
              quantized weights; float epilogue (bias+act) then requantize to
              the output observer's grid. Heavy compute stays integer for the
              MXU; the epilogue is XLA-fused.

No ``fuse_modules``/``prepare_qat`` graph rewriting exists — phases differ
only in the ``QuantMode``/``train`` arguments, and XLA recompiles/folds per
phase.

Layout: NHWC activations, HWIO weights (TPU-native). BN matches torch
semantics bit-for-bit: biased batch variance for normalization, unbiased for
the running estimate, momentum 0.1.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as fnn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..quant import (
    QConfig,
    QNNPACK,
    bn_scale_factor,
    calculate_qparams,
    fold_bn,
    init_observer,
    quantize,
)
from ..quant.qtensor import QTensor
from .mode import QuantMode
from .quant_ops import apply_observer

kaiming_normal_fan_out = fnn.initializers.variance_scaling(2.0, "fan_out", "normal")

# Fused Pallas path for dense 3x3/s1 INT8 convs (ops/pallas_int8_conv):
# bit-exact vs the XLA composition but measured SLOWER whole-net on v5e
# (GAN INT8 16.0 -> 18.4 ms/batch, 0.87x — see ops/pallas_int8_conv.py), so
# the default (None = auto) is currently OFF everywhere. Force with
# set_pallas_int8_dense(True/False) — forced-on off-TPU runs the kernel in
# interpret mode (exactness tests).
_PALLAS_INT8_DENSE: Optional[bool] = None


def set_pallas_int8_dense(enabled: Optional[bool]) -> None:
    global _PALLAS_INT8_DENSE
    _PALLAS_INT8_DENSE = enabled


def _pallas_int8_dense_on() -> bool:
    if _PALLAS_INT8_DENSE is None:
        return False
    return _PALLAS_INT8_DENSE


# Space-to-depth route for lane-starved FLOAT convs (ops/s2d_conv): re-blocks
# stride-1 small-Cout convs (GAN FP tails, Cout<=8 after the plan() gate) so
# the MXU's 128 output lanes aren't ~97% padding. Equal to lax.conv up to f32
# reassociation (bit-equal on integer data — tests/test_s2d_conv.py), so it
# never touches the bit-stable INT8 integer path. Toggle for whole-net A/Bs.
_S2D_FLOAT_CONV: bool = True


def set_s2d_float_conv(enabled: bool) -> None:
    global _S2D_FLOAT_CONV
    _S2D_FLOAT_CONV = enabled


# Im2col route for dense k>1 INT8 convs: build int8 patches from k*k strided
# slices (a pure copy fusion) and run ONE dot_general contracting k*k*Cin —
# the requant epilogue then fuses into the dot like the 1x1 path, so the s32
# accumulator never round-trips HBM. Profitable when the patch traffic
# (2 * k^2 * Cin bytes/out-pixel, write+read) undercuts the s32 accumulator
# traffic it removes (8 * Cout bytes/out-pixel): stems and other
# channel-expanding convs. None = auto (modeled-2x-win gate, like
# ops/s2d_conv.plan); True/False force for whole-net A/Bs.
_INT8_DENSE_IM2COL: Optional[bool] = None


def set_int8_dense_im2col(enabled: Optional[bool]) -> None:
    global _INT8_DENSE_IM2COL
    _INT8_DENSE_IM2COL = enabled


# Required modeled-win margin for the auto gate. Patch traffic is
# 2*k^2*Cin bytes/out-pixel vs the 8*Cout it removes; margin m engages when
# m * (2*k^2*Cin) <= 8*Cout. m=2.0 (default) covers 3x3 stems — validated
# on-chip round 5 (cls bs128 88k -> 112k img/s). m=1.0 additionally covers
# 7x7x3 stems (GAN/resnet: 147 <= 256) — A/B'able via the scripts'
# --im2col-margin flag.
_IM2COL_GATE_MARGIN: float = 2.0


def set_im2col_gate_margin(margin: float) -> None:
    global _IM2COL_GATE_MARGIN
    _IM2COL_GATE_MARGIN = margin


def _im2col_auto_profitable(kh: int, kw: int, cin: int, cout: int) -> bool:
    return _IM2COL_GATE_MARGIN * kh * kw * cin <= 4 * cout


# Shifted multiply-add route for FLOAT depthwise convs (the float twin of the
# INT8 depthwise formulation below). Motivation: the round-4 HLO study found
# lax.conv's depthwise lowering moves ~11x more bytes than k*k shifted MAs at
# dense-prediction shapes, and the QAT train step is HBM-bound with conv
# fusions running at 550 GB/s vs loop fusions at 866 (runs/
# profile_r04_summary.txt). Accumulates in f32, equal to lax.conv up to f32
# reassociation (tests/test_dw_ma_conv.py pins it bit-equal on integer data).
# ROUND-5 WHOLE-STEP A/B: REJECTED — 1,226 vs 3,016 img/s on the driver
# bench (runs/dw_ma_ab_r05.txt): in the TRAINING graph the MA form's f32
# accumulator chain and its 9-residual autodiff backward cost far more than
# the conv lowering it replaces. Stays OFF; flag kept for other hardware.
_DW_MA_FLOAT_CONV: bool = False


def set_dw_ma_float_conv(enabled: bool) -> None:
    global _DW_MA_FLOAT_CONV
    _DW_MA_FLOAT_CONV = enabled


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def apply_activation(x, act: Optional[str]):
    if act is None:
        return x
    if act == "relu":
        return fnn.relu(x)
    if act == "relu6":
        return jnp.clip(x, 0.0, 6.0)
    if act == "hswish":
        return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0
    if act == "hsigmoid":
        return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0
    if act == "tanh":
        return jnp.tanh(x)
    if act == "sigmoid":
        return jax.nn.sigmoid(x)
    raise ValueError(f"unknown activation {act!r}")


class QConvBNAct(fnn.Module):
    """Conv2d + optional BatchNorm + optional activation, quant-aware.

    Args mirror the reference blocks: ``features`` out-channels, square or
    rect ``kernel_size``, torch-style integer ``padding``, ``groups`` for
    depthwise. ``use_bn=False`` gives ConvReLU/plain conv. ``quantized=False``
    pins the block to float even in QAT mode (FP tails, e.g. segmentation
    project heads — model/mobilenetv3.py:49-67 pattern).
    """

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int], str] = 0
    dilation: Union[int, Sequence[int]] = 1
    groups: int = 1
    use_bn: bool = True
    use_bias: bool = False
    act: Optional[str] = "relu"
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    bn_momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    bn_eps: float = 1e-5
    dtype: Any = jnp.float32
    precision: Any = None
    # GAN networks use normal(0, 0.02) / BN-gamma normal(1, 0.02) like the
    # reference's init_net (Style_Transfer/models/networks.py:159-209)
    kernel_init: Any = kaiming_normal_fan_out
    bn_scale_init: Any = fnn.initializers.ones_init()

    def _conv(self, x, w, strides, padding, dilation):
        y = self._conv_s2d(x, w, strides, padding, dilation)
        if y is None:
            y = self._conv_dw_ma(x, w, strides, padding, dilation)
        if y is None:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                w.astype(self.dtype),
                window_strides=strides,
                padding=padding,
                rhs_dilation=dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
                precision=self.precision,
            )
        # named for selective rematerialization: remat='conv_outs' saves
        # these and recomputes only the elementwise BN/act/fake-quant chains
        # in the backward (train/state.make_train_step)
        return checkpoint_name(y, "conv_out")

    def _conv_s2d(self, x, w, strides, padding, dilation):
        """Space-to-depth route for lane-starved float convs (GAN tails).

        A stride-1 kxk conv with tiny Cout runs the MXU nearly empty
        (Cout of 128 output lanes) — measured 4.6 ms/step on the pix2pix
        7x7 64->3 tail alone, 29% of the INT8 forward. ops/s2d_conv
        re-blocks it into a kb x kb conv over b^2*Cin -> b^2*Cout channels
        (equal up to f32 reassociation; ~5x faster modeled). Returns None
        when the shape doesn't fit, and the caller keeps the native conv.
        """
        if not _S2D_FLOAT_CONV:
            return None
        if strides != (1, 1) or dilation != (1, 1) or self.groups != 1:
            return None
        if isinstance(padding, str):
            return None
        kh, kw = w.shape[0], w.shape[1]
        if kh != kw:
            return None
        from ..ops import s2d_conv as _s2d

        (ph, ph_r), (pw, pw_r) = padding
        if ph != ph_r or pw != pw_r:  # the canvas math assumes symmetry
            return None
        bsz = 4
        _, h, w_sp, _ = x.shape
        k = kh
        half = k // 2
        h_out = h + 2 * ph - k + 1
        w_out = w_sp + 2 * pw - k + 1
        if h_out <= 0 or w_out <= 0:
            return None

        # Zero-pad the input into a b-divisible canvas, run the SAME-conv
        # s2d form on it, and slice the window matching the requested
        # padding: canvas[i] = x[i - p], so same-conv output index
        # i = o + half recovers y[o] = sum_dy x[o - p + dy] w[dy].
        er_h = (-(h + 2 * ph)) % bsz
        er_w = (-(w_sp + 2 * pw)) % bsz
        hc = h + 2 * ph + er_h
        wc = w_sp + 2 * pw + er_w
        if _s2d.plan(k, bsz, hc, wc, self.features) is None:
            return None
        pb = -(-half // bsz)
        kb = 2 * pb + 1
        xc = jnp.pad(x.astype(self.dtype),
                     ((0, 0), (ph, ph + er_h), (pw, pw + er_w), (0, 0)))
        yc = _s2d.conv_same_s2d(xc, w.astype(self.dtype), bsz, pb, kb,
                                precision=self.precision)
        return yc[:, half:half + h_out, half:half + w_out, :]

    def _conv_dw_ma(self, x, w, strides, padding, dilation):
        """Float depthwise conv as k*k shifted multiply-adds (flag-gated).

        Same formulation (and slice arithmetic) as the INT8 depthwise branch
        below; group-major channel-multiplier ordering matches lax.conv
        (output channel oc reads input channel oc // mult). Returns None when
        the shape isn't depthwise or the route is off; the caller then keeps
        lax.conv.
        """
        if not _DW_MA_FLOAT_CONV:
            return None
        if isinstance(padding, str):
            return None
        in_features = x.shape[-1]
        if not (self.groups > 1 and self.groups == in_features
                and w.shape[2] == 1):
            return None
        kh, kw = w.shape[0], w.shape[1]
        if kh == 1 and kw == 1:
            return None
        (ph_lo, ph_hi), (pw_lo, pw_hi) = padding
        xd = x.astype(self.dtype)
        if ph_lo or ph_hi or pw_lo or pw_hi:
            xd = jnp.pad(xd, ((0, 0), (ph_lo, ph_hi), (pw_lo, pw_hi), (0, 0)))
        hp, wp = xd.shape[1], xd.shape[2]
        dh, dw_ = dilation
        sh, sw = strides
        ho = (hp - dh * (kh - 1) - 1) // sh + 1
        wo = (wp - dw_ * (kw - 1) - 1) // sw + 1
        if ho <= 0 or wo <= 0:
            return None
        mult = self.features // self.groups
        acc = jnp.zeros((xd.shape[0], ho, wo, self.features), jnp.float32)
        for dy in range(kh):
            for dx in range(kw):
                tap = w[dy, dx, 0].astype(self.dtype).astype(jnp.float32)
                sl = xd[:, dy * dh:dy * dh + (ho - 1) * sh + 1:sh,
                        dx * dw_:dx * dw_ + (wo - 1) * sw + 1:sw, :]
                sl = sl.astype(jnp.float32)
                if mult > 1:
                    sl = jnp.repeat(sl, mult, axis=3)
                acc = acc + tap * sl
        return acc.astype(self.dtype)

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False,
                 int8_params_only: bool = False):
        kh, kw = _pair(self.kernel_size)
        strides = _pair(self.strides)
        dilation = _pair(self.dilation)
        if isinstance(self.padding, str):
            padding = self.padding
        else:
            ph, pw = _pair(self.padding)
            padding = ((ph, ph), (pw, pw))

        in_features = (x.q if isinstance(x, QTensor) else x).shape[-1]
        w = self.param(
            "kernel",
            self.kernel_init,
            (kh, kw, in_features // self.groups, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", fnn.initializers.zeros_init(), (self.features,), jnp.float32)
            if self.use_bias
            else None
        )

        if self.use_bn:
            gamma = self.param("scale", self.bn_scale_init, (self.features,), jnp.float32)
            beta = self.param("bias_bn", fnn.initializers.zeros_init(), (self.features,), jnp.float32)
            ra_mean = self.variable(
                "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
            )
            ra_var = self.variable(
                "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
            )

        q_on = self.quantized and (mode.fake_quant or mode.observe or mode.int8)
        wspec = self.qconfig.weight
        aspec = self.qconfig.activation
        w_ch_axis = -1 if wspec.per_channel else None
        if self.quantized:
            # observer state exists for every quantized block in every mode,
            # so the 'quant' collection has one stable structure from FP32
            # warm-up through INT8 freeze (no prepare_qat graph growth).
            w_obs = self.variable(
                "quant", "w_obs",
                lambda: init_observer(self.features if wspec.per_channel else None))
            act_obs = self.variable("quant", "act_obs", lambda: init_observer(None))

        if int8_params_only:
            # Fused-block path (ops/pallas_frost_block): the parent block
            # gathers each conv's frozen INT8 operands instead of running it.
            # Declares exactly the variables of the normal INT8 branch, so
            # the pytree structure stays stable.
            assert q_on and mode.int8, "int8_params_only requires INT8 mode"
            if self.use_bn:
                wf, bf = fold_bn(w, bias, gamma, beta, ra_mean.value,
                                 ra_var.value, self.bn_eps)
            else:
                wf = w
                bf = bias if bias is not None else jnp.zeros((self.features,), jnp.float32)
            w_scale, w_zp = calculate_qparams(w_obs.value, wspec)
            qw = quantize(wf, w_scale, w_zp, wspec, channel_axis=w_ch_axis)
            out_scale, out_zp = calculate_qparams(act_obs.value, aspec)
            return qw, w_scale, bf, out_scale, out_zp

        # ------------------------------------------------------------------
        # INT8 frozen inference
        # ------------------------------------------------------------------
        if q_on and mode.int8:
            assert isinstance(x, QTensor), "INT8 mode needs a QTensor input (QuantStub upstream)"
            if self.use_bn:
                wf, bf = fold_bn(w, bias, gamma, beta, ra_mean.value, ra_var.value, self.bn_eps)
            else:
                wf = w
                bf = bias if bias is not None else jnp.zeros((self.features,), jnp.float32)
            w_scale, w_zp = calculate_qparams(w_obs.value, wspec)
            qw = quantize(wf, w_scale, w_zp, wspec, channel_axis=w_ch_axis)

            # True int8 x int8 -> int32 compute. The uint8 activation is
            # shifted by 128 to fit int8, and out-of-image taps see THE ZERO
            # POINT (qnnpack pad semantics: padding contributes exactly zero),
            # so the zero-point correction collapses to a per-out-channel
            # constant:  acc_true = acc_padded - (zp-128) * sum_taps(qw)[oc].
            # Bit-identical integer math in all three formulations below
            # (int32 addition is exact under reordering); reference requant
            # semantics per torch.ao.nn.quantized.Conv2d / qnnpack.
            #
            # The FORM matters enormously on TPU (round-4 HLO study,
            # scripts/diag_int8_fusion.py): `lax.conv` with
            # preferred_element_type=s32 cannot fuse its requant epilogue, so
            # the s32 accumulator and a layout copy of it hit HBM (8 B/elem
            # extra) — at dense-prediction resolutions that DOUBLED seg
            # serving bytes (952 -> 1709 MB/img, VERDICT r3). Measured
            # alternatives at (4,256,512,64):
            #   * 1x1 conv as a 4-D dot_general: epilogue fuses into the dot,
            #     1208 -> 134 MB accessed (9x).
            #   * depthwise conv as k*k shifted multiply-adds: ONE loop
            #     fusion, no space-to-batch machinery, 1608 -> 134 MB (12x;
            #     also 11x less than the bf16 dw conv at this size).
            # Dense k>1 convs (stems, GAN blocks, atrous heads) keep the conv
            # formulation — the MXU needs materialized operands there.
            x8 = (x.q.astype(jnp.int32) - 128).astype(jnp.int8)
            zp_eff = (x.zero_point - 128).astype(jnp.int32)
            (ph_lo, ph_hi), (pw_lo, pw_hi) = padding
            depthwise = self.groups > 1 and self.groups == in_features \
                and qw.shape[2] == 1
            if ph_lo or ph_hi or pw_lo or pw_hi:
                x8p = jax.lax.pad(
                    x8, zp_eff.astype(jnp.int8),
                    ((0, 0, 0), (ph_lo, ph_hi, 0), (pw_lo, pw_hi, 0), (0, 0, 0)))
            else:
                x8p = x8
            if kh == 1 and kw == 1 and self.groups == 1:
                if strides != (1, 1):
                    x8p = x8p[:, ::strides[0], ::strides[1], :]
                acc = jax.lax.dot_general(
                    x8p, qw[0, 0], (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            elif depthwise:
                hp, wp = x8p.shape[1], x8p.shape[2]
                dh, dw_ = dilation
                sh, sw = strides
                ho = (hp - dh * (kh - 1) - 1) // sh + 1
                wo = (wp - dw_ * (kw - 1) - 1) // sw + 1
                # channel multiplier m: lax group-major ordering means output
                # channel oc reads input channel oc // m
                mult = self.features // self.groups
                acc = jnp.zeros((x8p.shape[0], ho, wo, self.features), jnp.int32)
                for dy in range(kh):
                    for dx in range(kw):
                        tap = qw[dy, dx, 0].astype(jnp.int32)
                        sl = x8p[:, dy * dh:dy * dh + (ho - 1) * sh + 1:sh,
                                 dx * dw_:dx * dw_ + (wo - 1) * sw + 1:sw, :]
                        sl = sl.astype(jnp.int32)
                        if mult > 1:
                            sl = jnp.repeat(sl, mult, axis=3)
                        acc = acc + tap * sl
            elif self.groups == 1 and (
                    _INT8_DENSE_IM2COL if _INT8_DENSE_IM2COL is not None
                    else _im2col_auto_profitable(kh, kw, in_features,
                                                 self.features)):
                # Dense k>1 as im2col + ONE dot_general: k*k strided slices
                # concatenated channel-wise (a copy fusion; int8 bytes), then
                # a single dot contracting k*k*Cin whose requant epilogue
                # FUSES like the 1x1 path — no s32 accumulator round trip.
                # Engaged (auto) only where the modeled byte saving is >=2x:
                # stems / channel-expanding convs (k^2*Cin <= 2*Cout).
                hp, wp = x8p.shape[1], x8p.shape[2]
                dh, dw_ = dilation
                sh, sw = strides
                ho = (hp - dh * (kh - 1) - 1) // sh + 1
                wo = (wp - dw_ * (kw - 1) - 1) // sw + 1
                cols = []
                for dy in range(kh):
                    for dx in range(kw):
                        cols.append(
                            x8p[:, dy * dh:dy * dh + (ho - 1) * sh + 1:sh,
                                dx * dw_:dx * dw_ + (wo - 1) * sw + 1:sw, :])
                patches = jnp.concatenate(cols, axis=-1)
                # qw is (kh, kw, Cin, Cout); C-order reshape gives rows
                # ordered (dy, dx, cin) — exactly the concat order above
                wmat = qw.reshape(kh * kw * in_features, self.features)
                acc = jax.lax.dot_general(
                    patches, wmat, (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            else:
                # Dense k>1: prefer the fused Pallas kernel (conv + requant
                # epilogue in VMEM, HBM sees int8 in / uint8 out) when the
                # shape fits; the s32 lax.conv epilogue cannot fuse on TPU
                # (measured: GAN resnet convs round-trip the s32 accumulator,
                # scripts/profile_gan_int8.py).
                from ..ops import pallas_int8_conv as _pic
                th = (_pic.usable(kh, kw, strides, dilation, self.groups,
                                  self.act, x8p.shape, self.features)
                      if _pallas_int8_dense_on()
                      and aspec.storage_dtype == jnp.uint8 else None)
                if th is not None:
                    w_sum = jnp.sum(qw.astype(jnp.int32), axis=(0, 1, 2))
                    w_scale_v = jnp.broadcast_to(
                        jnp.asarray(w_scale, jnp.float32).reshape(-1),
                        (self.features,))
                    out_scale, out_zp = calculate_qparams(act_obs.value, aspec)
                    q = _pic.conv3x3_s1_int8(
                        x8p, qw, x.scale * w_scale_v, bf, zp_eff * w_sum,
                        out_scale, out_zp, th=th, relu=(self.act == "relu"),
                        qmin=int(aspec.qmin), qmax=int(aspec.qmax),
                        interpret=jax.default_backend() != "tpu")
                    return QTensor(q, out_scale, out_zp)
                acc = jax.lax.conv_general_dilated(
                    x8p, qw, strides, ((0, 0), (0, 0)), rhs_dilation=dilation,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=self.groups,
                    preferred_element_type=jnp.int32,
                )
            w_sum = jnp.sum(qw.astype(jnp.int32), axis=(0, 1, 2))
            acc = acc - zp_eff * w_sum

            # float epilogue (XLA fuses): dequant -> bias -> act -> requant
            w_scale_b = w_scale if w_ch_axis is None else w_scale.reshape((1, 1, 1, -1))
            y = acc.astype(jnp.float32) * (x.scale * w_scale_b) + bf
            y = apply_activation(y, self.act)
            out_scale, out_zp = calculate_qparams(act_obs.value, aspec)
            return QTensor(quantize(y, out_scale, out_zp, aspec), out_scale, out_zp)

        # ------------------------------------------------------------------
        # Float / fake-quant paths
        # ------------------------------------------------------------------
        if isinstance(x, QTensor):  # pragma: no cover - misuse guard
            x = x.dequantize()

        if q_on and self.use_bn:
            if train:
                # torch nniqat.ConvBn2d._forward_approximate
                sf = bn_scale_factor(gamma, ra_var.value, self.bn_eps)
                w_scaled = w * sf.reshape((1, 1, 1, -1))
                w_q = apply_observer(self, w_obs, w_scaled, wspec, mode, w_ch_axis)
                y = self._conv(x, w_q, strides, padding, dilation)
                y = y / sf.reshape((1, 1, 1, -1))
                if bias is not None:
                    y = y + bias
                # batch-stats BN (torch semantics)
                bmean = jnp.mean(y, axis=(0, 1, 2))
                bvar = jnp.mean(jnp.square(y - bmean), axis=(0, 1, 2))
                y = (y - bmean) * jax.lax.rsqrt(bvar + self.bn_eps) * gamma + beta
                if not self.is_initializing():
                    n = y.shape[0] * y.shape[1] * y.shape[2]
                    unbiased = bvar * (n / max(n - 1, 1))
                    m = self.bn_momentum
                    ra_mean.value = (1 - m) * ra_mean.value + m * bmean
                    ra_var.value = (1 - m) * ra_var.value + m * unbiased
            else:
                wf, bf = fold_bn(w, bias, gamma, beta, ra_mean.value, ra_var.value, self.bn_eps)
                w_q = apply_observer(self, w_obs, wf, wspec, mode, w_ch_axis)
                y = self._conv(x, w_q, strides, padding, dilation) + bf
        elif q_on:  # quantized conv without BN (ConvReLU / head convs)
            w_q = apply_observer(self, w_obs, w, wspec, mode, w_ch_axis)
            y = self._conv(x, w_q, strides, padding, dilation)
            if bias is not None:
                y = y + bias
        else:  # pure float
            y = self._conv(x, w, strides, padding, dilation)
            if bias is not None:
                y = y + bias
            if self.use_bn:
                if train:
                    bmean = jnp.mean(y, axis=(0, 1, 2))
                    bvar = jnp.mean(jnp.square(y - bmean), axis=(0, 1, 2))
                    y = (y - bmean) * jax.lax.rsqrt(bvar + self.bn_eps) * gamma + beta
                    if not self.is_initializing():
                        n = y.shape[0] * y.shape[1] * y.shape[2]
                        unbiased = bvar * (n / max(n - 1, 1))
                        m = self.bn_momentum
                        ra_mean.value = (1 - m) * ra_mean.value + m * bmean
                        ra_var.value = (1 - m) * ra_var.value + m * unbiased
                else:
                    y = (y - ra_mean.value) * jax.lax.rsqrt(ra_var.value + self.bn_eps) * gamma + beta

        y = apply_activation(y, self.act)
        if q_on:
            y = apply_observer(self, act_obs, y, aspec, mode)
        if self.dtype != jnp.float32 and not isinstance(y, QTensor):
            # Materialize the block output in the compute dtype (bf16): the
            # QAT train step is HBM-bandwidth-bound (measured ~82% of the
            # roofline at bs512 with honest readback timing), and the
            # activation tensors written between blocks dominate the bytes.
            # The f32 BN/fake-quant arithmetic above stays f32 and fuses into
            # the producing kernel — only the stored tensor shrinks.
            # (An r1 note claimed this cast cost 10%; that was measured with
            # block_until_ready, which this host's transport does not honor.)
            y = y.astype(self.dtype)
        return y
