"""Quant-aware composite blocks shared by the model zoo.

Functional re-designs of the reference's quantizable layer library
(Classification/models/imagenet/mobilenetv3.py:6-155 and
Semantic_Segmentation/model/layers/basic.py:11-229): hard-swish/-sigmoid
built from observed multiplies (each FloatFunctional site keeps its own
requant scale), squeeze-excite with an observed gating multiply, and the
MobileNet inverted-residual bottlenecks.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as fnn
import jax.numpy as jnp

from ..quant import QConfig, QNNPACK
from ..quant.qtensor import QTensor
from .conv import QConvBNAct, kaiming_normal_fan_out
from .mode import QuantMode
from .pool import global_avg_pool
from .quant_ops import (QAdd, QMul, add_scalar, mul_scalar,
                        observed_fake_quant, observed_standalone_act)


def _relu(x):
    if isinstance(x, QTensor):
        # integer relu: clamp at the zero point (represents 0.0)
        return QTensor(jnp.maximum(x.q, x.zero_point.astype(x.q.dtype)), x.scale, x.zero_point)
    return fnn.relu(x)


def _relu6(x):
    if isinstance(x, QTensor):
        # clamp on the integer grid at the point representing 6.0
        q6 = jnp.round(6.0 / x.scale) + x.zero_point
        return QTensor(jnp.clip(x.q, x.zero_point, q6.astype(x.q.dtype)),
                       x.scale, x.zero_point)
    return jnp.clip(x, 0.0, 6.0)


class QHswish(fnn.Module):
    """x * relu6(x+3) / 6 as observed ops (reference mobilenetv3.py:43-56):
    add_scalar -> relu6 (standalone, observed in QAT) -> observed mul ->
    mul_scalar. The relu6 requant matches torch eager QAT, which hooks a
    FakeQuantize onto the bare nn.ReLU6 (round-5 trajectory-parity fix)."""

    qconfig: QConfig = QNNPACK

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode()):
        out = _relu6(add_scalar(x, 3.0))
        out = observed_standalone_act(self, "relu6_obs", out,
                                      self.qconfig.activation, mode)
        out = QMul(self.qconfig, name="quant_mul")(x, out, mode)
        return mul_scalar(out, 1.0 / 6.0)


class QHsigmoid(fnn.Module):
    """relu6(x+3)/6 (reference mobilenetv3.py:59-69); the standalone relu6
    is observed in QAT like torch's hooked nn.ReLU6."""

    qconfig: QConfig = QNNPACK

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode()):
        out = _relu6(add_scalar(x, 3.0))
        out = observed_standalone_act(self, "relu6_obs", out,
                                      self.qconfig.activation, mode)
        return mul_scalar(out, 1.0 / 6.0)


class QDense(fnn.Module):
    """Quant-aware fully-connected layer (the SE fc stack / classifier
    Linears). Weight fake-quant + output observer, like a fused LinearReLU."""

    features: int
    use_bias: bool = False
    act: Optional[str] = None
    quantized: bool = True
    qconfig: QConfig = QNNPACK

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode()):
        if isinstance(x, QTensor):
            x = x.dequantize()
        w = self.param("kernel", kaiming_normal_fan_out, (x.shape[-1], self.features, 1, 1),
                       jnp.float32)
        w2 = w[..., 0, 0]
        if self.quantized:
            # int8 mode runs this tiny matmul in float with quantized weights
            # (negligible compute); eff makes that a fake-quant application.
            eff = QuantMode(fake_quant=mode.fake_quant or mode.int8, observe=mode.observe)
            wspec = self.qconfig.weight
            ch_axis = -1 if wspec.per_channel else None
            w2 = observed_fake_quant(self, "w_obs", w2, wspec, eff, ch_axis)
        y = x @ w2
        if self.use_bias:
            y = y + self.param("bias", fnn.initializers.zeros_init(), (self.features,), jnp.float32)
        if self.act == "relu":
            y = fnn.relu(y)
        if self.quantized:
            y = observed_fake_quant(self, "act_obs", y, self.qconfig.activation, eff)
        return y


class QSEModule(fnn.Module):
    """Squeeze-excite with hard-sigmoid gate and observed channel-wise mul
    (reference mobilenetv3.py:86-104). The fc stack runs float even in INT8
    mode (it is negligible compute); the gating mul requantizes."""

    reduction: int = 4
    quantized: bool = True
    qconfig: QConfig = QNNPACK

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode()):
        xf = x.dequantize() if isinstance(x, QTensor) else x
        c = xf.shape[-1]
        s = jnp.mean(xf, axis=(1, 2))  # (N, C)
        s = QDense(c // self.reduction, act="relu", quantized=self.quantized,
                   qconfig=self.qconfig, name="fc1")(s, mode)
        s = QDense(c, quantized=self.quantized, qconfig=self.qconfig, name="fc2")(s, mode)
        s = QHsigmoid(self.qconfig, name="hsig")(s, mode)
        s = s[:, None, None, :]
        if self.quantized:
            # pass the (N,1,1,C) gate directly — QMul's multiply broadcasts
            # and its observer sees the same min/max; materializing the gate
            # at full resolution (the old `s * ones_like(xf)`) wrote an f32
            # broadcast per SE block at entry level (8.8 MB/img each in the
            # seg INT8 HLO, round-4 study)
            return QMul(self.qconfig, name="quant_mul")(x, s, mode)
        return xf * s


class InvertedResidual(fnn.Module):
    """MobileNetV2 inverted residual with observed skip add (reference
    Classification/models/imagenet/mobilenet.py:16-93 pattern)."""

    out_channels: int
    strides: int = 1
    expand_ratio: int = 6
    kernel_size: int = 3
    dilation: int = 1
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        in_ch = (x.q if isinstance(x, QTensor) else x).shape[-1]
        hidden = int(round(in_ch * self.expand_ratio))
        use_res = self.strides == 1 and in_ch == self.out_channels
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)

        out = x
        if self.expand_ratio != 1:
            out = QConvBNAct(hidden, 1, act="relu", name="expand", **kw)(out, mode, train)
        pad = self.dilation * (self.kernel_size - 1) // 2
        out = QConvBNAct(hidden, self.kernel_size, strides=self.strides, padding=pad,
                         dilation=self.dilation, groups=hidden, act="relu",
                         name="dw", **kw)(out, mode, train)
        out = QConvBNAct(self.out_channels, 1, act=None, name="project", **kw)(out, mode, train)
        if use_res:
            if self.quantized:
                out = QAdd(self.qconfig, name="skip_add")(x, out, mode)
            else:
                out = x + out
        return out


class BottleneckV3(fnn.Module):
    """MobileNetV3 bottleneck: expand (HS or RE) -> dw ConvBN -> optional SE
    -> activation -> linear project, observed skip (reference
    mobilenetv3.py:114-155)."""

    out_channels: int
    exp_size: int
    kernel_size: int
    strides: int
    dilation: int = 1
    se: bool = False
    nl: str = "RE"
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        in_ch = (x.q if isinstance(x, QTensor) else x).shape[-1]
        use_res = self.strides == 1 and in_ch == self.out_channels
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype)

        hs = self.nl == "HS"
        out = QConvBNAct(self.exp_size, 1, act=None if hs else "relu", name="expand", **kw)(
            x, mode, train)
        if hs:
            out = QHswish(self.qconfig, name="expand_hs")(out, mode) if self.quantized \
                else out * jnp.clip(out + 3.0, 0, 6) / 6
        pad = (self.kernel_size - 1) // 2 * self.dilation
        out = QConvBNAct(self.exp_size, self.kernel_size, strides=self.strides,
                         padding=pad, dilation=self.dilation, groups=self.exp_size,
                         act=None, name="dw", **kw)(out, mode, train)
        if self.se:
            out = QSEModule(quantized=self.quantized, qconfig=self.qconfig,
                            name="se")(out, mode)
        if hs:
            out = QHswish(self.qconfig, name="dw_hs")(out, mode) if self.quantized \
                else out * jnp.clip(out + 3.0, 0, 6) / 6
        else:
            # the bare post-SE nn.ReLU (mobilenetv3.py:137) gets NO observer
            # in torch eager QAT — ReLU is in torch's no-observe passthrough
            # set (quantized relu reuses input qparams), unlike ReLU6
            # (verified against prepare_qat on the reference block, round 5)
            out = _relu(out)
        out = QConvBNAct(self.out_channels, 1, act=None, name="project", **kw)(out, mode, train)
        if use_res:
            if self.quantized:
                out = QAdd(self.qconfig, name="skip_add")(x, out, mode)
            else:
                out = x + out
        return out
