"""GAN networks for style transfer.

Re-implements Style_Transfer/models/networks.py:
  * ResnetGenerator (:405-490): FP reflection pad -> quantized core
    (QuantStub -> 7x7 ConvBNReLU -> 2 strided downsamples -> n ResnetBlocks
    with observed skip adds -> 2x (bilinear Upsample + ConvBNReLU) -> Dequant)
    -> FP pad + 7x7 conv + Tanh tail. The quant core avoids ConvTranspose
    (upsample+conv quantizes cleanly).
  * ResnetBlock (:492-550) with FloatFunctional skip add.
  * NLayerDiscriminator PatchGAN (:553-599) and PixelDiscriminator (:601+),
    float-only (Ds are never quantized in the reference).
  * GANLoss vanilla/lsgan/wgangp (:301-368) + gradient penalty (:370-403).
"""
from __future__ import annotations

from typing import Any

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..nn import QAdd, QConvBNAct, QuantMode, QuantStub, dequant
from ..ops.resize import resize_bilinear
from ..quant import QConfig, QNNPACK
from ..quant.qtensor import QTensor


# the reference initializes every GAN net with init_net(init_type='normal',
# init_gain=0.02): conv weights ~ N(0, 0.02), BN gamma ~ N(1, 0.02)
# (Style_Transfer/models/networks.py:159-209). Without it the PatchGAN's
# 512->1 output conv under a fan_out init produces O(30) logits at init and
# the lsgan loss swamps training.
GAN_KERNEL_INIT = fnn.initializers.normal(0.02)


def _gan_bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


def reflection_pad(x, p: int):
    if isinstance(x, QTensor):
        return QTensor(
            jnp.pad(x.q, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect"),
            x.scale, x.zero_point)
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class ResnetBlock(fnn.Module):
    """Conv block with observed skip add (networks.py:492-550)."""

    dim: int
    use_dropout: bool = False
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype,
                  kernel_init=GAN_KERNEL_INIT, bn_scale_init=_gan_bn_scale_init)
        out = QConvBNAct(self.dim, 3, padding=1, act="relu", name="conv1", **kw)(
            x, mode, train)
        if self.use_dropout and not isinstance(out, QTensor):
            out = fnn.Dropout(0.5, deterministic=not train)(out)
        out = QConvBNAct(self.dim, 3, padding=1, act=None, name="conv2", **kw)(
            out, mode, train)
        if self.quantized:
            return QAdd(self.qconfig, name="skip_add")(x, out, mode)
        return x + out


class ResnetGenerator(fnn.Module):
    """Quantized-core ResNet generator (networks.py:405-490)."""

    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 6
    use_dropout: bool = False
    quantized: bool = True
    qconfig: QConfig = QNNPACK
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, mode: QuantMode = QuantMode(), train: bool = False):
        kw = dict(quantized=self.quantized, qconfig=self.qconfig, dtype=self.dtype,
                  kernel_init=GAN_KERNEL_INIT, bn_scale_init=_gan_bn_scale_init)
        ngf = self.ngf

        # FP reflection pad enters the quant region (pad then 7x7 valid conv)
        x = reflection_pad(x, 3)
        if self.quantized:
            x = QuantStub(self.qconfig, name="quant")(x, mode)
        x = QConvBNAct(ngf, 7, padding=0, act="relu", name="stem", **kw)(x, mode, train)
        for i in range(2):  # downsampling
            mult = 2 ** i
            x = QConvBNAct(ngf * mult * 2, 3, strides=2, padding=1, act="relu",
                           name=f"down{i}", **kw)(x, mode, train)
        for i in range(self.n_blocks):
            x = ResnetBlock(ngf * 4, use_dropout=self.use_dropout,
                            quantized=self.quantized, qconfig=self.qconfig,
                            dtype=self.dtype, name=f"block{i}")(x, mode, train)
        for i in range(2):  # upsampling: bilinear resize + conv (no transpose)
            mult = 2 ** (2 - i)
            xf = dequant(x)
            up = resize_bilinear(
                xf, (xf.shape[1] * 2, xf.shape[2] * 2), align_corners=True)
            if self.quantized:
                # re-enter the integer domain after the float resize; the stub
                # runs in every mode so its observer exists and calibrates
                # during QAT (INT8 then reuses the same qparams).
                up = QuantStub(self.qconfig, name=f"requant_up{i}")(up, mode)
            x = QConvBNAct(int(ngf * mult / 2), 3, padding=1, act="relu",
                           name=f"up{i}", **kw)(up, mode, train)
        x = dequant(x)

        # FP tail (networks.py:421-425)
        x = reflection_pad(x, 3)
        x = QConvBNAct(self.output_nc, 7, padding=0, use_bn=False, use_bias=True,
                       act="tanh", quantized=False, name="tail",
                       kernel_init=GAN_KERNEL_INIT)(x, mode, train)
        return x


class NLayerDiscriminator(fnn.Module):
    """PatchGAN discriminator (networks.py:553-599), float-only.

    ``norm``: 'batch' (pix2pix default, pix2pix_model.py:32) or 'none'
    (this reference repo's base default, base_options.py:36 — what
    cyclegan gets). The reference's Ds honor the flag even though the
    quantized generator core does not (see define_g)."""

    ndf: int = 64
    n_layers: int = 3
    norm: str = "batch"
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = False):
        use_bn = self.norm == "batch"
        kw = dict(quantized=False, dtype=self.dtype,
                  kernel_init=GAN_KERNEL_INIT, bn_scale_init=_gan_bn_scale_init)
        x = QConvBNAct(self.ndf, 4, strides=2, padding=1, use_bn=False,
                       use_bias=True, act=None, name="conv0", **kw)(x, train=train)
        x = fnn.leaky_relu(x, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            x = QConvBNAct(self.ndf * nf, 4, strides=2, padding=1, act=None,
                           use_bn=use_bn, name=f"conv{n}", **kw)(x, train=train)
            x = fnn.leaky_relu(x, 0.2)
        nf = min(2 ** self.n_layers, 8)
        x = QConvBNAct(self.ndf * nf, 4, strides=1, padding=1, act=None,
                       use_bn=use_bn, name=f"conv{self.n_layers}", **kw)(x, train=train)
        x = fnn.leaky_relu(x, 0.2)
        return QConvBNAct(1, 4, strides=1, padding=1, use_bn=False, use_bias=True,
                          act=None, name="out", **kw)(x, train=train)


class PixelDiscriminator(fnn.Module):
    """1x1 PatchGAN (networks.py:601+), float-only."""

    ndf: int = 64
    norm: str = "batch"
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(quantized=False, dtype=self.dtype,
                  kernel_init=GAN_KERNEL_INIT, bn_scale_init=_gan_bn_scale_init)
        x = QConvBNAct(self.ndf, 1, use_bn=False, use_bias=True, act=None,
                       name="conv0", **kw)(x, train=train)
        x = fnn.leaky_relu(x, 0.2)
        x = QConvBNAct(self.ndf * 2, 1, act=None, use_bn=self.norm == "batch",
                       name="conv1", **kw)(x, train=train)
        x = fnn.leaky_relu(x, 0.2)
        # out conv bias follows the reference's use_bias rule (False for
        # batch/none, networks.py:613-626)
        return QConvBNAct(1, 1, use_bn=False, use_bias=False, act=None,
                          name="out", **kw)(x, train=train)


def gan_loss(pred: jnp.ndarray, target_is_real: bool, gan_mode: str = "lsgan"):
    """GANLoss (networks.py:301-368)."""
    if gan_mode == "lsgan":
        target = jnp.ones_like(pred) if target_is_real else jnp.zeros_like(pred)
        return jnp.mean((pred - target) ** 2)
    if gan_mode == "vanilla":
        target = jnp.ones_like(pred) if target_is_real else jnp.zeros_like(pred)
        return jnp.mean(
            jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred))))
    if gan_mode == "wgangp":
        return -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    raise ValueError(f"unknown gan_mode {gan_mode!r}")


def gradient_penalty(d_apply, d_vars, real, fake, rng, constant=1.0, lambda_gp=10.0):
    """WGAN-GP penalty on random interpolates (networks.py:370-403)."""
    alpha = jax.random.uniform(rng, (real.shape[0], 1, 1, 1))
    interp = alpha * real + (1 - alpha) * fake

    def d_sum(v):
        return jnp.sum(d_apply(d_vars, v))

    grads = jax.grad(d_sum)(interp)
    gnorm = jnp.sqrt(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, axis=1) + 1e-16)
    return jnp.mean((gnorm - constant) ** 2) * lambda_gp


def define_g(output_nc=3, ngf=64, netG="resnet_6blocks", use_dropout=False,
             quantized=True, qconfig=QNNPACK):
    """Generator factory (networks.py:211-252).

    No ``norm`` knob on purpose: the reference's quantized generator core
    hardcodes BatchNorm regardless of --norm (define_G passes a
    functools.partial into wrappers that compare against the STRING 'none',
    networks.py:11-19/110-127/239-242), so BN-always IS the reference
    behavior; only the discriminators honor the flag (see define_d)."""
    if netG == "resnet_6blocks":
        return ResnetGenerator(output_nc, ngf, 6, use_dropout, quantized, qconfig)
    if netG == "resnet_9blocks":
        return ResnetGenerator(output_nc, ngf, 9, use_dropout, quantized, qconfig)
    raise ValueError(f"generator {netG!r} not supported (unet variants use "
                     "ConvTranspose which the quant path avoids; reference "
                     "default is resnet_6blocks, pix2pix_model.py:32)")


def define_d(ndf=64, netD="basic", n_layers=3, norm="batch"):
    """Discriminator factory (networks.py:254-299). ``norm``: 'batch'
    (pix2pix) or 'none' (the repo base default — cyclegan's Ds have no
    norm layers and bias-free middle convs). The reference also lists
    'instance', but its quantized conv wrappers degrade instance to none
    (networks.py:53) — pass 'none' for that behavior."""
    if norm not in ("batch", "none"):
        raise ValueError(f"norm must be batch|none, got {norm!r}")
    if netD == "basic":
        return NLayerDiscriminator(ndf, 3, norm=norm)
    if netD == "n_layers":
        return NLayerDiscriminator(ndf, n_layers, norm=norm)
    if netD == "pixel":
        return PixelDiscriminator(ndf, norm=norm)
    raise ValueError(f"unknown discriminator {netD!r}")
