"""FP-only baseline zoo: DenseNet, SqueezeNet, MNASNet, Inception-v3.

The reference ships unmodified torchvision float models as FP baselines
(Classification/models/imagenet/FP_only/*); these are compact flax
re-implementations of the same public architectures (never quantized —
used for accuracy/latency baselines only).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..nn import QConvBNAct


def _conv(features, k, s=1, p=0, groups=1, act="relu", use_bn=True, bias=False):
    return QConvBNAct(features, k, strides=s, padding=p, groups=groups,
                      act=act, use_bn=use_bn, use_bias=bias, quantized=False)


class DenseLayer(fnn.Module):
    growth_rate: int
    bn_size: int = 4

    @fnn.compact
    def __call__(self, x, train=False):
        y = fnn.relu(fnn.BatchNorm(use_running_average=not train, momentum=0.9,
                                   name="norm1")(x))
        y = QConvBNAct(self.bn_size * self.growth_rate, 1, use_bn=False, act=None,
                       quantized=False, name="conv1")(y, train=train)
        y = fnn.relu(fnn.BatchNorm(use_running_average=not train, momentum=0.9,
                                   name="norm2")(y))
        y = QConvBNAct(self.growth_rate, 3, padding=1, use_bn=False, act=None,
                       quantized=False, name="conv2")(y, train=train)
        return jnp.concatenate([x, y], axis=-1)


class DenseNet(fnn.Module):
    """DenseNet-BC (121/169/201 via block_config)."""

    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    num_init_features: int = 64
    num_classes: int = 1000

    @fnn.compact
    def __call__(self, x, train: bool = False):
        x = QConvBNAct(self.num_init_features, 7, strides=2, padding=3, act="relu",
                       quantized=False, name="stem")(x, train=train)
        x = fnn.max_pool(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                                 constant_values=-jnp.inf), (3, 3), (2, 2))
        for bi, n in enumerate(self.block_config):
            for li in range(n):
                x = DenseLayer(self.growth_rate, name=f"block{bi}_layer{li}")(x, train)
            if bi != len(self.block_config) - 1:
                x = fnn.relu(fnn.BatchNorm(use_running_average=not train, momentum=0.9,
                                           name=f"trans{bi}_norm")(x))
                x = QConvBNAct(x.shape[-1] // 2, 1, use_bn=False, act=None,
                               quantized=False, name=f"trans{bi}_conv")(x, train=train)
                x = fnn.avg_pool(x, (2, 2), (2, 2))
        x = fnn.relu(fnn.BatchNorm(use_running_average=not train, momentum=0.9,
                                   name="norm_final")(x))
        x = jnp.mean(x, axis=(1, 2))
        w = self.param("classifier_kernel", fnn.initializers.lecun_normal(),
                       (x.shape[-1], self.num_classes))
        b = self.param("classifier_bias", fnn.initializers.zeros_init(),
                       (self.num_classes,))
        return x @ w + b


class Fire(fnn.Module):
    squeeze: int
    expand1: int
    expand3: int

    @fnn.compact
    def __call__(self, x, train=False):
        s = QConvBNAct(self.squeeze, 1, use_bn=False, use_bias=True, act="relu",
                       quantized=False, name="squeeze")(x, train=train)
        e1 = QConvBNAct(self.expand1, 1, use_bn=False, use_bias=True, act="relu",
                        quantized=False, name="expand1x1")(s, train=train)
        e3 = QConvBNAct(self.expand3, 3, padding=1, use_bn=False, use_bias=True,
                        act="relu", quantized=False, name="expand3x3")(s, train=train)
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNet(fnn.Module):
    version: str = "1_1"
    num_classes: int = 1000
    drop_rate: float = 0.5

    @fnn.compact
    def __call__(self, x, train: bool = False):
        def mp(v):
            return fnn.max_pool(v, (3, 3), (2, 2))

        if self.version == "1_0":
            x = QConvBNAct(96, 7, strides=2, use_bn=False, use_bias=True, act="relu",
                           quantized=False, name="stem")(x, train=train)
            x = mp(x)
            cfg = [(16, 64, 64), (16, 64, 64), (32, 128, 128), "M", (32, 128, 128),
                   (48, 192, 192), (48, 192, 192), (64, 256, 256), "M", (64, 256, 256)]
        else:
            x = QConvBNAct(64, 3, strides=2, use_bn=False, use_bias=True, act="relu",
                           quantized=False, name="stem")(x, train=train)
            x = mp(x)
            cfg = [(16, 64, 64), (16, 64, 64), "M", (32, 128, 128), (32, 128, 128),
                   "M", (48, 192, 192), (48, 192, 192), (64, 256, 256), (64, 256, 256)]
        fi = 0
        for c in cfg:
            if c == "M":
                x = mp(x)
            else:
                x = Fire(*c, name=f"fire{fi}")(x, train)
                fi += 1
        x = fnn.Dropout(self.drop_rate, deterministic=not train)(x)
        x = QConvBNAct(self.num_classes, 1, use_bn=False, use_bias=True, act="relu",
                       quantized=False, name="final_conv")(x, train=train)
        return jnp.mean(x, axis=(1, 2))


class MNASNet(fnn.Module):
    """MNASNet-B1 (torchvision mnasnet1_0 spec)."""

    alpha: float = 1.0
    num_classes: int = 1000
    drop_rate: float = 0.2

    @fnn.compact
    def __call__(self, x, train: bool = False):
        def depths(d):
            return max(32 // 8, int(d * self.alpha + 4) // 8 * 8)

        def conv(f, k, s, p, g=1, act="relu", name=None):
            return QConvBNAct(f, k, strides=s, padding=p, groups=g, act=act,
                              quantized=False, name=name)

        d32, d16, d24 = depths(32), depths(16), depths(24)
        x = conv(d32, 3, 2, 1, name="stem")(x, train=train)
        x = conv(d32, 3, 1, 1, g=d32, name="sep_dw")(x, train=train)
        x = conv(d16, 1, 1, 0, act=None, name="sep_pw")(x, train=train)
        # (expansion, channels, repeats, stride, kernel)
        for bi, (t, c, n, s, k) in enumerate([
            (3, 24, 3, 2, 3), (3, 40, 3, 2, 5), (6, 80, 3, 2, 5),
            (6, 96, 2, 1, 3), (6, 192, 4, 2, 5), (6, 320, 1, 1, 3),
        ]):
            out_c = depths(c)
            for i in range(n):
                stride = s if i == 0 else 1
                in_c = x.shape[-1]
                hidden = in_c * t
                y = conv(hidden, 1, 1, 0, name=f"b{bi}_{i}_pw")(x, train=train)
                y = conv(hidden, k, stride, k // 2, g=hidden,
                         name=f"b{bi}_{i}_dw")(y, train=train)
                y = conv(out_c, 1, 1, 0, act=None, name=f"b{bi}_{i}_lin")(y, train=train)
                x = x + y if (stride == 1 and in_c == out_c) else y
        x = conv(1280, 1, 1, 0, name="head")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        x = fnn.Dropout(self.drop_rate, deterministic=not train)(x)
        w = self.param("classifier_kernel", fnn.initializers.lecun_normal(),
                       (1280, self.num_classes))
        b = self.param("classifier_bias", fnn.initializers.zeros_init(),
                       (self.num_classes,))
        return x @ w + b


class InceptionV3(fnn.Module):
    """Inception-v3 trunk (compact: the canonical mixed blocks)."""

    num_classes: int = 1000
    drop_rate: float = 0.5

    def _c(self, f, k, s=1, p=0, name=None):
        return QConvBNAct(f, k, strides=s, padding=p, act="relu",
                          quantized=False, bn_eps=1e-3, name=name)

    @fnn.compact
    def __call__(self, x, train: bool = False):
        c = self._c
        x = c(32, 3, 2, name="c1")(x, train=train)
        x = c(32, 3, name="c2")(x, train=train)
        x = c(64, 3, p=1, name="c3")(x, train=train)
        x = fnn.max_pool(x, (3, 3), (2, 2))
        x = c(80, 1, name="c4")(x, train=train)
        x = c(192, 3, name="c5")(x, train=train)
        x = fnn.max_pool(x, (3, 3), (2, 2))

        def inception_a(x, pool_f, name):
            b1 = c(64, 1, name=f"{name}_b1")(x, train=train)
            b2 = c(48, 1, name=f"{name}_b2a")(x, train=train)
            b2 = c(64, 5, p=2, name=f"{name}_b2b")(b2, train=train)
            b3 = c(64, 1, name=f"{name}_b3a")(x, train=train)
            b3 = c(96, 3, p=1, name=f"{name}_b3b")(b3, train=train)
            b3 = c(96, 3, p=1, name=f"{name}_b3c")(b3, train=train)
            b4 = fnn.avg_pool(x, (3, 3), (1, 1), padding=((1, 1), (1, 1)))
            b4 = c(pool_f, 1, name=f"{name}_b4")(b4, train=train)
            return jnp.concatenate([b1, b2, b3, b4], -1)

        x = inception_a(x, 32, "mixed0")
        x = inception_a(x, 64, "mixed1")
        x = inception_a(x, 64, "mixed2")

        # reduction A
        b1 = c(384, 3, 2, name="redA_b1")(x, train=train)
        b2 = c(64, 1, name="redA_b2a")(x, train=train)
        b2 = c(96, 3, p=1, name="redA_b2b")(b2, train=train)
        b2 = c(96, 3, 2, name="redA_b2c")(b2, train=train)
        b3 = fnn.max_pool(x, (3, 3), (2, 2))
        x = jnp.concatenate([b1, b2, b3], -1)

        def inception_b(x, ch7, name):
            b1 = c(192, 1, name=f"{name}_b1")(x, train=train)
            b2 = c(ch7, 1, name=f"{name}_b2a")(x, train=train)
            b2 = c(ch7, (1, 7), p=(0, 3), name=f"{name}_b2b")(b2, train=train)
            b2 = c(192, (7, 1), p=(3, 0), name=f"{name}_b2c")(b2, train=train)
            b3 = c(ch7, 1, name=f"{name}_b3a")(x, train=train)
            b3 = c(ch7, (7, 1), p=(3, 0), name=f"{name}_b3b")(b3, train=train)
            b3 = c(ch7, (1, 7), p=(0, 3), name=f"{name}_b3c")(b3, train=train)
            b3 = c(ch7, (7, 1), p=(3, 0), name=f"{name}_b3d")(b3, train=train)
            b3 = c(192, (1, 7), p=(0, 3), name=f"{name}_b3e")(b3, train=train)
            b4 = fnn.avg_pool(x, (3, 3), (1, 1), padding=((1, 1), (1, 1)))
            b4 = c(192, 1, name=f"{name}_b4")(b4, train=train)
            return jnp.concatenate([b1, b2, b3, b4], -1)

        x = inception_b(x, 128, "mixed4")
        x = inception_b(x, 160, "mixed5")
        x = inception_b(x, 160, "mixed6")
        x = inception_b(x, 192, "mixed7")

        # reduction B
        b1 = c(192, 1, name="redB_b1a")(x, train=train)
        b1 = c(320, 3, 2, name="redB_b1b")(b1, train=train)
        b2 = c(192, 1, name="redB_b2a")(x, train=train)
        b2 = c(192, (1, 7), p=(0, 3), name="redB_b2b")(b2, train=train)
        b2 = c(192, (7, 1), p=(3, 0), name="redB_b2c")(b2, train=train)
        b2 = c(192, 3, 2, name="redB_b2d")(b2, train=train)
        b3 = fnn.max_pool(x, (3, 3), (2, 2))
        x = jnp.concatenate([b1, b2, b3], -1)

        def inception_c(x, name):
            b1 = c(320, 1, name=f"{name}_b1")(x, train=train)
            b2 = c(384, 1, name=f"{name}_b2a")(x, train=train)
            b2a = c(384, (1, 3), p=(0, 1), name=f"{name}_b2b")(b2, train=train)
            b2b = c(384, (3, 1), p=(1, 0), name=f"{name}_b2c")(b2, train=train)
            b3 = c(448, 1, name=f"{name}_b3a")(x, train=train)
            b3 = c(384, 3, p=1, name=f"{name}_b3b")(b3, train=train)
            b3a = c(384, (1, 3), p=(0, 1), name=f"{name}_b3c")(b3, train=train)
            b3b = c(384, (3, 1), p=(1, 0), name=f"{name}_b3d")(b3, train=train)
            b4 = fnn.avg_pool(x, (3, 3), (1, 1), padding=((1, 1), (1, 1)))
            b4 = c(192, 1, name=f"{name}_b4")(b4, train=train)
            return jnp.concatenate([b1, b2a, b2b, b3a, b3b, b4], -1)

        x = inception_c(x, "mixed9")
        x = inception_c(x, "mixed10")

        x = jnp.mean(x, axis=(1, 2))
        x = fnn.Dropout(self.drop_rate, deterministic=not train)(x)
        w = self.param("fc_kernel", fnn.initializers.lecun_normal(),
                       (2048, self.num_classes))
        b = self.param("fc_bias", fnn.initializers.zeros_init(), (self.num_classes,))
        return x @ w + b


def fp_only_factories():
    return {
        "densenet121": lambda **kw: DenseNet(block_config=(6, 12, 24, 16),
                                             **{"num_classes": 1000, **kw}),
        "densenet169": lambda **kw: DenseNet(block_config=(6, 12, 32, 32),
                                             **{"num_classes": 1000, **kw}),
        "densenet201": lambda **kw: DenseNet(block_config=(6, 12, 48, 32),
                                             **{"num_classes": 1000, **kw}),
        "squeezenet1_0": lambda **kw: SqueezeNet(version="1_0",
                                                 **{"num_classes": 1000, **kw}),
        "squeezenet1_1": lambda **kw: SqueezeNet(version="1_1",
                                                 **{"num_classes": 1000, **kw}),
        "mnasnet0_5": lambda **kw: MNASNet(alpha=0.5, **{"num_classes": 1000, **kw}),
        "mnasnet1_0": lambda **kw: MNASNet(alpha=1.0, **{"num_classes": 1000, **kw}),
        "inception_v3": lambda **kw: InceptionV3(**{"num_classes": 1000, **kw}),
    }
