"""Model zoo registry.

``create_model(name)`` mirrors the reference's timm/`models.__dict__`
dispatch (Classification/train.py:75-78, frostnet.py @register_model).
"""
from __future__ import annotations

from typing import Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str, factory: Callable) -> None:
    _REGISTRY[name] = factory


def create_model(name: str, **kwargs):
    try:
        factory = _REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown model {name!r}; known: {sorted(_REGISTRY)}")
    return factory(**kwargs)


def list_models(filter_substr: str = "") -> list[str]:
    return sorted(n for n in _REGISTRY if filter_substr in n)


from .frostnet import FrostNet, CascadePreExBottleneck, FROSTNET_MODELS, make_divisible
from .mobilenetv2 import MobileNetV2, mobilenetv2_factories
from .mobilenetv3 import MobileNetV3, mobilenetv3_factories
from .resnet import ResNet, resnet_factories
from .shufflenetv2 import ShuffleNetV2, shufflenetv2_factories
from .vgg import VGG, AlexNet, vgg_factories
from .fp_only import DenseNet, SqueezeNet, MNASNet, InceptionV3, fp_only_factories
from .cifar import CifarAlexNet, cifar_factories


def _espnetv2_cls_factories():
    # ESPNetv2 ImageNet classifier (reference backbones/espnetv2.py EESPNet)
    from ..segmentation.espnet import EESPNet

    reg = {}
    for s_ in (0.5, 1.0, 1.5, 2.0):
        name = f"espnetv2_s_{str(s_).replace('.', '_')}"
        reg[name] = (lambda sv=s_, **kw: EESPNet(s=sv, **{"num_classes": 1000, **kw}))
    return reg


for _reg in (FROSTNET_MODELS, mobilenetv2_factories(), mobilenetv3_factories(),
             resnet_factories(), shufflenetv2_factories(), vgg_factories(),
             fp_only_factories(), cifar_factories(),
             _espnetv2_cls_factories()):
    for _name, _factory in _reg.items():
        register_model(_name, _factory)

__all__ = [
    "create_model",
    "list_models",
    "register_model",
    "FrostNet",
    "CascadePreExBottleneck",
    "make_divisible",
]
