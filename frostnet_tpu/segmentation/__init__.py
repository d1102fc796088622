"""Semantic segmentation workload: models, heads, data, trainer."""
from .heads import LRASPP, LRASPPHead, RASPP, RASPPHead, ASPPPooling
from .models import MobileNetV3Seg, MobileNetV2Seg, SEG_MODELS, get_seg_model
from .data import (
    CITYSCAPES_CLASSES,
    CITYSCAPES_IGNORE,
    CITYSCAPES_CLASS_WEIGHTS,
    CityscapesSegmentation,
    CustomSegmentation,
    VOCSegmentation,
    SyntheticSegmentation,
    PairedTransforms,
)

__all__ = [
    "LRASPP",
    "LRASPPHead",
    "RASPP",
    "RASPPHead",
    "ASPPPooling",
    "MobileNetV3Seg",
    "MobileNetV2Seg",
    "SEG_MODELS",
    "get_seg_model",
    "CITYSCAPES_CLASSES",
    "CITYSCAPES_IGNORE",
    "CITYSCAPES_CLASS_WEIGHTS",
    "CityscapesSegmentation",
    "CustomSegmentation",
    "VOCSegmentation",
    "SyntheticSegmentation",
    "PairedTransforms",
]
