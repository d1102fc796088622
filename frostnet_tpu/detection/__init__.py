"""Object detection workload: boxes/anchors/losses/NMS + SSD models."""
from .anchors import CONFIGS, VOC_CFG, TDSOD_VOC_CFG, COCO_CFG, make_priors
from .boxes import (
    point_form,
    center_form,
    intersect,
    jaccard,
    encode,
    decode,
    match_priors,
    batched_match_priors,
)
from .losses import multibox_loss
from .nms import nms_fixed, detect
from .models import SSDMobileNetV2Feat, SSDHead, build_ssd
from .tdsod import TDSODFeat, TDSODHead, build_tdsod
from .data import (VOCDetection, COCODetection, SyntheticDetection,
                   VOC_CLASSES, ssd_augment, pad_targets)
from .evaluate import evaluate_map, voc_ap

__all__ = [
    "CONFIGS",
    "VOC_CFG",
    "TDSOD_VOC_CFG",
    "COCO_CFG",
    "make_priors",
    "point_form",
    "center_form",
    "intersect",
    "jaccard",
    "encode",
    "decode",
    "match_priors",
    "batched_match_priors",
    "multibox_loss",
    "nms_fixed",
    "detect",
    "SSDMobileNetV2Feat",
    "SSDHead",
    "build_ssd",
    "TDSODFeat",
    "TDSODHead",
    "build_tdsod",
    "VOCDetection",
    "COCODetection",
    "SyntheticDetection",
    "VOC_CLASSES",
    "ssd_augment",
    "pad_targets",
    "evaluate_map",
    "voc_ap",
]
