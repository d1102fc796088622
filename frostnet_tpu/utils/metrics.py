"""Metrics: top-k accuracy, confusion-matrix mIoU, AverageMeter.

TPU-native replacements for the reference's host-side metric code:
  * ``accuracy`` — Classification/utils/helper_functions.py:32-46
  * ``MIOU`` histogram mIoU — Semantic_Segmentation/utilities/metrics/
    segmentation_miou.py:4-35, but computed as an on-device confusion matrix
    (one one-hot matmul, MXU-friendly) instead of per-batch CPU torch.histc —
    removing the host sync flagged in SURVEY.md §3.4.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def topk_accuracy(logits: jnp.ndarray, labels: jnp.ndarray, ks: Sequence[int] = (1, 5)):
    """Fraction correct at each k. logits (B, C), labels (B,)."""
    maxk = max(ks)
    _, pred = jax.lax.top_k(logits, maxk)  # (B, maxk)
    correct = pred == labels[:, None]
    return tuple(jnp.mean(jnp.any(correct[:, :k], axis=1).astype(jnp.float32)) for k in ks)


def confusion_matrix(pred: jnp.ndarray, target: jnp.ndarray, num_classes: int,
                     ignore_index: int = 255) -> jnp.ndarray:
    """(C, C) confusion matrix, jittable; rows = target, cols = pred."""
    valid = (target != ignore_index) & (target >= 0) & (target < num_classes)
    t = jnp.where(valid, target, 0)
    p = jnp.clip(pred, 0, num_classes - 1)
    idx = t * num_classes + p
    cm = jnp.zeros((num_classes * num_classes,), jnp.int32).at[idx.reshape(-1)].add(
        valid.reshape(-1).astype(jnp.int32))
    return cm.reshape(num_classes, num_classes)


def miou_from_confusion(cm: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(per-class IoU, mean IoU over classes present)."""
    cm = cm.astype(jnp.float32)
    inter = jnp.diag(cm)
    union = cm.sum(0) + cm.sum(1) - inter
    iou = inter / jnp.maximum(union, 1.0)
    present = union > 0
    miou = jnp.sum(jnp.where(present, iou, 0.0)) / jnp.maximum(jnp.sum(present), 1)
    return iou, miou


class AverageMeter:
    """Running average (reference helper_functions.py:8-29)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)
