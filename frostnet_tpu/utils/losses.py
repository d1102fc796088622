"""Loss functions (reference: Classification/utils/Criteria.py CrossEntropyLoss2d,
loss_fns/segmentation_loss.py SegmentationLoss, Object_Detection multibox loss
lives in frostnet_tpu.detection, GAN losses in frostnet_tpu.gan)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    ignore_index: Optional[int] = None,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Weighted CE with optional ignore label, matching torch's
    nn.CrossEntropyLoss(weight, ignore_index) mean reduction (weighted mean).

    logits: (..., C), labels: integer (...,).
    """
    num_classes = logits.shape[-1]
    safe_labels = jnp.where(
        (labels < 0) | (labels >= num_classes), 0, labels
    )
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1 - label_smoothing) * nll + label_smoothing * smooth

    w = jnp.ones_like(nll)
    if class_weights is not None:
        w = class_weights[safe_labels]
    if ignore_index is not None:
        w = jnp.where(labels == ignore_index, 0.0, w)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def binary_cross_entropy_with_logits(logits, targets, pos_weight=None,
                                     weight=None):
    """BCEWithLogits (SegmentationLoss bce branch, segmentation_loss.py:20-35).

    ``pos_weight`` scales the positive term (torch pos_weight); ``weight``
    rescales the ELEMENTWISE loss before the mean (torch's ``weight=`` —
    per-class when shaped (C,) against NHWC logits)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    if pos_weight is not None:
        loss = -(pos_weight * targets * log_p + (1 - targets) * log_not_p)
    else:
        loss = -(targets * log_p + (1 - targets) * log_not_p)
    if weight is not None:
        loss = loss * weight
    return jnp.mean(loss)


def smooth_l1(pred, target, beta: float = 1.0):
    """Huber/smooth-L1 (SSD localization loss)."""
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def l1(pred, target):
    return jnp.mean(jnp.abs(pred - target))
