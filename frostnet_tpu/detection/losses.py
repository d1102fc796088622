"""MultiBox loss, fixed-shape and fully on-device.

Re-implements Object_Detection/layers/modules/multibox_loss.py:48-117 with
TPU-compatible shapes: the dynamic boolean gathers become masks, and hard
negative mining keeps the reference's exact rank trick (sort the per-prior
losses, rank them, keep ranks < 3*num_pos) which is already fixed-shape.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.losses import smooth_l1
from .boxes import batched_match_priors


def multibox_loss(
    loc_pred: jnp.ndarray,    # (B, P, 4)
    conf_pred: jnp.ndarray,   # (B, P, C)
    gt_boxes: jnp.ndarray,    # (B, G, 4) point-form, zero-padded
    gt_labels: jnp.ndarray,   # (B, G) 0-based classes
    gt_valid: jnp.ndarray,    # (B, G) bool
    priors: jnp.ndarray,      # (P, 4) center-form
    threshold: float = 0.5,
    negpos_ratio: int = 3,
    variances=(0.1, 0.2),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (loss_loc, loss_conf), both normalized by total #positives."""
    loc_t, conf_t = batched_match_priors(
        gt_boxes, gt_labels, gt_valid, priors, threshold, variances)
    pos = conf_t > 0                                       # (B, P)
    num_pos = jnp.sum(pos, axis=1, keepdims=True)          # (B, 1)

    # localization: smooth-L1 on positives only
    l1 = jnp.sum(smooth_l1(loc_pred, jax.lax.stop_gradient(loc_t)), axis=-1)
    loss_l = jnp.sum(l1 * pos)

    # hard negative mining on the softmax loss (multibox_loss.py:93-110)
    logp = jax.nn.log_softmax(conf_pred, axis=-1)
    ce = -jnp.take_along_axis(logp, conf_t[..., None], axis=-1)[..., 0]  # (B, P)
    neg_cand = jnp.where(pos, 0.0, jax.lax.stop_gradient(ce))
    order = jnp.argsort(-neg_cand, axis=1)
    rank = jnp.argsort(order, axis=1)
    num_neg = jnp.clip(negpos_ratio * num_pos, max=pos.shape[1] - 1)
    neg = rank < num_neg

    loss_c = jnp.sum(ce * (pos | neg))

    n = jnp.maximum(jnp.sum(num_pos).astype(jnp.float32), 1.0)
    return loss_l / n, loss_c / n
