"""Fixed-shape NMS + test-time detection decode.

Replaces torchvision.ops.nms / the pure-python NMS
(Object_Detection/layers/box_utils.py:175, layers/functions/detection.py:32-80)
with a masked O(K^2) greedy suppression over the top-K candidates — static
shapes, fori_loop, fully jittable on TPU.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import decode


def nms_fixed(
    boxes: jnp.ndarray,     # (N, 4) point-form
    scores: jnp.ndarray,    # (N,)
    iou_threshold: float = 0.45,
    top_k: int = 200,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over the top_k highest-scoring boxes.

    Returns (boxes (top_k,4), scores (top_k,), keep mask (top_k,)) ordered by
    score; suppressed entries have keep=False.
    """
    k = min(top_k, scores.shape[0])
    top_scores, idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[idx]

    x1, y1, x2, y2 = (top_boxes[:, i] for i in range(4))
    area = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-12)

    def body(i, keep):
        # suppress j>i overlapping i, if i is still kept
        sup = (iou[i] > iou_threshold) & (jnp.arange(k) > i) & keep[i]
        return keep & ~sup

    keep = jax.lax.fori_loop(0, k, body, jnp.ones((k,), bool))
    keep = keep & (top_scores > 0)
    return top_boxes, top_scores, keep


def detect(
    loc_pred: jnp.ndarray,    # (B, P, 4)
    conf_pred: jnp.ndarray,   # (B, P, C) softmax scores
    priors: jnp.ndarray,      # (P, 4)
    conf_thresh: float = 0.01,
    nms_thresh: float = 0.45,
    top_k: int = 200,
    variances=(0.1, 0.2),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Test-time decode (layers/functions/detection.py:32-80): per class,
    threshold scores, NMS, fill a fixed (B, C, top_k, 5) output of
    (score, x1, y1, x2, y2). Class 0 is background and left empty.
    """
    num_classes = conf_pred.shape[-1]

    def per_image(loc, conf):
        boxes = decode(loc, priors, variances)  # (P, 4)

        def per_class(c_scores):
            s = jnp.where(c_scores > conf_thresh, c_scores, 0.0)
            b, sc, keep = nms_fixed(boxes, s, nms_thresh, top_k)
            sc = jnp.where(keep, sc, 0.0)
            return jnp.concatenate([sc[:, None], b], axis=1)  # (top_k, 5)

        out = jax.vmap(per_class)(conf.T[1:])                 # (C-1, top_k, 5)
        return jnp.concatenate(
            [jnp.zeros((1, out.shape[1], 5), out.dtype), out], axis=0)

    return jax.vmap(per_image)(loc_pred, conf_pred)
