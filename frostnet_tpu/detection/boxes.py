"""Box geometry + SSD prior matching, fully vectorized and jittable.

TPU-native re-design of Object_Detection/layers/box_utils.py: the reference
matches priors to ground truth with a per-image Python loop on CPU inside
the loss (multibox_loss.py:67-74 — flagged as a hot-loop bottleneck in
SURVEY.md §3.3). Here matching is a batched, fixed-shape computation (padded
GT boxes + validity mask) that vmaps over the batch and runs on device.

Conventions match the reference: point-form boxes (x1,y1,x2,y2) in [0,1],
center-form priors (cx,cy,w,h), variance encoding (0.1, 0.2).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def point_form(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx,cy,w,h) -> (x1,y1,x2,y2)."""
    return jnp.concatenate(
        [boxes[..., :2] - boxes[..., 2:] / 2, boxes[..., :2] + boxes[..., 2:] / 2], -1)


def center_form(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x1,y1,x2,y2) -> (cx,cy,w,h)."""
    return jnp.concatenate(
        [(boxes[..., :2] + boxes[..., 2:]) / 2, boxes[..., 2:] - boxes[..., :2]], -1)


def intersect(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection area, (A,4),(B,4) -> (A,B)."""
    max_xy = jnp.minimum(box_a[:, None, 2:], box_b[None, :, 2:])
    min_xy = jnp.maximum(box_a[:, None, :2], box_b[None, :, :2])
    wh = jnp.clip(max_xy - min_xy, 0.0)
    return wh[..., 0] * wh[..., 1]


def jaccard(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU, (A,4),(B,4) -> (A,B)."""
    inter = intersect(box_a, box_b)
    area_a = (box_a[:, 2] - box_a[:, 0]) * (box_a[:, 3] - box_a[:, 1])
    area_b = (box_b[:, 2] - box_b[:, 0]) * (box_b[:, 3] - box_b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def encode(matched: jnp.ndarray, priors: jnp.ndarray, variances=(0.1, 0.2)) -> jnp.ndarray:
    """Point-form matched GT -> variance-encoded offsets vs center-form priors
    (box_utils.py:115-136)."""
    g_cxcy = (matched[..., :2] + matched[..., 2:]) / 2 - priors[..., :2]
    g_cxcy = g_cxcy / (variances[0] * priors[..., 2:])
    g_wh = (matched[..., 2:] - matched[..., :2]) / priors[..., 2:]
    g_wh = jnp.log(jnp.maximum(g_wh, 1e-12)) / variances[1]
    return jnp.concatenate([g_cxcy, g_wh], -1)


def decode(loc: jnp.ndarray, priors: jnp.ndarray, variances=(0.1, 0.2)) -> jnp.ndarray:
    """Offsets -> point-form boxes (box_utils.py:139-159)."""
    cxcy = priors[..., :2] + loc[..., :2] * variances[0] * priors[..., 2:]
    wh = priors[..., 2:] * jnp.exp(loc[..., 2:] * variances[1])
    return jnp.concatenate([cxcy - wh / 2, cxcy + wh / 2], -1)


def match_priors(
    truths: jnp.ndarray,      # (G, 4) point-form, zero-padded
    labels: jnp.ndarray,      # (G,) 0-based class ids, padded arbitrarily
    valid: jnp.ndarray,       # (G,) bool mask of real boxes
    priors: jnp.ndarray,      # (P, 4) center-form
    threshold: float = 0.5,
    variances=(0.1, 0.2),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-image prior matching (box_utils.py:71-113), fixed-shape.

    Returns (loc_targets (P,4), conf_targets (P,) with 0 = background,
    1..C = labels+1). vmap over the batch for the batched version.
    """
    overlaps = jaccard(truths, point_form(priors))          # (G, P)
    overlaps = jnp.where(valid[:, None], overlaps, -1.0)

    best_prior_idx = jnp.argmax(overlaps, axis=1)           # (G,)
    best_truth_overlap = jnp.max(overlaps, axis=0)          # (P,)
    best_truth_idx = jnp.argmax(overlaps, axis=0)           # (P,)

    # force-match each GT's best prior (overlap := 2, truth idx := that GT)
    g = truths.shape[0]
    prior_ids = jnp.arange(priors.shape[0])
    for_gt = jnp.where(valid, best_prior_idx, -1)
    best_truth_overlap = jnp.where(
        jnp.any(prior_ids[:, None] == for_gt[None, :], axis=1), 2.0, best_truth_overlap)
    # later GTs win ties, matching the reference's sequential overwrite loop
    gt_order = jnp.arange(g)
    claimed = jnp.where(prior_ids[:, None] == for_gt[None, :], gt_order[None, :], -1)
    claim_idx = jnp.max(claimed, axis=1)
    best_truth_idx = jnp.where(claim_idx >= 0, claim_idx, best_truth_idx)

    matches = truths[best_truth_idx]                        # (P, 4)
    conf = labels[best_truth_idx] + 1
    conf = jnp.where(best_truth_overlap < threshold, 0, conf)
    loc = encode(matches, priors, variances)
    return loc, conf.astype(jnp.int32)


batched_match_priors = jax.vmap(match_priors, in_axes=(0, 0, 0, None, None, None))
