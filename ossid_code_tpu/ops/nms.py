"""Fixed-shape greedy NMS for XLA/TPU.

Replaces the reference's torchvision.ops.nms C++/CUDA call
(ref models/dtoid/network.py:563, models/dtoid/utils.py:5-47) with a
jit-compatible formulation: compute the dense IoU matrix of the (pre-sorted)
top-K boxes, then iterate `keep[i] = not any(keep[j] and iou[j,i] > th, j < i)`
to its fixed point. Starting from all-kept, this converges to exactly the
sequential greedy-NMS solution in O(longest suppression chain) sweeps, with
each sweep one (K,K)·(K,) product on the MXU — no data-dependent shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def batched_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU, (N, 4) x (M, 4) -> (N, M); boxes are (x1, y1, x2, y2).

    Matches the reference formula incl. the 1e-8 union clamp
    (ref models/dtoid/loss.py:10-37).
    """
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    iw = jnp.minimum(a[:, None, 2], b[None, :, 2]) - jnp.maximum(a[:, None, 0], b[None, :, 0])
    ih = jnp.minimum(a[:, None, 3], b[None, :, 3]) - jnp.maximum(a[:, None, 1], b[None, :, 1])
    iw = jnp.clip(iw, 0.0)
    ih = jnp.clip(ih, 0.0)
    inter = iw * ih
    union = jnp.clip(area_a[:, None] + area_b[None, :] - inter, 1e-8)
    return inter / union


def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
              valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy NMS over K boxes; returns a boolean keep mask of shape (K,).

    boxes: (K, 4), scores: (K,) — need NOT be pre-sorted; suppression order is
    by descending score (ties broken by index), identical to torchvision nms.
    `valid` masks out padding boxes (treated as never kept).
    """
    k = boxes.shape[0]
    iou = batched_iou(boxes, boxes)

    # order[i] = rank of box i by descending score (stable)
    order = jnp.argsort(jnp.argsort(-scores, stable=True), stable=True)
    # adj[j, i]: box j precedes box i in score order and overlaps it enough
    precede = order[:, None] < order[None, :]
    adj = (iou > iou_threshold) & precede
    if valid is not None:
        adj = adj & valid[:, None]  # only valid boxes can suppress

    adj_f = adj.astype(jnp.float32)

    def body(state):
        keep, _ = state
        suppressed = (keep.astype(jnp.float32) @ adj_f) > 0.5
        new_keep = ~suppressed
        return new_keep, jnp.any(new_keep != keep)

    def cond(state):
        return state[1]

    keep0 = jnp.ones((k,), bool)
    keep, _ = jax.lax.while_loop(cond, body, (keep0, jnp.array(True)))
    if valid is not None:
        keep = keep & valid
    return keep


def nms_topk(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float, topk: int,
             valid: jnp.ndarray | None = None):
    """NMS then take the top-`topk` surviving boxes by score.

    Returns (scores, boxes, indices, keep_valid): fixed shapes (topk,), (topk, 4),
    (topk,), (topk,) — `keep_valid` marks entries that are real survivors
    (matches the `[:topk]` truncation at ref network.py:569-572).
    """
    keep = nms_fixed(boxes, scores, iou_threshold, valid=valid)
    masked_scores = jnp.where(keep, scores, -jnp.inf)
    k_eff = min(topk, boxes.shape[0])
    top_scores, top_idx = jax.lax.top_k(masked_scores, k_eff)
    if k_eff < topk:  # pad to the requested fixed size
        top_scores = jnp.pad(top_scores, (0, topk - k_eff), constant_values=-jnp.inf)
        top_idx = jnp.pad(top_idx, (0, topk - k_eff))
    keep_valid = jnp.isfinite(top_scores)
    top_scores = jnp.where(keep_valid, top_scores, 0.0)
    return top_scores, boxes[top_idx], top_idx, keep_valid
