"""6D pose error metrics: ADD and ADD-S (interface of zephyr.utils.metrics.add/adi,
SURVEY.md Z6; call sites ref scripts/online_learning.py:336-339,452,482).

The `pred_add01d` success criterion is err < 0.1 * object diameter
(ref online_learning.py:578)."""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def add_err(R_pred, t_pred, R_gt, t_gt, model_points) -> float:
    """Average distance between corresponding transformed model points."""
    p = model_points @ np.asarray(R_pred).T + np.asarray(t_pred).reshape(1, 3)
    q = model_points @ np.asarray(R_gt).T + np.asarray(t_gt).reshape(1, 3)
    return float(np.linalg.norm(p - q, axis=1).mean())


def adi_err(R_pred, t_pred, R_gt, t_gt, model_points) -> float:
    """Average closest-point distance (symmetric objects)."""
    p = model_points @ np.asarray(R_pred).T + np.asarray(t_pred).reshape(1, 3)
    q = model_points @ np.asarray(R_gt).T + np.asarray(t_gt).reshape(1, 3)
    dist, _ = cKDTree(q).query(p)
    return float(dist.mean())


def object_diameter(model_points) -> float:
    """Max pairwise extent approximation via bounding-box diagonal upper bound
    refined by convex support points (exact enough for the 0.1d threshold)."""
    pts = np.asarray(model_points)
    if len(pts) > 1000:
        pts = pts[np.linspace(0, len(pts) - 1, 1000).round().astype(int)]
    d2 = 0.0
    # exact max pairwise distance over the (sub)sampled cloud
    from scipy.spatial.distance import pdist

    d2 = pdist(pts).max()
    return float(d2)


def add_err_batch(poses, mat_gt, model_points) -> np.ndarray:
    """Vectorized ADD over M pose hypotheses (ref online_learning.py:452
    computes this in a per-pose Python loop). poses (M, 4, 4)."""
    poses = np.asarray(poses, np.float32)
    q = model_points @ np.asarray(mat_gt)[:3, :3].T + np.asarray(mat_gt)[:3, 3]
    p = np.einsum("mij,nj->mni", poses[:, :3, :3], model_points) + poses[:, None, :3, 3]
    return np.linalg.norm(p - q[None], axis=2).mean(axis=1)


def adi_err_batch(poses, mat_gt, model_points, max_points: int = 1000) -> np.ndarray:
    """Vectorized ADD-S over M pose hypotheses: one KD-tree on the GT cloud,
    queried per hypothesis. Query points are subsampled to max_points for
    per-frame tractability (the per-hypothesis diagnostic, not the reported
    pred_err, which uses the full cloud via adi_err)."""
    poses = np.asarray(poses, np.float32)
    pts = np.asarray(model_points)
    if len(pts) > max_points:
        pts_q = pts[np.linspace(0, len(pts) - 1, max_points).round().astype(int)]
    else:
        pts_q = pts
    q = pts @ np.asarray(mat_gt)[:3, :3].T + np.asarray(mat_gt)[:3, 3]
    tree = cKDTree(q)
    p = np.einsum("mij,nj->mni", poses[:, :3, :3], pts_q) + poses[:, None, :3, 3]
    return np.asarray([tree.query(pm)[0].mean() for pm in p])
