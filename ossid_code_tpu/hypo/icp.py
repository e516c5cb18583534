"""Depth-based ICP pose refinement (host-side, scipy cKDTree).

Replaces `zephyr.utils.icp.icpRefinement` (SURVEY.md Z9/N8, Open3D C++):
point-to-point ICP between the model cloud at the predicted pose and the scene
cloud unprojected from depth around the predicted object region, with a
correspondence distance cap (`icp_max_dist`, the reference uses 0.01 m on
YCB-V, ref scripts/online_learning.py:473-480).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

from ossid_code_tpu.utils.geometry import depth2xyz, estimate_rigid_body_transform


def icp_refinement(
    depth: np.ndarray,
    uv: np.ndarray,
    pose: np.ndarray,
    cam_K: np.ndarray,
    model_points: np.ndarray,
    icp_max_dist: float = 0.01,
    max_iter: int = 30,
    tol: float = 1e-6,
):
    """Refine `pose` (4, 4, meters) against the observed depth.

    uv: (N, 2) integer pixel coords (u=col, v=row) of the model points under
    `pose` — used to crop the relevant scene region (mirrors the reference
    passing `uv_original[pred_idx]`).

    Returns (refined_pose, final_rms_error). Falls back to the input pose when
    there are too few correspondences.
    """
    h, w = depth.shape
    uv = np.asarray(uv)
    u1, v1 = uv.min(axis=0)
    u2, v2 = uv.max(axis=0)
    pad = max(10, int(0.2 * max(u2 - u1, v2 - v1)))
    u1, v1 = max(0, int(u1) - pad), max(0, int(v1) - pad)
    u2, v2 = min(w, int(u2) + pad), min(h, int(v2) + pad)
    if u2 <= u1 or v2 <= v1:
        return pose, np.inf

    region = np.zeros_like(depth, dtype=bool)
    region[v1:v2, u1:u2] = True
    region &= depth > 0
    scene = depth2xyz(depth, cam_K)[region]
    if len(scene) < 30:
        return pose, np.inf

    tree = cKDTree(scene)
    cur = np.asarray(pose, np.float64).copy()
    model = np.asarray(model_points, np.float64)
    if len(model) > 2000:
        model = model[np.linspace(0, len(model) - 1, 2000).round().astype(int)]

    prev_err = np.inf
    err = np.inf
    for _ in range(max_iter):
        src = model @ cur[:3, :3].T + cur[:3, 3]
        dist, idx = tree.query(src, distance_upper_bound=icp_max_dist)
        ok = np.isfinite(dist)
        if ok.sum() < 10:
            return pose, np.inf
        err = float(np.sqrt((dist[ok] ** 2).mean()))
        R, t = estimate_rigid_body_transform(src[ok].T, scene[idx[ok]].T)
        delta = np.eye(4)
        delta[:3, :3] = R
        delta[:3, 3] = t[:, 0]
        cur = delta @ cur
        if abs(prev_err - err) < tol:
            break
        prev_err = err
    return cur, err
