"""Depth-based ICP pose refinement (host-side, scipy cKDTree).

Replaces `zephyr.utils.icp.icpRefinement` (SURVEY.md Z9/N8, Open3D C++):
point-to-point ICP between the model cloud at the predicted pose and the scene
cloud unprojected from depth around the predicted object region, with a
correspondence distance cap (`icp_max_dist`, the reference uses 0.01 m on
YCB-V, ref scripts/online_learning.py:473-480).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np
from scipy.spatial import cKDTree

from ossid_code_tpu.utils.geometry import depth2xyz, estimate_rigid_body_transform

_ICP_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libossid_icp.so")
_icp_lib = None


def _load_icp_lib():
    global _icp_lib
    if _icp_lib is None and os.path.exists(os.path.abspath(_ICP_LIB_PATH)):
        lib = ctypes.CDLL(os.path.abspath(_ICP_LIB_PATH))
        lib.icp_refine.restype = ctypes.c_double
        lib.icp_refine.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_double,
            ctypes.c_int,
        ]
        _icp_lib = lib
    return _icp_lib


def icp_refine_native(pose, model_points, scene_points, icp_max_dist=0.01,
                      coarse_start=0.04, max_iter=20):
    """C++ ICP (native/icp.cpp); returns (refined_pose, rms) or None if the
    library isn't built or refinement failed."""
    lib = _load_icp_lib()
    if lib is None:
        return None
    mp = np.ascontiguousarray(model_points, np.float64)
    sp = np.ascontiguousarray(scene_points, np.float64)
    p = np.ascontiguousarray(pose, np.float64).copy()
    err = lib.icp_refine(
        mp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(mp),
        sp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(sp),
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_double(icp_max_dist), ctypes.c_double(coarse_start),
        max_iter,
    )
    if err < 0:
        return None
    return p, float(err)


def icp_point_cloud(
    pose: np.ndarray,
    model_points: np.ndarray,
    scene_tree: "cKDTree",
    scene_points: np.ndarray,
    icp_max_dist: float = 0.01,
    max_iter: int = 20,
    tol: float = 1e-7,
    coarse_start: float | None = 0.04,
):
    """Point-to-point ICP of a model cloud (object frame) against a scene
    cloud, starting from `pose`. Returns (refined_pose, rms, inlier_fraction).

    The role of Halcon's DensePoseRefinement inside find_surface_model
    (SURVEY.md N1): PPF votes quantize rotation to the angle-bin width, so the
    top hypotheses need a local refinement before scoring. The correspondence
    cap anneals from `coarse_start` down to `icp_max_dist` so hypotheses a few
    cm off can still be pulled in."""
    cur = np.asarray(pose, np.float64).copy()
    model = np.asarray(model_points, np.float64)
    prev_err = np.inf
    err, frac = np.inf, 0.0
    start = max(coarse_start or icp_max_dist, icp_max_dist)
    for it in range(max_iter):
        cap = max(icp_max_dist, start * (0.7 ** it))
        # scene -> model correspondences: every scene point is a real
        # observation of the surface, so this direction is unbiased under
        # partial visibility (model -> scene drags occluded back faces onto
        # the visible surface)
        tm = model @ cur[:3, :3].T + cur[:3, 3]
        tree = cKDTree(tm)
        dist, idx = tree.query(scene_points, distance_upper_bound=cap)
        ok = np.isfinite(dist)
        frac = ok.mean()
        if ok.sum() < 10:
            return pose, np.inf, 0.0
        err = float(np.sqrt((dist[ok] ** 2).mean()))
        R, t = estimate_rigid_body_transform(tm[idx[ok]].T, scene_points[ok].T)
        delta = np.eye(4)
        delta[:3, :3] = R
        delta[:3, 3] = t[:, 0]
        cur = delta @ cur
        if abs(prev_err - err) < tol:
            break
        prev_err = err
    return cur, err, float(frac)


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
    from ossid_code_tpu.utils.geometry import depth2cloud

    scene = depth2cloud(depth, region, cam_K).astype(np.float64)
    if len(scene) < 30:
        return pose, np.inf
    if len(scene) > 2000:
        scene = scene[np.linspace(0, len(scene) - 1, 2000).round().astype(int)]

    model = np.asarray(model_points, np.float64)
    if len(model) > 500:
        model = model[np.linspace(0, len(model) - 1, 500).round().astype(int)]

    out = icp_refine_native(pose, model, scene, icp_max_dist=icp_max_dist,
                            coarse_start=icp_max_dist * 3, max_iter=max_iter)
    if out is not None:
        return out
    tree = cKDTree(scene)
    cur, err, _ = icp_point_cloud(
        pose, model, tree, scene, icp_max_dist=icp_max_dist, max_iter=max_iter,
        coarse_start=icp_max_dist * 3, tol=tol,
    )
    return cur, err
