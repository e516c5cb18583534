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


# ------------------------------------------------------------- device pp_err
# The per-hypothesis diagnostic (ref online_learning.py:452) costs ~12 ms/frame
# of host numpy on the loop's single CPU core; on device it is two tiny
# einsums dispatched alongside Zephyr scoring and fetched with the scores.
_PP_JITS: dict = {}


def _pp_bucket(m: int) -> int:
    b = 16
    while b < m:
        b *= 2
    return b


def _get_pp_jits():
    if _PP_JITS:
        return _PP_JITS
    import jax
    import jax.numpy as jnp

    @jax.jit
    def add_j(poses, mat_gt, pts):
        q = pts @ mat_gt[:3, :3].T + mat_gt[:3, 3]
        p = jnp.einsum("mij,nj->mni", poses[:, :3, :3], pts) + poses[:, None, :3, 3]
        return jnp.linalg.norm(p - q[None], axis=2).mean(axis=1)

    @jax.jit
    def adi_j(poses, mat_gt, pts_q, pts):
        # closest-point distance via the |p|^2 + |q|^2 - 2 p.q matmul trick
        q = pts @ mat_gt[:3, :3].T + mat_gt[:3, 3]          # (N, 3)
        p = jnp.einsum("mij,nj->mni", poses[:, :3, :3], pts_q) + poses[:, None, :3, 3]
        d2 = (
            (p * p).sum(-1)[:, :, None]
            + (q * q).sum(-1)[None, None, :]
            - 2.0 * jnp.einsum("mnc,kc->mnk", p, q)
        )
        return jnp.sqrt(jnp.clip(d2.min(axis=2), 0.0)).mean(axis=1)

    _PP_JITS["add"] = add_j
    _PP_JITS["adi"] = adi_j
    return _PP_JITS


def pp_err_batch_async(poses, mat_gt, pts_dev, symmetric: bool = False,
                       pts_q_dev=None):
    """Dispatch the per-hypothesis ADD(-S) batch on device and start the async
    host copy. `pts_dev` is a device-resident model cloud (cache it across
    frames — re-uploading it would eat the h2d budget this exists to save).
    Returns a handle for `pp_err_fetch`. Pose count is padded to a pow-2
    bucket so the program compiles once per bucket."""
    import jax
    import jax.numpy as jnp

    poses = np.asarray(poses, np.float32)
    m = len(poses)
    mb = _pp_bucket(m)
    poses_p = np.tile(np.eye(4, dtype=np.float32), (mb, 1, 1))
    poses_p[:m] = poses
    jits = _get_pp_jits()
    if symmetric:
        out = jits["adi"](jnp.asarray(poses_p), jnp.asarray(np.asarray(mat_gt, np.float32)),
                          pts_q_dev if pts_q_dev is not None else pts_dev, pts_dev)
    else:
        out = jits["add"](jnp.asarray(poses_p), jnp.asarray(np.asarray(mat_gt, np.float32)),
                          pts_dev)
    if hasattr(out, "copy_to_host_async"):
        out.copy_to_host_async()
    return (out, m)


def pp_err_fetch(handle, fetched=None) -> np.ndarray:
    """`fetched` lets the caller batch this array into one jax.device_get with
    other pending outputs (each device_get call is a ~30 ms RPC on a
    remote-attached chip)."""
    import jax

    out, m = handle
    arr = fetched if fetched is not None else jax.device_get(out)
    return np.asarray(arr)[:m]
