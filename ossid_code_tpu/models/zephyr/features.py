"""Zephyr score-feature assembly, fully on device.

The reference delegates this to zephyr's C++/xtensor `ScoreDataset.getPointNetData`
(mode "HSVD_diff_uv_norm", SURVEY.md Z1/N2; call site ref
utils/zephyr_utils.py:28-35): for each pose hypothesis, project the sampled
model point cloud into the observed RGB-D frame and compare what the model
predicts against what the camera saw. Here the whole assembly is one jitted
fixed-shape computation batched over hundreds of hypotheses — unprojection,
projection, bilinear sampling, HSV conversion and differencing all fuse into a
single XLA program, so a frame costs one host->device transfer of
(img, depth, K, poses) and one device->host transfer of scores.

Per point features (DIM_POINT = 11), first 3 are centered camera-frame xyz
(the PointNet++ geometry channels):

  [0:3]  model point in camera frame, centered per hypothesis
  [3]    hue difference (circular, in [0, 0.5])
  [4]    saturation difference
  [5]    value difference
  [6]    depth difference (observed - projected), clipped to [-0.1, 0.1] m
  [7:9]  normalized image coordinates (u/W - 0.5, v/H - 0.5)
  [9]    cos(angle) between transformed normal and the viewing ray
  [10]   validity (inside image and observed depth > 0)

Exact numeric parity with zephyr's feature stack is not possible from the
reference repo (the implementation lives in the external zephyr C++ package);
this is a faithful re-design of the documented "HSVD_diff_uv_norm" mode, and
the scorer is trained/evaluated end-to-end against the same metrics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ossid_code_tpu.ops.color import rgb_to_hsv

DIM_POINT = 11


def filter_hypos_by_mask(model_points, cam_K, pose_hypos, mask, th: float = 0.5):
    """Keep hypotheses that project >= th of their model points inside `mask`
    (numpy host helper, interface of ref utils/zephyr_utils.py:49-71)."""
    import numpy as np

    poses = np.asarray(pose_hypos, np.float64)
    pts = np.asarray(model_points, np.float64)
    K = np.asarray(cam_K, np.float64)
    cam = np.einsum("mij,nj->mni", poses[:, :3, :3], pts) + poses[:, None, :3, 3]
    z = np.clip(cam[..., 2], 1e-9, None)
    u = (K[0, 0] * cam[..., 0] / z + K[0, 2]).round().astype(int)
    v = (K[1, 1] * cam[..., 1] / z + K[1, 2]).round().astype(int)
    h, w = mask.shape
    invalid = (u < 0) | (u >= w) | (v < 0) | (v >= h)
    u = np.clip(u, 0, w - 1)
    v = np.clip(v, 0, h - 1)
    inmask = np.asarray(mask, bool)[v, u]
    inmask[invalid] = False
    return inmask.mean(axis=1) > th


def bilinear_sample(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """img (H, W, C); u, v float pixel coords (...,) -> (..., C)."""
    h, w = img.shape[0], img.shape[1]
    u0 = jnp.clip(jnp.floor(u), 0, w - 2).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(v), 0, h - 2).astype(jnp.int32)
    du = jnp.clip(u - u0, 0.0, 1.0)[..., None]
    dv = jnp.clip(v - v0, 0.0, 1.0)[..., None]
    p00 = img[v0, u0]
    p01 = img[v0, u0 + 1]
    p10 = img[v0 + 1, u0]
    p11 = img[v0 + 1, u0 + 1]
    return (
        p00 * (1 - du) * (1 - dv)
        + p01 * du * (1 - dv)
        + p10 * (1 - du) * dv
        + p11 * du * dv
    )


def bilinear_sample_packed(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bitwise-equal to `bilinear_sample`, as ONE gather instead of four.

    The 2x2 tap neighborhood is pre-packed channel-wise into an (H, W, 4C)
    stack (edge-padded, so the clipped u0 <= W-2 taps match exactly), turning
    the four scattered 12-byte reads per sample into one contiguous 4C-wide
    row read — a much friendlier access pattern for the TPU gather lowering
    when the index count is large (M x N hypothesis-point samples)."""
    h, w, c = img.shape
    p = jnp.pad(img, ((0, 1), (0, 1), (0, 0)), mode="edge")
    packed = jnp.concatenate(
        [p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]], axis=-1)
    u0 = jnp.clip(jnp.floor(u), 0, w - 2).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(v), 0, h - 2).astype(jnp.int32)
    du = jnp.clip(u - u0, 0.0, 1.0)[..., None]
    dv = jnp.clip(v - v0, 0.0, 1.0)[..., None]
    q = packed[v0, u0]  # (..., 4C)
    p00, p01 = q[..., :c], q[..., c:2 * c]
    p10, p11 = q[..., 2 * c:3 * c], q[..., 3 * c:]
    return (
        p00 * (1 - du) * (1 - dv)
        + p01 * du * (1 - dv)
        + p10 * (1 - du) * dv
        + p11 * du * dv
    )


def assemble_score_features(
    img: jnp.ndarray,          # (H, W, 3) RGB [0, 1] (pre-blurred, ref zephyr_utils.py:13)
    depth: jnp.ndarray,        # (H, W) meters — or an (S, S) crop, see depth_origin
    cam_K: jnp.ndarray,        # (3, 3)
    model_points: jnp.ndarray,  # (N, 3) meters, object frame
    model_colors: jnp.ndarray,  # (N, 3) RGB [0, 1]
    model_normals: jnp.ndarray,  # (N, 3) object frame, unit
    poses: jnp.ndarray,        # (M, 4, 4) object -> camera
    depth_margin: float = 0.02,
    return_uv: bool = True,
    depth_origin: jnp.ndarray | None = None,  # (2,) [y0, x0] of the depth crop
    packed_sample: bool = False,  # single-gather bilinear taps (bit-identical;
    # 1.23-1.41x on the real chip — default ON via ZephyrModel, see module.py)
):
    """Returns (point_x (M, N, DIM_POINT), uv (M, N, 2) float,
    inconst_ratio (M,) percent of valid points violating observed free space).

    The free-space violation ratio reproduces the hypothesis pruning the
    reference applies via zephyr's `inconst_ratio_th` (ref
    scripts/online_learning.py:174-195 — th=100 effectively disables it on
    LM-O, th=10 prunes on YCB-V); here it is returned per hypothesis and
    thresholded by the caller instead of changing the array shapes.

    `depth` may be a fixed-size crop of the full frame with its top-left
    corner at `depth_origin` (full-frame pixel coords): the host->device link
    of a remote-attached chip is the throughput ceiling of the online loop,
    and hypotheses only sample depth around the detected region. Points
    projecting outside the crop are marked invalid, exactly like points
    outside the image. uv outputs and the [7:9] normalized-coordinate
    features stay in FULL-frame coordinates (img always is the full frame).
    """
    h, w = img.shape[0], img.shape[1]
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]

    p_cam = jnp.einsum("mij,nj->mni", R, model_points) + t[:, None, :]  # (M, N, 3)
    n_cam = jnp.einsum("mij,nj->mni", R, model_normals)

    z = p_cam[..., 2]
    safe_z = jnp.where(z > 1e-6, z, 1.0)
    u = cam_K[0, 0] * p_cam[..., 0] / safe_z + cam_K[0, 2]
    v = cam_K[1, 1] * p_cam[..., 1] / safe_z + cam_K[1, 2]

    inside = (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1) & (z > 1e-6)
    uc = jnp.clip(u, 0.0, w - 1.001)
    vc = jnp.clip(v, 0.0, h - 1.001)

    sample = bilinear_sample_packed if packed_sample else bilinear_sample
    obs_rgb = sample(img, uc, vc)                   # (M, N, 3)

    ch, cw = depth.shape
    if depth_origin is None:
        ud, vd = uc, vc
    else:
        y0 = depth_origin[0].astype(uc.dtype)
        x0 = depth_origin[1].astype(uc.dtype)
        inside = inside & (uc >= x0) & (uc <= x0 + (cw - 1)) & (vc >= y0) & (vc <= y0 + (ch - 1))
        ud = jnp.clip(uc - x0, 0.0, cw - 1.001)
        vd = jnp.clip(vc - y0, 0.0, ch - 1.001)
    obs_depth = sample(depth[..., None], ud, vd)[..., 0]

    obs_hsv = rgb_to_hsv(obs_rgb)
    mdl_hsv = rgb_to_hsv(jnp.broadcast_to(model_colors, p_cam.shape))

    dh = jnp.abs(obs_hsv[..., 0] - mdl_hsv[..., 0])
    dh = jnp.minimum(dh, 1.0 - dh)  # circular hue distance
    ds = jnp.abs(obs_hsv[..., 1] - mdl_hsv[..., 1])
    dv_ = jnp.abs(obs_hsv[..., 2] - mdl_hsv[..., 2])

    valid = inside & (obs_depth > 1e-6)
    ddiff = jnp.clip(obs_depth - z, -0.1, 0.1)

    # viewing-ray / normal angle (observability of the point)
    view = -p_cam / jnp.linalg.norm(p_cam, axis=-1, keepdims=True).clip(1e-6)
    cos_n = jnp.sum(view * n_cam, axis=-1)

    xyz_centered = p_cam - jnp.mean(p_cam, axis=1, keepdims=True)

    point_x = jnp.concatenate(
        [
            xyz_centered,
            dh[..., None],
            ds[..., None],
            dv_[..., None],
            jnp.where(valid, ddiff, 0.0)[..., None],
            (u / w - 0.5)[..., None],
            (v / h - 0.5)[..., None],
            cos_n[..., None],
            valid.astype(jnp.float32)[..., None],
        ],
        axis=-1,
    )

    # free-space violation: projected point noticeably in front of the
    # observed surface (the camera saw through where the model should be)
    violate = valid & (z < obs_depth - depth_margin)
    n_valid = jnp.clip(valid.sum(axis=1).astype(jnp.float32), 1.0)
    inconst_ratio = 100.0 * violate.sum(axis=1).astype(jnp.float32) / n_valid

    uv = jnp.stack([u, v], axis=-1) if return_uv else None
    return point_x, uv, inconst_ratio
