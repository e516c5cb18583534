"""Batched point-to-point ICP as a pure-XLA device program.

Role: Halcon's DensePoseRefinement / Open3D ICP in the reference stack
(ref scripts/online_learning.py:442-447,473-480; SURVEY.md N8). The host C++
ICP costs 5-10 ms PER refined hypothesis on this machine's single host core,
which made quality (refine_top=20-30) and throughput mutually exclusive
(VERDICT r2 weak #4). Here all K hypotheses refine together as one fixed-shape
einsum chain that rides the scoring program's existing uploads (depth crop +
poses), so refinement costs single-digit milliseconds ON DEVICE and zero extra
host<->device transfers.

TPU mapping:
  * correspondence search is a dense (K, P, S) distance matrix built from one
    (K*P, 3) x (3, S) matmul (MXU) + an argmin reduction — no KD-tree, no
    data-dependent shapes;
  * invalid scene points (depth holes, outside the crop) are pushed to +1e9 so
    they never win the argmin and fall outside the max_dist gate;
  * the per-hypothesis weighted Kabsch solve is a batched (K, 3, 3) SVD;
  * hypotheses with fewer than `min_corr` gated correspondences keep their
    pose unchanged for that iteration (degenerate-solve guard).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1e9


def kabsch_batched(P, Q, w, min_corr: int = 4):
    """Weighted rigid alignment P -> Q.

    P, Q: (K, N, 3); w: (K, N) weights in [0, 1]. Returns (R (K,3,3),
    t (K,3), ok (K,) bool) minimizing sum_i w_i |R p_i + t - q_i|^2; ok is
    False where fewer than min_corr points carry weight (R,t are identity/zero
    there)."""
    wsum = jnp.clip(w.sum(-1, keepdims=True), 1e-6)
    mu_p = (P * w[..., None]).sum(1) / wsum
    mu_q = (Q * w[..., None]).sum(1) / wsum
    Pc = (P - mu_p[:, None]) * w[..., None]
    Qc = Q - mu_q[:, None]
    H = jnp.einsum("kni,knj->kij", Pc, Qc)
    U, _, Vt = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vt, -1, -2)
    UT = jnp.swapaxes(U, -1, -2)
    d = jnp.linalg.det(jnp.einsum("kij,kjl->kil", V, UT))
    D = jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d], -1)
    R = jnp.einsum("kij,kj,kjl->kil", V, D, UT)
    t = mu_q - jnp.einsum("kij,kj->ki", R, mu_p)
    ok = w.sum(-1) >= min_corr
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    R = jnp.where(ok[:, None, None], R, eye)
    t = jnp.where(ok[:, None], t, 0.0)
    return R, t, ok


def batched_icp(poses, model_pts, scene_pts, scene_valid,
                max_dist: float = 0.01, iters: int = 8, model_normals=None):
    """Refine K pose hypotheses against one scene cloud.

    poses (K, 4, 4) object->camera; model_pts (P, 3) object frame;
    scene_pts (S, 3) camera frame with scene_valid (S,) bool masking holes.
    model_normals (P, 3, optional): outward object-frame normals — when given,
    back-facing (self-occluded) model points are dropped from the solve. A
    depth camera only sees the front surface, so without this gate occluded
    points latch onto it within max_dist and bias the pose.
    Returns refined poses (K, 4, 4). Pure jnp — call under jit."""
    sp = jnp.where(scene_valid[:, None], scene_pts, _BIG)
    sp2 = (sp * sp).sum(-1)

    def body(poses, gate):
        R = poses[:, :3, :3]
        t = poses[:, :3, 3]
        p = jnp.einsum("kij,nj->kni", R, model_pts) + t[:, None]
        d2 = (
            (p * p).sum(-1)[..., None]
            + sp2[None, None, :]
            - 2.0 * jnp.einsum("kni,si->kns", p, sp)
        )
        nn = jnp.argmin(d2, axis=-1)
        dmin = jnp.take_along_axis(d2, nn[..., None], -1)[..., 0]
        q = sp[nn]
        w = (dmin < gate * gate).astype(p.dtype)
        if model_normals is not None:
            n_cam = jnp.einsum("kij,nj->kni", R, model_normals)
            w = w * (jnp.sum(n_cam * p, axis=-1) < 0.0).astype(p.dtype)
        Rd, td, ok = kabsch_batched(p, q, w)
        R_new = jnp.einsum("kij,kjl->kil", Rd, R)
        t_new = jnp.einsum("kij,kj->ki", Rd, t) + td
        new = poses
        new = new.at[:, :3, :3].set(jnp.where(ok[:, None, None], R_new, R))
        new = new.at[:, :3, 3].set(jnp.where(ok[:, None], t_new, t))
        return new, None

    # annealed correspondence gate (2x -> 1x max_dist): wide early iterations
    # pull in distant starts, tight late ones stop outliers from biasing
    gates = jnp.linspace(2.0 * max_dist, max_dist, iters)
    poses, _ = jax.lax.scan(body, poses, gates)
    return poses


def sample_valid_points(depth, cam_K, origin=None, k: int = 4096,
                        with_normals: bool = False):
    """Depth map (or crop) -> k camera-frame points picked pseudo-randomly
    from the VALID (depth > 0) pixels at full pixel resolution.

    Strided-grid sampling floors ICP accuracy at ~stride/2 pixels of surface
    spacing; selecting k of the valid pixels keeps full resolution on the
    object surface at the same fixed shape. Selection uses a fixed per-pixel
    Knuth multiplicative hash + top_k — deterministic, shape-static, no PRNG
    key plumbing. Returns (points (k, 3), valid (k,)) or, with_normals,
    (points, normals (k, 3) camera-facing, valid) — points whose normal
    cannot be estimated (depth edges/holes) are marked invalid."""
    pts, ok = unproject_depth_grid(depth, cam_K, origin=origin, stride=1)
    n = pts.shape[0]
    h = jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761)
    r = (h >> jnp.uint32(8)).astype(jnp.float32) / float(1 << 24)
    score = jnp.where(ok, 1.0 + r, r)
    _, idx = jax.lax.top_k(score, min(k, n))
    if not with_normals:
        return pts[idx], ok[idx]
    hh, ww = depth.shape
    grid = pts.reshape(hh, ww, 3)
    okg = ok.reshape(hh, ww)
    pad = lambda a: jnp.pad(a, [(1, 1), (1, 1)] + [(0, 0)] * (a.ndim - 2), mode="edge")
    g = pad(grid)
    o = pad(okg[..., None])[..., 0]
    du = g[1:-1, 2:] - g[1:-1, :-2]
    dv = g[2:, 1:-1] - g[:-2, 1:-1]
    nrm = jnp.cross(du, dv)
    nrm = nrm / jnp.clip(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
    # orient toward the camera
    nrm = jnp.where((jnp.sum(nrm * grid, -1) > 0)[..., None], -nrm, nrm)
    n_ok = okg & o[1:-1, 2:] & o[1:-1, :-2] & o[2:, 1:-1] & o[:-2, 1:-1]
    return pts[idx], nrm.reshape(-1, 3)[idx], (ok & n_ok.reshape(-1))[idx]


def _rodrigues(omega):
    """(K, 3) axis-angle -> (K, 3, 3) rotation matrices."""
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True).clip(1e-12)
    ax = omega / theta
    th = theta[..., None]
    zeros = jnp.zeros_like(ax[..., 0])
    Kx = jnp.stack([
        jnp.stack([zeros, -ax[..., 2], ax[..., 1]], -1),
        jnp.stack([ax[..., 2], zeros, -ax[..., 0]], -1),
        jnp.stack([-ax[..., 1], ax[..., 0], zeros], -1),
    ], -2)
    eye = jnp.broadcast_to(jnp.eye(3), Kx.shape)
    return eye + jnp.sin(th) * Kx + (1 - jnp.cos(th)) * (Kx @ Kx)


def batched_icp_plane(poses, model_pts, scene_pts, scene_normals, scene_valid,
                      max_dist: float = 0.01, iters: int = 8, model_normals=None):
    """Point-to-PLANE variant of batched_icp: each iteration solves the
    linearized 6x6 normal equations per hypothesis (the classic fast-ICP
    formulation) — converges well below the depth-pixel footprint where
    point-to-point stalls at ~half a pixel of surface spacing.

    scene_normals (S, 3): camera-facing surface normals (from
    sample_valid_points(with_normals=True)). Other args as batched_icp."""
    sp = jnp.where(scene_valid[:, None], scene_pts, _BIG)
    sp2 = (sp * sp).sum(-1)
    sn = jnp.asarray(scene_normals)
    model_pts = jnp.asarray(model_pts)
    poses = jnp.asarray(poses)

    def body(poses, gate):
        R = poses[:, :3, :3]
        t = poses[:, :3, 3]
        p = jnp.einsum("kij,nj->kni", R, model_pts) + t[:, None]
        d2 = (
            (p * p).sum(-1)[..., None]
            + sp2[None, None, :]
            - 2.0 * jnp.einsum("kni,si->kns", p, sp)
        )
        nn = jnp.argmin(d2, axis=-1)
        dmin = jnp.take_along_axis(d2, nn[..., None], -1)[..., 0]
        q = sp[nn]
        nq = sn[nn]
        w = (dmin < gate * gate).astype(p.dtype)
        if model_normals is not None:
            n_cam = jnp.einsum("kij,nj->kni", R, model_normals)
            w = w * (jnp.sum(n_cam * p, axis=-1) < 0.0).astype(p.dtype)
        resid = jnp.sum(nq * (p - q), -1)  # (K, N)
        A = jnp.concatenate([jnp.cross(p, nq), nq], -1)  # (K, N, 6)
        Aw = A * w[..., None]
        AtA = jnp.einsum("kni,knj->kij", Aw, A)
        # Levenberg damping: near-planar correspondence sets leave sliding
        # directions unconstrained and the raw solve steps unboundedly
        diag = jnp.diagonal(AtA, axis1=-2, axis2=-1).mean(-1)
        AtA = AtA + (1e-3 * diag + 1e-9)[:, None, None] * jnp.eye(6)
        Atb = jnp.einsum("kni,kn->ki", Aw, -resid)
        x = jnp.linalg.solve(AtA, Atb[..., None])[..., 0]  # (K, 6): [omega, v]
        # trust region: cap the per-iteration step (0.2 rad / 20 mm)
        wn = jnp.linalg.norm(x[:, :3], axis=-1)
        vn = jnp.linalg.norm(x[:, 3:], axis=-1)
        s = jnp.minimum(1.0, jnp.minimum(0.2 / wn.clip(1e-12), 0.02 / vn.clip(1e-12)))
        x = x * s[:, None]
        ok = w.sum(-1) >= 6
        Rd = _rodrigues(x[:, :3])
        td = x[:, 3:]
        R_new = jnp.einsum("kij,kjl->kil", Rd, R)
        t_new = jnp.einsum("kij,kj->ki", Rd, t) + td
        new = poses
        new = new.at[:, :3, :3].set(jnp.where(ok[:, None, None], R_new, R))
        new = new.at[:, :3, 3].set(jnp.where(ok[:, None], t_new, t))
        return new, None

    gates = jnp.linspace(2.0 * max_dist, max_dist, iters)
    poses, _ = jax.lax.scan(body, poses, gates)
    return poses


def unproject_depth_grid(depth, cam_K, origin=None, stride: int = 1):
    """Depth map (or crop) -> strided camera-frame point cloud.

    depth (H, W) meters; cam_K (3, 3) FULL-frame intrinsics; origin (2,)
    [y0, x0] of the crop in full-frame pixels (None = full frame). Returns
    (points (S, 3), valid (S,)) with S = ceil(H/stride)*ceil(W/stride) —
    static for static input shapes."""
    d = depth[::stride, ::stride]
    h, w = d.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=d.dtype) * stride,
        jnp.arange(w, dtype=d.dtype) * stride,
        indexing="ij",
    )
    if origin is not None:
        yy = yy + origin[0].astype(d.dtype)
        xx = xx + origin[1].astype(d.dtype)
    z = d
    X = (xx - cam_K[0, 2]) * z / cam_K[0, 0]
    Y = (yy - cam_K[1, 2]) * z / cam_K[1, 1]
    pts = jnp.stack([X, Y, z], -1).reshape(-1, 3)
    return pts, (z > 1e-6).reshape(-1)
