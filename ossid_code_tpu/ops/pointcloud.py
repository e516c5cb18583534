"""Point-cloud ops for the PointNet++ scorer, as dense XLA ops.

The reference depends on the PointNet2 CUDA extensions (furthest-point
sampling, ball query, grouping) through `zephyr.models.pointnet2.PointNet2SSG`
(SURVEY.md §2.3 N3). On TPU these become dense fixed-shape computations:
pairwise distance matrices ride the MXU and gathers stay on-device — no custom
CUDA needed.

All functions are batched over a leading axis and jit-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 3) x (..., M, 3) -> (..., N, M) squared distances via the MXU."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    cross = jnp.einsum("...nd,...md->...nm", a, b)
    return jnp.clip(a2 - 2.0 * cross + jnp.swapaxes(b2, -1, -2), 0.0)


def farthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Furthest-point sampling. xyz: (B, N, 3) -> indices (B, npoint).

    Deterministic: starts from point 0 (like the CUDA kernel). O(npoint * N)
    with vectorized distance updates.
    """
    b, n, _ = xyz.shape

    def per_batch(pts):
        def body(i, state):
            dists, idxs, last = state
            d = jnp.sum((pts - pts[last]) ** 2, axis=-1)
            dists = jnp.minimum(dists, d)
            nxt = jnp.argmax(dists)
            idxs = idxs.at[i].set(nxt)
            return dists, idxs, nxt

        dists0 = jnp.full((n,), jnp.inf)
        idxs0 = jnp.zeros((npoint,), jnp.int32)
        _, idxs, _ = jax.lax.fori_loop(1, npoint, body, (dists0, idxs0, jnp.int32(0)))
        return idxs

    return jax.vmap(per_batch)(xyz)


def ball_query(centers: jnp.ndarray, xyz: jnp.ndarray, radius: float, nsample: int) -> jnp.ndarray:
    """For each center, indices of up to `nsample` points within `radius`.

    centers: (B, S, 3); xyz: (B, N, 3) -> (B, S, nsample) int32. Points beyond
    the radius are replaced by the first in-radius point (CUDA ball_query
    semantics: pad by repeating the first hit; if none, index 0).
    """
    d2 = pairwise_sqdist(centers, xyz)  # (B, S, N)
    inside = d2 <= radius * radius
    n = xyz.shape[1]
    # rank in-radius points by index order: take the first nsample by masking
    # distance order with a large offset for out-of-radius points
    order_key = jnp.where(inside, jnp.arange(n, dtype=jnp.float32)[None, None, :], jnp.inf)
    _, idx = jax.lax.top_k(-order_key, nsample)  # smallest index first
    has_any = jnp.any(inside, axis=-1, keepdims=True)
    # out-of-radius slots: count of valid picks per row
    picked_valid = jnp.take_along_axis(inside, idx, axis=-1)
    first = idx[..., :1]
    idx = jnp.where(picked_valid, idx, first)
    idx = jnp.where(has_any, idx, 0)
    return idx.astype(jnp.int32)


def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points: (B, N, C); idx: (B, ...) -> (B, ..., C)."""
    return jax.vmap(lambda p, i: p[i])(points, idx)
