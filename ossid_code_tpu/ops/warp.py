"""Perspective warping on device (replaces the reference's kornia
warp_perspective usage, ref utils/homographies.py:15-48)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample_nhwc(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """img (H, W, C); u (cols), v (rows) float coords of arbitrary shape ->
    (..., C); zero padding outside the image."""
    h, w = img.shape[0], img.shape[1]
    inside = (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)
    u = jnp.clip(u, 0.0, w - 1.0)
    v = jnp.clip(v, 0.0, h - 1.0)
    u0 = jnp.clip(jnp.floor(u), 0, w - 2).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(v), 0, h - 2).astype(jnp.int32)
    du = jnp.clip(u - u0, 0.0, 1.0)[..., None]
    dv = jnp.clip(v - v0, 0.0, 1.0)[..., None]
    p00 = img[v0, u0]
    p01 = img[v0, u0 + 1]
    p10 = img[v0 + 1, u0]
    p11 = img[v0 + 1, u0 + 1]
    out = (
        p00 * (1 - du) * (1 - dv)
        + p01 * du * (1 - dv)
        + p10 * (1 - du) * dv
        + p11 * du * dv
    )
    return jnp.where(inside[..., None], out, 0.0)


def warp_perspective(img: jnp.ndarray, H: jnp.ndarray, out_hw=None) -> jnp.ndarray:
    """Warp (B, H, W, C) by homographies (B, 3, 3): output pixel (x, y) samples
    the source at H^-1 (x, y) — the same convention as kornia/cv2.warpPerspective."""
    b, h, w, c = img.shape
    oh, ow = out_hw or (h, w)
    Hinv = jnp.linalg.inv(H)
    ys, xs = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float32),
                          jnp.arange(ow, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(xs)
    grid = jnp.stack([xs, ys, ones], axis=-1)  # (oh, ow, 3), (x, y, 1)

    def warp_one(im, hi):
        src = jnp.einsum("ij,hwj->hwi", hi, grid)
        u = src[..., 0] / src[..., 2]
        v = src[..., 1] / src[..., 2]
        return bilinear_sample_nhwc(im, u, v)

    return jax.vmap(warp_one)(img, Hinv)
