"""Resize ops (NHWC), matching torch F.interpolate semantics where they appear
in the reference network (nearest upsampling in the seg decoder,
ref models/dtoid/network.py:354-357; bilinear align_corners=False for template
feature downsampling, :233,276)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample_nearest(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """Exact integer-factor nearest upsampling (pixel duplication)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest resize to target size with torch-style source indexing
    (src = floor(dst * in/out))."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    rows = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return x[:, rows][:, :, cols]


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize, half-pixel centers (== torch align_corners=False)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="linear", antialias=False)
