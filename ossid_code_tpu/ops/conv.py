"""Convolution-adjacent ops: per-sample depthwise correlation and pooling.

All tensors are NHWC (TPU-native layout).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax


def depthwise_corr(x: jnp.ndarray, kernel: jnp.ndarray, padding: int = 0) -> jnp.ndarray:
    """Per-sample depthwise cross-correlation.

    x: (B, H, W, C); kernel: (B, kh, kw, C) — each batch element is correlated
    with its OWN kernel, channel-by-channel. This is the template-conditioning
    primitive of DTOID (`conv2d_dw_group`, ref models/dtoid/network.py:186-192,
    365-371), expressed as a vmapped grouped conv instead of the reference's
    batch->groups reshape trick.

    A pallas kernel exists for the 3x3/pad-1 case (ops/pallas_kernels.py) but
    measured SLOWER than XLA's grouped conv on v5e (1.56 vs 1.05 ms chained at
    (10, 29, 39, 640) — XLA's depthwise lowering is already good and runs the
    multiplies in bf16), so it is opt-in via OSSID_USE_PALLAS_CORR=1.
    """
    import os

    if (
        os.environ.get("OSSID_USE_PALLAS_CORR") == "1"
        and padding == 1 and kernel.shape[1] == 3 and kernel.shape[2] == 3
    ):
        from ossid_code_tpu.ops.pallas_kernels import (
            pallas_available, dw_corr_fits_vmem, dw_corr3x3_pallas,
        )

        if pallas_available() and dw_corr_fits_vmem(x.shape[1], x.shape[2], x.shape[3]):
            return dw_corr3x3_pallas(x, kernel)
    c = x.shape[-1]

    def one(xi, ki):
        return lax.conv_general_dilated(
            xi[None],
            ki[:, :, None, :],  # (kh, kw, 1, C): in_ch/group = 1, C groups
            window_strides=(1, 1),
            padding=[(padding, padding), (padding, padding)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )[0]

    return jax.vmap(one)(x, kernel)


def _pool_pad(size: int, k: int, s: int, ceil_mode: bool) -> int:
    if ceil_mode:
        out = math.ceil((size - k) / s) + 1
        # torch drops the last window if it would start beyond the input
        if (out - 1) * s >= size:
            out -= 1
    else:
        out = (size - k) // s + 1
    return max(0, (out - 1) * s + k - size)


def max_pool_ceil(x: jnp.ndarray, k: int, s: int, ceil_mode: bool = True) -> jnp.ndarray:
    """Max pool with torch-style ceil_mode (needed by the SqueezeNet backbone,
    which uses MaxPool2d(3, 2, ceil_mode=True)). Pads bottom/right with -inf."""
    h, w = x.shape[1], x.shape[2]
    ph = _pool_pad(h, k, s, ceil_mode)
    pw = _pool_pad(w, k, s, ceil_mode)
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, s, s, 1),
        padding=((0, 0), (0, ph), (0, pw), (0, 0)),
    )


def avg_pool(x: jnp.ndarray, k: int, s: int | None = None, padding: int = 0) -> jnp.ndarray:
    """Average pool, floor mode, count_include_pad=True (torch default)."""
    s = s or k
    summed = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, s, s, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
    return summed / float(k * k)
