"""Pallas TPU kernels for the hot per-frame ops.

`dw_corr3x3_pallas`: per-sample 3x3 depthwise cross-correlation — DTOID's
template-conditioning primitive (ops/conv.py depthwise_corr; ref
models/dtoid/network.py:186-192,365-371). XLA lowers the vmapped grouped conv
to VPU code with per-group overhead; this kernel expresses it directly as nine
shifted multiply-accumulates over the full feature map held in VMEM, one grid
step per batch element.

Used automatically by ops.conv.depthwise_corr on TPU when the padded map fits
VMEM (the detect-path correlation at (T, 29, 39, 640) does; the 240x320x64
stem correlation falls back to the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_corr_kernel(h: int, w: int, x_ref, k_ref, o_ref):
    acc = x_ref[0, 0:h, 0:w, :] * k_ref[0, 0, 0, :]
    for dy in range(3):
        for dx in range(3):
            if dy == 0 and dx == 0:
                continue
            acc += x_ref[0, dy : dy + h, dx : dx + w, :] * k_ref[0, dy, dx, :]
    o_ref[0] = acc


def _channel_block(h: int, w: int, c: int, dtype_bytes: int = 4,
                   budget_bytes: int = 12 * 1024 * 1024) -> int:
    """Largest channel block (multiple of 128, divisor of c) whose
    double-buffered in/out/acc footprint fits the scoped-VMEM budget."""
    for cb in (512, 384, 256, 128):
        if c % cb:
            continue
        per = (h + 2) * (w + 2) * cb * dtype_bytes
        # in + out blocks, x2 for grid pipelining double buffering, + acc
        if 5 * per < budget_bytes:
            return cb
    return 0


def dw_corr3x3_pallas(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """x (B, H, W, C); kernel (B, 3, 3, C) -> (B, H, W, C), padding=1.

    Grid (B, C/cb): depthwise correlation is channel-independent, so channels
    block freely and each grid step holds one (H+2, W+2, cb) window in VMEM.
    """
    b, h, w, c = x.shape
    cb = _channel_block(h, w, c)
    assert cb > 0, "caller must gate on dw_corr_fits_vmem"
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return pl.pallas_call(
        functools.partial(_dw_corr_kernel, h, w),
        grid=(b, c // cb),
        in_specs=[
            pl.BlockSpec((1, h + 2, w + 2, cb), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 3, cb), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, cb), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
    )(xp, kernel)


def pallas_available() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon") or any(
            d.platform == "tpu" for d in jax.devices()
        )
    except Exception:
        return False


def dw_corr_fits_vmem(h: int, w: int, c: int, dtype_bytes: int = 4) -> bool:
    return _channel_block(h, w, c, dtype_bytes) > 0
