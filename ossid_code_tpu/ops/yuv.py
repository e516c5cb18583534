"""YUV 4:2:0 image transport for the bandwidth-capped host->device link.

The online loop ships one 480x640x3 uint8 RGB frame per iteration (ref
online_learning.py:380-420 reads BOP RGB frames); on a remote-attached TPU
the h2d link (~16 MB/s measured) is the loop's throughput ceiling, and the
921 KB image is the largest single transfer. Packing to YUV 4:2:0 (BT.601
limited-range, the standard camera-sensor wire format) ships 1.5 bytes/px
instead of 3 — 461 KB — and a tiny jitted program reconstructs the uint8
RGB device array on-chip, so every downstream consumer (detection, zephyr
scoring) is unchanged.

Chroma subsampling loses only high-frequency color detail; the zephyr
scorer blurs the image in-graph before sampling (ref zephyr_utils.py:13)
and detection normalizes per-channel, so the effect on both is below
sensor noise. `pack_yuv420` / `unpack_yuv420_rgb` round-trip within
+-8/255 per channel away from chroma edges (tested).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

try:  # SIMD path; pure-numpy fallback keeps the op dependency-free
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def pack_yuv420(img_rgb_u8: np.ndarray):
    """(H, W, 3) uint8 RGB -> (y (H,W), u (H/2,W/2), v (H/2,W/2)) uint8.

    BT.601 limited range (cv2's I420 convention); chroma is decimated at the
    top-left pixel of each 2x2 block. H and W must be even (BOP frames are)."""
    h, w = img_rgb_u8.shape[:2]
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    if cv2 is not None:
        i420 = cv2.cvtColor(img_rgb_u8, cv2.COLOR_RGB2YUV_I420)  # (3H/2, W)
        y = i420[:h]
        u = i420[h : h + h // 4].reshape(h // 2, w // 2)
        v = i420[h + h // 4 :].reshape(h // 2, w // 2)
        return y, u, v
    r = img_rgb_u8[..., 0].astype(np.int32)
    g = img_rgb_u8[..., 1].astype(np.int32)
    b = img_rgb_u8[..., 2].astype(np.int32)
    # BT.601 limited range (cv2's I420 convention), 16-bit fixed point
    y = (16843 * r + 33030 * g + 6423 * b + (16 << 16) + 32768) >> 16
    # chroma is decimated at the top-left of each 2x2 block (cv2's choice)
    rd, gd, bd = r[0::2, 0::2], g[0::2, 0::2], b[0::2, 0::2]
    u = (-9699 * rd - 19071 * gd + 28770 * bd + (128 << 16) + 32768) >> 16
    v = (28770 * rd - 24117 * gd - 4653 * bd + (128 << 16) + 32768) >> 16
    return (
        np.clip(y, 0, 255).astype(np.uint8),
        np.clip(u, 0, 255).astype(np.uint8),
        np.clip(v, 0, 255).astype(np.uint8),
    )


def _unpack(y, u, v):
    """In-graph YUV420 -> (H, W, 3) uint8 RGB (nearest-neighbor chroma
    upsample — matches cv2's I420 decode within rounding)."""
    # BT.601 limited-range inverse (cv2 I420)
    yf = 1.164 * (y.astype(jnp.float32) - 16.0)
    # 2x nearest upsample of the quarter-res chroma planes
    uf = jnp.repeat(jnp.repeat(u.astype(jnp.float32), 2, 0), 2, 1) - 128.0
    vf = jnp.repeat(jnp.repeat(v.astype(jnp.float32), 2, 0), 2, 1) - 128.0
    r = yf + 1.596 * vf
    g = yf - 0.392 * uf - 0.813 * vf
    b = yf + 2.017 * uf
    rgb = jnp.stack([r, g, b], -1)
    return jnp.clip(jnp.round(rgb), 0.0, 255.0).astype(jnp.uint8)


_unpack_jit = jax.jit(_unpack)


def unpack_yuv420_rgb(y_dev, u_dev, v_dev):
    """Device YUV planes -> (H, W, 3) uint8 RGB device array (jitted)."""
    return _unpack_jit(y_dev, u_dev, v_dev)


@jax.jit
def _unpack_i420(buf):
    """(3H/2, W) uint8 I420 plane stack -> (H, W, 3) uint8 RGB. Shapes are
    static under jit, so the plane split is free slicing."""
    h = buf.shape[0] * 2 // 3
    w = buf.shape[1]
    y = buf[:h]
    u = buf[h : h + h // 4].reshape(h // 2, w // 2)
    v = buf[h + h // 4 :].reshape(h // 2, w // 2)
    return _unpack(y, u, v)


def pack_i420(img_rgb_u8: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 RGB -> (3H/2, W) uint8 single-buffer I420 plane stack
    (y, then u, then v — cv2's native cvtColor output layout)."""
    if cv2 is not None:
        return cv2.cvtColor(img_rgb_u8, cv2.COLOR_RGB2YUV_I420)
    h, w = img_rgb_u8.shape[:2]
    y, u, v = pack_yuv420(img_rgb_u8)
    return np.concatenate(
        [y, u.reshape(h // 4, w), v.reshape(h // 4, w)], axis=0
    )


def ship_rgb_yuv420(img_rgb_u8: np.ndarray):
    """Host RGB frame -> device uint8 RGB array via the 1.5 B/px wire format.

    Drop-in replacement for `jax.device_put(img)` on the transfer-bound
    link: packs on host (SIMD cvtColor), uploads ONE contiguous I420 buffer
    (three per-plane uploads cost three transfer RPC enqueues on the remote
    tunnel), and dispatches the on-chip unpack. The returned array is
    identical in shape/dtype to a direct upload, so callers are unchanged."""
    return _unpack_i420(jax.device_put(pack_i420(img_rgb_u8)))
