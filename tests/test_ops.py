import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ossid_code_tpu import ops


def greedy_nms_np(boxes, scores, th):
    """Straightforward sequential greedy NMS (oracle)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            # iou
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a1 + a2 - inter, 1e-8) > th:
                suppressed[j] = True
    return sorted(keep)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nms_matches_greedy(rng, seed):
    r = np.random.default_rng(seed)
    n = 200
    ctr = r.uniform(50, 400, (n, 2))
    wh = r.uniform(10, 120, (n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], axis=1).astype(np.float32)
    scores = r.uniform(0, 1, n).astype(np.float32)

    keep_mask = np.asarray(ops.nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    got = sorted(np.nonzero(keep_mask)[0].tolist())
    want = greedy_nms_np(boxes, scores, 0.5)
    assert got == want


def test_nms_topk_shapes():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    s, b, idx, valid = ops.nms_topk(boxes, scores, 0.5, topk=5)
    assert s.shape == (5,) and b.shape == (5, 4) and idx.shape == (5,)
    assert np.asarray(valid).sum() == 2  # box 1 suppressed by box 0
    np.testing.assert_allclose(np.asarray(s[:2]), [0.9, 0.7])


def test_nms_valid_mask():
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.asarray([0.5, 0.9])
    valid = jnp.asarray([True, False])
    keep = np.asarray(ops.nms_fixed(boxes, scores, 0.5, valid=valid))
    # invalid high-score box must not suppress the valid one
    assert keep[0] and not keep[1]


def test_depthwise_corr_against_manual(rng):
    b, h, w, c, k = 2, 8, 8, 3, 3
    x = rng.normal(size=(b, h, w, c)).astype(np.float32)
    ker = rng.normal(size=(b, k, k, c)).astype(np.float32)
    out = np.asarray(ops.depthwise_corr(jnp.asarray(x), jnp.asarray(ker), padding=1))
    assert out.shape == (b, h, w, c)
    # manual cross-correlation at a single position
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    for bi in [0, 1]:
        for ci in [0, 2]:
            want = (xp[bi, 3:6, 4:7, ci] * ker[bi, :, :, ci]).sum()
            np.testing.assert_allclose(out[bi, 3, 4, ci], want, rtol=1e-4)


def test_max_pool_ceil_sizes():
    # SqueezeNet: 61 -> 30, 30 -> 15, 15 -> 7 with MaxPool(3, 2, ceil)
    for size, want in [(61, 30), (30, 15), (15, 7)]:
        x = jnp.zeros((1, size, size, 4))
        y = ops.max_pool_ceil(x, 3, 2, ceil_mode=True)
        assert y.shape[1] == want, (size, y.shape)
    # floor mode: 30 -> 14
    y = ops.max_pool_ceil(jnp.zeros((1, 30, 30, 4)), 3, 2, ceil_mode=False)
    assert y.shape[1] == 14


def test_max_pool_values(rng):
    x = rng.normal(size=(1, 5, 5, 1)).astype(np.float32)
    y = np.asarray(ops.max_pool_ceil(jnp.asarray(x), 3, 2, ceil_mode=True))
    assert y.shape == (1, 2, 2, 1)  # ceil((5-3)/2)+1 == 2
    np.testing.assert_allclose(y[0, 0, 0, 0], x[0, :3, :3, 0].max())
    np.testing.assert_allclose(y[0, 1, 1, 0], x[0, 2:5, 2:5, 0].max())
    # 6 -> ceil((6-3)/2)+1 = 3 with a partial last window (padded with -inf)
    x6 = np.arange(36, dtype=np.float32).reshape(1, 6, 6, 1)
    y6 = np.asarray(ops.max_pool_ceil(jnp.asarray(x6), 3, 2, ceil_mode=True))
    assert y6.shape == (1, 3, 3, 1)
    np.testing.assert_allclose(y6[0, 2, 2, 0], x6[0, 4:, 4:, 0].max())


def test_avg_pool_matches_torch_semantics(rng):
    x = rng.normal(size=(1, 7, 7, 2)).astype(np.float32)
    y = np.asarray(ops.avg_pool(jnp.asarray(x), 7))
    np.testing.assert_allclose(y[0, 0, 0], x[0].mean(axis=(0, 1)), rtol=1e-5)
    # AvgPool2d(kernel_size=2, stride=1): 30 -> 29 (densenet transition3 surgery)
    y = ops.avg_pool(jnp.zeros((1, 30, 30, 4)), 2, 1)
    assert y.shape == (1, 29, 29, 4)


def test_upsample_nearest():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = np.asarray(ops.upsample_nearest(x, 2))
    want = np.array([[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]], np.float32)
    np.testing.assert_array_equal(y[0, :, :, 0], want)


def test_resize_bilinear_halfpixel():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    y = np.asarray(ops.resize_bilinear(x, (2, 2)))
    # half-pixel downsample by 2 = average of 2x2 blocks
    np.testing.assert_allclose(y[0, :, :, 0], [[2.5, 4.5], [10.5, 12.5]], rtol=1e-5)


def test_fps_spread(rng):
    pts = rng.normal(size=(1, 128, 3)).astype(np.float32)
    idx = np.asarray(ops.farthest_point_sample(jnp.asarray(pts), 16))
    assert idx.shape == (1, 16)
    assert idx[0, 0] == 0
    assert len(set(idx[0].tolist())) == 16  # all distinct
    # first sampled point after seed is the farthest from point 0
    d = np.linalg.norm(pts[0] - pts[0, 0], axis=1)
    assert idx[0, 1] == d.argmax()


def test_ball_query(rng):
    centers = jnp.asarray([[[0.0, 0, 0]]])  # (1,1,3)
    pts = jnp.asarray([[[0.0, 0, 0], [0.05, 0, 0], [5.0, 0, 0], [0, 0.07, 0]]])
    idx = np.asarray(ops.ball_query(centers, pts, radius=0.1, nsample=3))
    assert idx.shape == (1, 1, 3)
    assert set(idx[0, 0].tolist()) == {0, 1, 3}
    # no point in radius -> zeros
    far = jnp.asarray([[[100.0, 0, 0]]])
    idx = np.asarray(ops.ball_query(far, pts, radius=0.1, nsample=3))
    assert (idx == 0).all()
    # fewer points than nsample -> pad with first hit
    idx = np.asarray(ops.ball_query(centers, pts, radius=0.06, nsample=4))
    assert idx[0, 0, 0] == 0 and idx[0, 0, 1] == 1
    assert idx[0, 0, 2] == 0 and idx[0, 0, 3] == 0


def test_rgb_to_hsv_matches_colorsys(rng):
    import colorsys

    rgb = rng.uniform(0, 1, (50, 3)).astype(np.float32)
    hsv = np.asarray(ops.rgb_to_hsv(jnp.asarray(rgb)))
    for i in range(50):
        want = colorsys.rgb_to_hsv(*rgb[i])
        np.testing.assert_allclose(hsv[i], want, atol=1e-5)


def test_gather_points(rng):
    pts = rng.normal(size=(2, 10, 4)).astype(np.float32)
    idx = np.array([[1, 3], [0, 9]])
    out = np.asarray(ops.gather_points(jnp.asarray(pts), jnp.asarray(idx)))
    np.testing.assert_array_equal(out[0, 0], pts[0, 1])
    np.testing.assert_array_equal(out[1, 1], pts[1, 9])


# ---------------------------------------------------------------- YUV420
def test_yuv420_roundtrip(rng):
    """pack_yuv420 -> on-device unpack reproduces RGB within chroma-subsample
    tolerance on smooth content, exactly what the transfer path relies on."""
    from ossid_code_tpu.ops.yuv import pack_yuv420, ship_rgb_yuv420

    # smooth gradient image (chroma subsampling is lossless-ish here)
    h, w = 32, 48
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([yy / h, xx / w, (yy + xx) / (h + w)], -1)
    img = (img * 255).astype(np.uint8)

    y, u, v = pack_yuv420(img)
    assert y.shape == (h, w) and u.shape == (h // 2, w // 2) and v.shape == (h // 2, w // 2)
    # wire payload is half the RGB size
    assert y.nbytes + u.nbytes + v.nbytes == img.nbytes // 2

    out = np.asarray(ship_rgb_yuv420(img))
    assert out.shape == img.shape and out.dtype == np.uint8
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 8, err.max()
    assert err.mean() < 2.0, err.mean()


def test_yuv420_pack_matches_numpy_fallback():
    """cv2 path and the pure-numpy fixed-point fallback agree (so CI without
    cv2 exercises the same wire format)."""
    from ossid_code_tpu.ops import yuv

    if yuv.cv2 is None:
        return
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 24, 3), np.uint8)
    y_cv, u_cv, v_cv = yuv.pack_yuv420(img)
    real_cv2 = yuv.cv2
    try:
        yuv.cv2 = None
        y_np, u_np, v_np = yuv.pack_yuv420(img)
    finally:
        yuv.cv2 = real_cv2
    assert np.abs(y_cv.astype(int) - y_np.astype(int)).max() <= 1
    assert np.abs(u_cv.astype(int) - u_np.astype(int)).max() <= 2
    assert np.abs(v_cv.astype(int) - v_np.astype(int)).max() <= 2
