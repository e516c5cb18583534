import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ossid_code_tpu.models.zephyr.features import assemble_score_features, bilinear_sample, DIM_POINT
from ossid_code_tpu.models.zephyr.module import ZephyrModel, _bucket


def make_scene(rng, h=60, w=80):
    """Synthetic RGB-D scene: a colored square plate at z=1.0 in front of a
    far background, plus the matching model cloud."""
    K = np.array([[80.0, 0, w / 2], [0, 80.0, h / 2], [0, 0, 1]], np.float32)
    img = np.zeros((h, w, 3), np.float32) + 0.1
    depth = np.full((h, w), 2.0, np.float32)

    # plate: 0.5m x 0.5m at z=1 -> projects to 40x40 px centered
    gx, gy = np.meshgrid(np.linspace(-0.25, 0.25, 20), np.linspace(-0.25, 0.25, 20))
    pts = np.stack([gx.ravel(), gy.ravel(), np.zeros(400)], 1).astype(np.float32)
    colors = np.tile(np.array([[0.8, 0.2, 0.3]], np.float32), (400, 1))
    normals = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (400, 1))

    pose_gt = np.eye(4, dtype=np.float32)
    pose_gt[2, 3] = 1.0

    # rasterize the plate into the scene at the GT pose as a FILLED rectangle
    # (the plate spans x,y in [-0.25, 0.25] at z=1 -> u in [20, 60], v in [10, 50])
    img[10:51, 20:61] = colors[0]
    depth[10:51, 20:61] = 1.0
    return img, depth, K, pts, colors, normals, pose_gt


def test_bilinear_sample():
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4, 1))
    v = bilinear_sample(img, jnp.asarray([0.0, 1.5]), jnp.asarray([0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(v[0]), [0.0])
    np.testing.assert_allclose(np.asarray(v[1]), [5.5])  # between img[1,1]=5 and img[1,2]=6


def test_bilinear_sample_packed_bitwise(rng):
    from ossid_code_tpu.models.zephyr.features import bilinear_sample_packed

    img = jnp.asarray(rng.uniform(0, 1, (37, 53, 3)).astype(np.float32))
    u = jnp.asarray(rng.uniform(-2, 56, (4, 200)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-2, 40, (4, 200)).astype(np.float32))
    a = np.asarray(bilinear_sample(img, u, v))
    b = np.asarray(bilinear_sample_packed(img, u, v))
    np.testing.assert_array_equal(a, b)  # bit-identical incl. edge clamping


def test_feature_assembly_packed_bitwise(rng):
    img, depth, K, pts, colors, normals, pose_gt = make_scene(rng)
    poses = np.stack([pose_gt, pose_gt])
    poses[1, 0, 3] += 0.07
    args = (jnp.asarray(img), jnp.asarray(depth), jnp.asarray(K),
            jnp.asarray(pts), jnp.asarray(colors), jnp.asarray(normals),
            jnp.asarray(poses))
    ref = assemble_score_features(*args)
    packed = assemble_score_features(*args, packed_sample=True)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(packed[0]))
    np.testing.assert_array_equal(np.asarray(ref[2]), np.asarray(packed[2]))


def test_feature_assembly_discriminates(rng):
    img, depth, K, pts, colors, normals, pose_gt = make_scene(rng)
    pose_bad = pose_gt.copy()
    pose_bad[0, 3] += 0.2  # shifted: projects onto background
    poses = np.stack([pose_gt, pose_bad])

    point_x, uv, inconst = assemble_score_features(
        jnp.asarray(img), jnp.asarray(depth), jnp.asarray(K),
        jnp.asarray(pts), jnp.asarray(colors), jnp.asarray(normals), jnp.asarray(poses),
    )
    point_x = np.asarray(point_x)
    assert point_x.shape == (2, 400, DIM_POINT)

    # GT pose: tiny color and depth differences
    assert point_x[0, :, 3:6].mean() < 0.05
    assert np.abs(point_x[0, :, 6]).mean() < 0.01
    # bad pose: most points land on mismatched color/depth
    assert point_x[1, :, 3:6].mean() > 5 * point_x[0, :, 3:6].mean()
    assert np.abs(point_x[1, :, 6]).mean() > 0.02

    # free-space violation: bad pose floats in front of the 2m background
    inconst = np.asarray(inconst)
    assert inconst[0] < 15.0
    assert inconst[1] >= 30.0

    # uv of GT pose reprojects inside the plate region
    uv = np.asarray(uv)
    assert uv[0, :, 0].min() >= 19 and uv[0, :, 0].max() <= 61


def test_feature_assembly_depth_crop_equivalent(rng):
    """A depth crop covering the projected object yields bit-identical features
    to the full frame; points projecting OUTSIDE the crop become invalid."""
    img, depth, K, pts, colors, normals, pose_gt = make_scene(rng)
    pose_bad = pose_gt.copy()
    pose_bad[0, 3] += 0.2
    poses = jnp.asarray(np.stack([pose_gt, pose_bad]))
    argsf = (jnp.asarray(img), jnp.asarray(depth), jnp.asarray(K),
             jnp.asarray(pts), jnp.asarray(colors), jnp.asarray(normals), poses)
    full_x, full_uv, full_inc = assemble_score_features(*argsf)

    # crop [4:56, 12:80] contains the plate under BOTH poses (the +0.2m shift
    # pushes u out to 76; a u=76.0 sample needs depth columns through 77)
    y0, x0, s_h, s_w = 4, 12, 52, 68
    crop = depth[y0 : y0 + s_h, x0 : x0 + s_w]
    crop_x, crop_uv, crop_inc = assemble_score_features(
        jnp.asarray(img), jnp.asarray(crop), jnp.asarray(K),
        jnp.asarray(pts), jnp.asarray(colors), jnp.asarray(normals), poses,
        depth_origin=jnp.asarray([y0, x0], jnp.int32),
    )
    np.testing.assert_array_equal(np.asarray(full_x), np.asarray(crop_x))
    np.testing.assert_array_equal(np.asarray(full_uv), np.asarray(crop_uv))
    np.testing.assert_array_equal(np.asarray(full_inc), np.asarray(crop_inc))

    # a crop that misses the plate invalidates every point
    tiny = depth[0:8, 0:8]
    tiny_x, _, _ = assemble_score_features(
        jnp.asarray(img), jnp.asarray(tiny), jnp.asarray(K),
        jnp.asarray(pts), jnp.asarray(colors), jnp.asarray(normals), poses,
        depth_origin=jnp.asarray([0, 0], jnp.int32),
    )
    assert np.asarray(tiny_x)[..., 10].sum() == 0.0


def test_scorer_depth_crop_end_to_end(rng):
    """ZephyrModel.score_hypotheses with a depth crop + origin reproduces the
    full-frame scores (the loop's --zephyr_depth_crop path)."""
    img, depth, K, pts, colors, normals, pose_gt = make_scene(rng)
    poses = np.stack([pose_gt] + [pose_gt @ _small_perturb(rng) for _ in range(7)])
    zm = ZephyrModel(num_points=64, inconst_ratio_th=100.0, seed=0)
    base = {"img": img, "depth": depth, "cam_K": K, "model_points": pts,
            "model_colors": colors, "model_normals": normals, "pose_hypos": poses}
    out_full = zm.score_hypotheses(dict(base), obj_id=1)
    y0, x0 = 4, 12
    crop = depth[y0 : y0 + 52, x0 : x0 + 64]
    out_crop = zm.score_hypotheses(
        dict(base, depth=crop, depth_origin=np.asarray([y0, x0], np.int32)), obj_id=1
    )
    np.testing.assert_allclose(out_full["scores"], out_crop["scores"], rtol=1e-5, atol=1e-6)
    assert out_full["pred_idx"] == out_crop["pred_idx"]


def _small_perturb(rng):
    from scipy.spatial.transform import Rotation

    m = np.eye(4)
    m[:3, :3] = Rotation.from_rotvec(rng.normal(0, 0.05, 3)).as_matrix()
    m[:3, 3] = rng.normal(0, 0.01, 3)
    return m


def test_feature_xyz_centered(rng):
    img, depth, K, pts, colors, normals, pose_gt = make_scene(rng)
    point_x, _, _ = assemble_score_features(
        jnp.asarray(img), jnp.asarray(depth), jnp.asarray(K),
        jnp.asarray(pts), jnp.asarray(colors), jnp.asarray(normals),
        jnp.asarray(pose_gt[None]),
    )
    np.testing.assert_allclose(np.asarray(point_x)[0, :, :3].mean(0), 0.0, atol=1e-5)


def test_bucket():
    assert _bucket(1) == 64
    assert _bucket(64) == 64
    assert _bucket(65) == 128
    assert _bucket(500) == 512


def test_zephyr_score_pipeline(rng):
    img, depth, K, pts, colors, normals, pose_gt = make_scene(rng)
    model = ZephyrModel(num_points=128, inconst_ratio_th=30.0, seed=0)
    poses = np.concatenate([pose_gt[None], np.stack([pose_gt] * 4)])
    poses[1, 0, 3] += 0.2  # violates free space -> must be masked to -inf
    poses[2, 2, 3] += 0.05
    out = model.score_hypotheses({
        "img": img, "depth": depth, "cam_K": K,
        "model_points": pts, "model_colors": colors, "model_normals": normals,
        "pose_hypos": poses,
    })
    assert out["scores"].shape == (5,)
    assert np.isneginf(out["scores"][1])
    assert np.isfinite(out["scores"][0])
    assert out["pred_pose"].shape == (4, 4)
    assert 0 <= out["pred_idx"] < 5


def test_zephyr_training_learns(rng):
    """The scorer should learn to separate good from bad hypotheses on a toy
    distribution where the depth-diff channel is discriminative."""
    model = ZephyrModel(num_points=64, seed=1)
    r = np.random.default_rng(0)

    def batch(n=32):
        x = r.normal(0, 0.1, (n, 64, DIM_POINT)).astype(np.float32)
        labels = (r.uniform(size=n) > 0.5).astype(np.float32)
        # good hypos: near-zero depth diff; bad: large
        x[:, :, 6] = np.where(labels[:, None] > 0, 0.0, 0.08 + r.normal(0, 0.01, (n, 64)))
        valid = np.ones(n, bool)
        return x, labels, valid

    first = model.train_step(*batch(), seed=0)
    # 60 steps: the listwise ranking term (rank_weight) converges slower than
    # plain BCE on this toy distribution
    for i in range(60):
        last = model.train_step(*batch(), seed=i + 1)
    assert last < first
    assert last < 0.4


def test_align_stat_and_rank_blend(rng, monkeypatch):
    """align_stat is 1.0-ish for the GT pose (every valid point depth- and
    hue-aligned), much lower for a shifted pose; OSSID_RANK_BLEND re-picks by
    the blended rank while pred_score stays the NET score of the pick
    (gate calibration unchanged) — scripts/ab_rank_blend.py measured the blend
    0.583 -> 0.67-0.68 pick ADD<0.1d on the hard world."""
    img, depth, K, pts, colors, normals, pose_gt = make_scene(rng)
    bad = pose_gt.copy()
    bad[2, 3] += 0.04  # depth-misaligned but inside the image
    poses = np.stack([pose_gt, bad])
    data = {"img": img, "depth": depth, "cam_K": K, "model_points": pts,
            "model_colors": colors, "model_normals": normals,
            "pose_hypos": poses}

    model = ZephyrModel(num_points=128, inconst_ratio_th=100.0, seed=0)
    out = model.score_hypotheses(data)
    assert out["align_stat"].shape == (2,)
    assert out["align_stat"][0] > 0.9, out["align_stat"]
    assert out["align_stat"][1] < 0.5 * out["align_stat"][0], out["align_stat"]

    # force the net to prefer the bad hypothesis; the blend must override it
    monkeypatch.setenv("OSSID_RANK_BLEND", "4.0")
    blended = ZephyrModel(num_points=128, inconst_ratio_th=100.0, seed=0)
    assert blended.rank_blend == 4.0
    scores = np.array([5.0, 9.0], np.float32)  # net prefers idx 1
    stats = np.array([0.95, 0.1], np.float32)  # geometry prefers idx 0
    assert blended._pick(scores, stats) == 0
    assert model._pick(scores, stats) == 1  # lam=0 -> pure net argmax
    # -inf (pruned) entries never win the blend
    scores2 = np.array([-np.inf, 1.0, 2.0], np.float32)
    stats2 = np.array([1.0, 0.9, 0.1], np.float32)
    assert blended._pick(scores2, stats2) == 1

    out_b = blended.score_hypotheses(data)
    # pred_score is the net score of the picked index, not the blend value
    assert out_b["pred_score"] == pytest.approx(
        float(out_b["scores"][out_b["pred_idx"]]))
