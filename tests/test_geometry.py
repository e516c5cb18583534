import numpy as np
import pytest

from ossid_code_tpu.utils import geometry as G
from ossid_code_tpu.utils import image as I


def test_depth2xyz_roundtrip(rng):
    K = np.array([[500.0, 0, 320], [0, 480.0, 240], [0, 0, 1]])
    depth = rng.uniform(0.5, 2.0, (480, 640)).astype(np.float32)
    xyz = G.depth2xyz(depth, K)
    assert xyz.shape == (480, 640, 3)
    # z channel is the depth itself
    np.testing.assert_allclose(xyz[..., 2], depth, rtol=1e-6)
    # projecting the cloud back lands on the original pixel grid
    pts = xyz.reshape(-1, 3)
    rc = G.proj_cloud(pts, K)
    vv, uu = np.meshgrid(np.arange(480), np.arange(640), indexing="ij")
    np.testing.assert_allclose(rc[:, 0], vv.ravel(), atol=1e-3)
    np.testing.assert_allclose(rc[:, 1], uu.ravel(), atol=1e-3)


def test_depth2cloud_mask():
    K = np.eye(3)
    K[0, 0] = K[1, 1] = 100.0
    depth = np.ones((4, 4), dtype=np.float32)
    mask = np.zeros((4, 4), bool)
    mask[1, 2] = True
    cloud = G.depth2cloud(depth, mask, K)
    assert cloud.shape == (1, 3)
    np.testing.assert_allclose(cloud[0], [2 / 100, 1 / 100, 1.0], atol=1e-6)


def test_project_points_uv_identity():
    K = np.array([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]])
    pts = np.array([[0.0, 0.0, 1.0], [0.1, -0.2, 2.0]])
    pose = np.eye(4)[None]
    uv = G.project_points_uv(pose, pts, K)
    assert uv.shape == (1, 2, 2)
    np.testing.assert_array_equal(uv[0, 0], [50, 40])
    np.testing.assert_array_equal(uv[0, 1], [55, 30])


def test_kabsch_recovers_transform(rng):
    R_gt = G.quat2mat(rng.normal(size=4) / np.linalg.norm(rng.normal(size=4)))
    # use a proper random rotation
    from scipy.spatial.transform import Rotation

    R_gt = Rotation.random(random_state=3).as_matrix()
    t_gt = rng.normal(size=(3, 1))
    P = rng.normal(size=(3, 50))
    Q = R_gt @ P + t_gt
    R, t = G.estimate_rigid_body_transform(P, Q)
    np.testing.assert_allclose(R, R_gt, atol=1e-8)
    np.testing.assert_allclose(t, t_gt, atol=1e-8)


def test_quat_angular_diff():
    from scipy.spatial.transform import Rotation

    q1 = Rotation.from_euler("z", [[0], [90]], degrees=True).as_quat()
    q2 = Rotation.from_euler("z", [[0], [45]], degrees=True).as_quat()
    d = G.quat_angular_diff_batch(q1, q2)
    assert d.shape == (2, 2)
    np.testing.assert_allclose(d[0, 0], 0.0, atol=1e-3)
    np.testing.assert_allclose(d[0, 1], np.pi / 4, atol=1e-3)
    np.testing.assert_allclose(d[1, 0], np.pi / 2, atol=1e-3)


def test_expand_box_clipping():
    out = G.expand_box(10, 10, 20, 20, 100, 100, 2.0)
    assert out == (5.0, 5.0, 25.0, 25.0)
    out = G.expand_box(0, 0, 60, 60, 50, 50, 2.0)
    assert out[0] == 0 and out[1] == 0 and out[2] == 49 and out[3] == 49


def test_heatmap_gaussian_peak():
    hm = G.heatmap_gaussian(29, 39, 10.0, 20.0, sigma=np.sqrt(1.5))
    assert hm.shape == (29, 39)
    assert hm[20, 10] == pytest.approx(1.0)
    assert hm.max() == pytest.approx(1.0)


def test_robust_crop_padding():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    crop = G.robust_crop(img, -1, 3, -1, 3)
    assert crop.shape == (4, 4)
    assert crop[0, 0] == 0  # padded
    assert crop[1, 1] == img[0, 0]


def test_process_data_shapes(rng):
    img = (rng.uniform(0, 255, (480, 640, 3))).astype(np.uint8)
    mask = np.zeros((480, 640), np.float32)
    mask[100:200, 150:300] = 1.0
    depth = rng.uniform(0.5, 2.0, (480, 640)).astype(np.float32)
    K = np.array([[572.4, 0, 325.2], [0, 573.5, 242.0], [0, 0, 1]])

    out = I.process_data(img, mask, depth, K, keep_aspect_ratio=True, shorter_length=480)
    assert out["img"].shape == (480, 640, 3)
    assert out["mask"].shape == (480, 640, 1)
    assert out["xyz"].shape == (480, 640, 3)
    assert out["img"].max() <= 1.0

    out2 = I.process_data(img, mask, depth, K, keep_aspect_ratio=False, shorter_length=224)
    assert out2["img"].shape == (224, 224, 3)
    # intrinsics rescaled: fx by W ratio, fy by H ratio
    np.testing.assert_allclose(out2["cam_K"][0, 0], K[0, 0] * 224 / 640, rtol=1e-5)
    np.testing.assert_allclose(out2["cam_K"][1, 1], K[1, 1] * 224 / 480, rtol=1e-5)


def test_mask_to_bbox():
    m = np.zeros((10, 10))
    assert G.mask_to_bbox(m) is None
    m[2:5, 3:7] = 1
    assert G.mask_to_bbox(m) == (3.0, 2.0, 6.0, 4.0)


def test_config_roundtrip(tmp_path):
    from ossid_code_tpu.core.config import default_config, Config

    cfg = default_config()
    assert cfg.model.lam_seg == 20.0
    cfg2 = cfg.merged({"model": {"lam_seg": 5.0}, "exp_name": "x"})
    assert cfg2.model.lam_seg == 5.0 and cfg.model.lam_seg == 20.0
    p = tmp_path / "c.yaml"
    cfg2.save(str(p))
    cfg3 = Config.load(str(p))
    assert cfg3.model.lam_seg == 5.0
    assert cfg3.dataset.n_local_test == 10


def test_depth_im_to_dist_im():
    """dist = depth * ||ray||; center pixel is unchanged, corners grow
    (bop_toolkit depth_im_to_dist_im_fast semantics, SURVEY B1)."""
    from ossid_code_tpu.utils.geometry import depth_im_to_dist_im

    K = np.array([[100.0, 0, 20], [0, 100.0, 10], [0, 0, 1]])
    depth = np.full((21, 41), 2.0, np.float32)
    dist = depth_im_to_dist_im(depth, K)
    np.testing.assert_allclose(dist[10, 20], 2.0, rtol=1e-6)
    # pixel (0,0): ray = [(0-20)/100, (0-10)/100, 1] -> norm = sqrt(.04+.01+1)
    np.testing.assert_allclose(dist[0, 0], 2.0 * np.sqrt(1.05), rtol=1e-6)
    assert (dist >= depth - 1e-6).all()


def test_model_shifts_roundtrip(tmp_path):
    from ossid_code_tpu.utils.geometry import load_model_shifts, shift_model_points
    import json

    p = tmp_path / "shifts.json"
    p.write_text(json.dumps({"3": [0.01, -0.02, 0.005]}))
    shifts = load_model_shifts(str(p))
    assert set(shifts) == {3}
    pts = np.zeros((4, 3), np.float32)
    out = shift_model_points(pts, shifts[3])
    np.testing.assert_allclose(out, np.tile([[0.01, -0.02, 0.005]], (4, 1)), rtol=1e-6)
