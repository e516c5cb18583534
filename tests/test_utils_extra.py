import numpy as np
import pytest


def test_sample_homography_shape(rng):
    from ossid_code_tpu.utils.homographies import sample_homography

    H = sample_homography((120, 160), rng=np.random.default_rng(0))
    assert H.shape == (3, 3)
    np.testing.assert_allclose(H[2, 2], 1.0, atol=1e-6)


def test_sample_trans_3d_consistency(rng):
    """The returned homography must map projections of points consistently
    with the 3D transform on the anchor points."""
    from ossid_code_tpu.utils.homographies import sample_trans_3d
    from ossid_code_tpu.utils.geometry import depth2xyz, proj_cloud

    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
    depth = np.full((240, 320), 1.0, np.float32)
    xyz = depth2xyz(depth, K)
    H, TR, Tt = sample_trans_3d(xyz, K, rng=np.random.default_rng(1))
    assert H.shape == (3, 3) and TR.shape == (3, 3) and Tt.shape == (3, 1)
    # rotation is orthonormal
    np.testing.assert_allclose(TR @ TR.T, np.eye(3), atol=1e-4)


def test_sample_warp_pairs(rng):
    from ossid_code_tpu.utils.homographies import sample_warp
    from ossid_code_tpu.utils.geometry import depth2xyz

    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
    depth = np.full((240, 320), 1.0, np.float32)
    xyz = depth2xyz(depth, K)
    img = (np.random.default_rng(0).uniform(0, 255, (240, 320, 3))).astype(np.uint8)
    kpts, kpts_warp, H, TR, Tt = sample_warp(img, xyz, K, rng=np.random.default_rng(2))
    assert kpts.shape == kpts_warp.shape
    assert len(kpts) > 0
    # warped keypoints are inside the (downsampled) frame
    assert kpts_warp[:, 0].max() < 240 // 8 + 1


def test_warp_perspective_identity(rng):
    import jax.numpy as jnp
    from ossid_code_tpu.ops.warp import warp_perspective

    img = jnp.asarray(rng.uniform(0, 1, (1, 16, 20, 3)).astype(np.float32))
    out = warp_perspective(img, jnp.eye(3)[None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    # pure translation by 2 pixels right
    H = np.eye(3)
    H[0, 2] = 2.0
    out = np.asarray(warp_perspective(img, jnp.asarray(H)[None]))
    np.testing.assert_allclose(out[0, :, 2:, :], np.asarray(img)[0, :, :-2, :], atol=1e-5)


def test_augment_depth_map(rng):
    from ossid_code_tpu.utils.augmentation import augment_depth_map

    depth = np.ones((60, 80), np.float32)
    normals = np.zeros((60, 80, 3), np.float32)
    normals[..., 2] = 1.0
    normals[:10, :, 2] = 0.05  # grazing strip
    out = augment_depth_map(depth, normals, rng=np.random.default_rng(0))
    assert (out[:10] == 0).all()
    assert out.shape == depth.shape
    assert (depth == 1).all()  # input untouched


def test_sphere_sampling():
    from ossid_code_tpu.utils.sphere_sampling import sample_points, view_rotations

    pts = sample_points(subdiv=1)
    assert pts.shape[1] == 3
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-6)
    R = view_rotations(pts[:5])
    assert R.shape == (5, 3, 3)
    for r in R:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-8)


def test_match_metrics():
    from ossid_code_tpu.utils.metrics import match_precision, match_recall, obs_seg_iou

    # 2 keypoints + dustbin on each side; perfect prediction
    gt = np.zeros((1, 3, 3))
    gt[0, 0, 1] = 1
    gt[0, 1, 2] = 1  # kpt 1 unmatched (dustbin)
    scores = gt.copy()
    assert match_precision(scores, gt) == 1.0
    assert match_recall(scores, gt) == 1.0
    assert obs_seg_iou(np.ones((4, 4)), np.ones((4, 4))) == 1.0
    assert obs_seg_iou(np.zeros((4, 4)), np.ones((4, 4))) == 0.0


def test_vis_helpers(rng, tmp_path):
    from ossid_code_tpu.utils.vis import vis_bbox, vis_mask, plot_images

    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    ax = vis_bbox(img, pred_bbox=np.asarray([[2, 2, 20, 20]]), pred_score=np.asarray([0.9]),
                  gt_bbox=np.asarray([3, 3, 21, 21]))
    assert ax is not None
    vis_mask(img, (rng.uniform(0, 1, (32, 32)) > 0.5).astype(float))
    plot_images([img, img[..., 0]], ["a", "b"])
    import matplotlib.pyplot as plt

    plt.close("all")


def test_metric_logger_roundtrip(tmp_path):
    from ossid_code_tpu.utils.logging import MetricLogger, read_log

    p = str(tmp_path / "log.jsonl")
    ml = MetricLogger(p)
    ml.log(0, loss=1.5, iou=0.3)
    ml.log(1, loss=1.2, iou=0.4)
    ml.close()
    df = read_log(p)
    assert len(df) == 2
    assert df.loss.iloc[1] == 1.2


def test_metric_logger_tensorboard_roundtrip(tmp_path):
    """With tb_dir, MetricLogger writes TensorBoard event files that
    tflog2pandas (the reference's ref utils/tb.py:8-53 analog) reads back —
    the TB-based log-scraping workflow works against this framework."""
    pytest.importorskip("tensorboard")
    from ossid_code_tpu.utils.logging import MetricLogger, tflog2pandas

    tb = str(tmp_path / "tb")
    ml = MetricLogger(str(tmp_path / "log.jsonl"), tb_dir=tb)
    ml.log(0, loss=1.5, iou=0.3)
    ml.log(1, loss=1.2, iou=0.4)
    ml.close()
    df = tflog2pandas(tb)
    assert set(df.metric) == {"loss", "iou"}
    loss = df[df.metric == "loss"].sort_values("step")
    assert list(loss.step) == [0, 1]
    np.testing.assert_allclose(list(loss.value), [1.5, 1.2], rtol=1e-6)


def test_result_summary(tmp_path):
    import pickle
    from ossid_code_tpu.utils.logging import load_result, summarize_result

    rows = [
        {"obj_id": 1, "dtoid_iou": 0.7, "pred_iou_visib": 0.8, "pred_add01d": 1.0,
         "time_dtoid": 0.05, "pred_mask": np.ones((4, 4))},
        {"obj_id": 2, "dtoid_iou": 0.2, "pred_iou_visib": 0.4, "pred_add01d": 0.0,
         "time_dtoid": 0.07, "pred_mask": np.ones((4, 4))},
    ]
    p = str(tmp_path / "r.pkl")
    with open(p, "wb") as f:
        pickle.dump({"test_results": rows}, f)
    df = load_result(p)
    assert "pred_mask" not in df.columns  # arrays dropped from scalar frame
    s = summarize_result(p)
    assert s["dtoid_valid_iou_recall"] == 0.5
    assert s["add01d"] == 0.5


def test_resnet_blocks(rng):
    import jax
    import jax.numpy as jnp
    from ossid_code_tpu.models.layers import BasicBlock, Bottleneck

    x = jnp.asarray(rng.normal(size=(1, 8, 8, 16)).astype(np.float32))
    blk = BasicBlock(planes=32, stride=2)
    vars_ = jax.jit(lambda: blk.init(jax.random.PRNGKey(0), x, train=False))()
    y = blk.apply(vars_, x, train=False)
    assert y.shape == (1, 4, 4, 32)
    bt = Bottleneck(planes=8)
    vars_ = jax.jit(lambda: bt.init(jax.random.PRNGKey(0), x, train=False))()
    y = bt.apply(vars_, x, train=False)
    assert y.shape == (1, 8, 8, 32)


def test_ttt_sampler():
    from ossid_code_tpu.data.dtoid_bop import NumpyLoader

    class Toy:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return {"x": np.asarray([i])}

    loader = NumpyLoader(Toy(), batch_size=3, ttt_sampling=True)
    assert len(loader) == 4
    batches = list(loader)
    # every batch repeats one index batch_size times (ref TTTBatchSampler)
    for b in batches:
        assert b["x"].shape == (3, 1)
        assert (b["x"] == b["x"][0]).all()
    assert sorted(int(b["x"][0, 0]) for b in batches) == [0, 1, 2, 3]


def test_sort_target_by_image():
    from ossid_code_tpu.data.dtoid_bop import sort_target_by_image

    targets = [
        {"obj_id": 1, "scene_id": 0, "im_id": 0},
        {"obj_id": 2, "scene_id": 0, "im_id": 0},
        {"obj_id": 1, "scene_id": 0, "im_id": 1},
    ]
    out = sort_target_by_image(targets)
    assert out[(0, 0)] == [1, 2] and out[(0, 1)] == [1]


def test_filter_hypos_by_mask():
    from ossid_code_tpu.models.zephyr.features import filter_hypos_by_mask

    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    pts = np.random.default_rng(0).normal(0, 0.01, (50, 3))
    mask = np.zeros((64, 64), bool)
    mask[20:45, 20:45] = True
    inside = np.eye(4)
    inside[:3, 3] = [0, 0, 1.0]  # projects to image center (inside mask)
    outside = np.eye(4)
    outside[:3, 3] = [0.2, 0.2, 1.0]  # projects far off the mask
    keep = filter_hypos_by_mask(pts, K, np.stack([inside, outside]), mask)
    assert keep.tolist() == [True, False]
