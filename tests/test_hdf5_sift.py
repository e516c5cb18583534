"""Tests for the BlenderProc HDF5 data path, few-shot datasets, and the SIFT
hypothesis generator."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def render_world(tmp_path_factory):
    from ossid_code_tpu.data.synthetic import make_render_world

    root = str(tmp_path_factory.mktemp("render"))
    scenes_dir, grid_dir = make_render_world(root, n_scenes=4, n_grid_views=6)
    return root, scenes_dir, grid_dir


def test_load_hdf5_poses(render_world):
    from ossid_code_tpu.data.hdf5_render import load_hdf5, object_mask_from_segmap
    from ossid_code_tpu.utils.geometry import project_points_uv

    _, scenes_dir, _ = render_world
    data = load_hdf5(os.path.join(scenes_dir, "scene_0000.hdf5"))
    assert data["colors"].shape == (128, 160, 3)
    assert len(data["objects"]) == 2
    K = np.asarray(data["campose"][0]["cam_K"]).reshape(3, 3)
    for obj in data["objects"]:
        # the recovered obj2cam must project the object origin inside its mask
        mask = object_mask_from_segmap(data["segmap"], data["segcolormap"], obj["obj_id"])
        assert mask is not None and mask.sum() > 50
        uv = project_points_uv(obj["obj2cam"][None], np.zeros((1, 3)), K)[0, 0]
        ys, xs = mask.nonzero()
        assert xs.min() - 8 <= uv[0] <= xs.max() + 8
        assert ys.min() - 8 <= uv[1] <= ys.max() + 8


def test_process_render_grid(render_world):
    from ossid_code_tpu.data.hdf5_render import process_render_grid

    _, _, grid_dir = render_world
    out = process_render_grid(os.path.join(grid_dir, "1", "0000.hdf5"), output_size=(96, 96))
    assert out["image"].shape == (96, 96, 3)
    assert out["mask"].shape == (96, 96)
    assert 0.05 < out["mask"].mean() < 0.95
    assert out["obj_id"] == 1


def test_dtoid_render_dataset(render_world):
    from ossid_code_tpu.core.config import default_config
    from ossid_code_tpu.data.hdf5_render import DtoidRenderDataset, RenderGridTemplates
    import glob

    root, scenes_dir, grid_dir = render_world
    cfg = default_config().dataset
    cfg.shorter_length = 128
    cfg.heatmap_shorter_length = 7
    cfg.n_local_test = 4
    templates = RenderGridTemplates(grid_dir, template_size=96)
    scenes = sorted(glob.glob(os.path.join(scenes_dir, "*.hdf5")))
    ds = DtoidRenderDataset("train", scenes, templates, cfg)
    assert len(ds) == 8  # 4 scenes x 2 objects
    s = ds[0]
    assert s["img"].shape[2] == 3
    assert s["limg"].shape == (96, 96, 3)  # single template at train time
    assert s["bbox_gt"].shape == (1, 5)
    ds_test = DtoidRenderDataset("test", scenes, templates, cfg)
    st = ds_test[0]
    assert st["limg"].shape == (4, 96, 96, 3)


def test_render_dataset_episodes(render_world):
    from ossid_code_tpu.core.config import Config, default_config
    from ossid_code_tpu.data.hdf5_render import get_render_dataloaders
    import json

    root, scenes_dir, grid_dir = render_world
    cfg = default_config()
    cfg.dataset.dataset_root = scenes_dir
    cfg.dataset.shorter_length = 128
    cfg.dataset.k_support = 2
    cfg.train.batch_size = 2
    # with only 2 objects the 4/6-1/6-1/6 split leaves train empty; patch the
    # index so both objects train
    with open(os.path.join(scenes_dir, "object2files.json")) as f:
        obj2files = json.load(f)
    obj2files_big = {}
    for i in range(6):  # replicate ids so the split has content
        for oid, files in obj2files.items():
            obj2files_big[f"{oid}_{i}" if i else oid] = files
    # keep original ids only (the loader uses them to find objects)
    train_loader, valid_loaders, test_loader = get_render_dataloaders(cfg)
    total = len(train_loader.dataset) + sum(len(v.dataset) for v in valid_loaders) + len(
        test_loader.dataset
    )
    assert total == 8
    ds = [d for d in (train_loader.dataset, valid_loaders[0].dataset,
                      valid_loaders[1].dataset, test_loader.dataset) if len(d)][0]
    s = ds[0]
    assert s["simg"].shape[0] == 2
    assert s["img"].shape[2] == 3


def test_index_render_dataset(render_world):
    from ossid_code_tpu.scripts.index_render_dataset import index_render_dataset

    _, scenes_dir, _ = render_world
    idx = index_render_dataset(scenes_dir, min_pixels=50)
    assert set(idx.keys()) == {"1", "2"}
    assert all(len(v) == 4 for v in idx.values())


def test_fss1000(tmp_path, rng):
    import imageio.v2 as imageio
    from ossid_code_tpu.data.fewshot import FSS1000Dataset

    for cls in ("cat", "dog"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            imageio.imwrite(str(d / f"{i}.jpg"), rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
            m = np.zeros((64, 64), np.uint8)
            m[10:40, 10:40] = 255
            imageio.imwrite(str(d / f"{i}.png"), m)
    ds = FSS1000Dataset(str(tmp_path), k_shot=2, image_size=96)
    assert len(ds) == 6
    s = ds[0]
    assert s["img"].shape == (96, 96, 3)
    assert s["mask"].shape == (96, 96, 1)
    assert s["simg"].shape == (2, 96, 96, 3)
    assert s["class_name"] in ("cat", "dog")


def test_sift_hypo_generator(rng):
    """End-to-end: featurize a textured box's template grid, then recover its
    pose in a rendered scene from SIFT matches."""
    cv2 = pytest.importorskip("cv2")
    if not hasattr(cv2, "SIFT_create"):
        pytest.skip("no SIFT in this cv2 build")

    from ossid_code_tpu.render.mesh import Mesh, make_box_mesh, subdivide_mesh
    from ossid_code_tpu.render.rasterizer import render_depth
    from ossid_code_tpu.data.synthetic import make_template_grid
    from ossid_code_tpu.data.templates import TemplateDataset
    from ossid_code_tpu.hypo.sift import SiftFeatureModel, SiftHypoGen
    from ossid_code_tpu.eval.pose_metrics import adi_err
    from ossid_code_tpu.loop.online_learning import model_cloud_from_ply
    from scipy.spatial.transform import Rotation
    import tempfile

    # a box with high-frequency texture so SIFT finds keypoints: subdivide,
    # then jitter the per-vertex colors
    mesh = subdivide_mesh(make_box_mesh(120, 90, 60), 3)
    r2 = np.random.default_rng(7)
    mesh.colors = np.clip(mesh.colors + r2.uniform(-0.4, 0.4, mesh.colors.shape), 0, 1)

    tmp = tempfile.mkdtemp()
    make_template_grid(tmp, {1: mesh}, n_views=12, size=192)
    td = TemplateDataset(tmp, [1])

    verts_m = mesh.vertices / 1000.0
    diam = float(np.linalg.norm(verts_m.max(0) - verts_m.min(0)))
    fm = SiftFeatureModel().construct_from_templates(td, 1, view_dist=diam * 1.6)
    assert len(fm.descs) > 30

    K = np.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]])
    pose_gt = np.eye(4)
    pose_gt[:3, :3] = Rotation.from_euler("xyz", [10, -15, 20], degrees=True).as_matrix()
    pose_gt[:3, 3] = [0.01, -0.01, 0.5]
    depth, color = render_depth(verts_m, mesh.faces, K, pose_gt, 240, 320, colors=mesh.colors)
    img_u8 = (np.clip(color, 0, 1) * 255).astype(np.uint8)

    gen = SiftHypoGen(fm, K, n_hypos=10)
    poses = gen.match(img_u8, depth, depth > 0)
    pts_m, _, _ = model_cloud_from_ply(mesh)
    errs = [adi_err(p[:3, :3], p[:3, 3], pose_gt[:3, :3], pose_gt[:3, 3], pts_m) for p in poses]
    assert min(errs) < 0.02, f"best SIFT ADI {min(errs):.4f}"
