import os

import numpy as np
import pytest

from ossid_code_tpu.render.mesh import make_box_mesh, make_icosphere, save_ply, load_ply
from ossid_code_tpu.render.rasterizer import render_depth, Renderer
from ossid_code_tpu.render.visib import estimate_visib_mask_gt
from ossid_code_tpu.utils.geometry import K2meta


K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])


def test_ply_roundtrip(tmp_path):
    mesh = make_box_mesh(80, 60, 40)
    p = str(tmp_path / "box.ply")
    save_ply(p, mesh)
    loaded = load_ply(p)
    np.testing.assert_allclose(loaded.vertices, mesh.vertices, atol=1e-4)
    np.testing.assert_array_equal(loaded.faces, mesh.faces)
    assert loaded.colors is not None
    np.testing.assert_allclose(loaded.colors, mesh.colors, atol=2 / 255)


def test_render_depth_box():
    mesh = make_box_mesh(100, 100, 100)  # mm
    pose = np.eye(4)
    pose[2, 3] = 0.5
    depth = render_depth(mesh.vertices / 1000.0, mesh.faces, K, pose, 240, 320)
    # front face at z = 0.45, 0.1m wide -> ~66 px
    mask = depth > 0
    assert mask.sum() > 3000
    front = depth[mask].min()
    np.testing.assert_allclose(front, 0.45, atol=0.005)
    # box projected center is filled
    assert depth[120, 160] == pytest.approx(0.45, abs=0.005)
    # outside is empty
    assert depth[5, 5] == 0


def test_render_sphere_depth_profile():
    mesh = make_icosphere(50, subdiv=2)  # 50mm radius
    pose = np.eye(4)
    pose[2, 3] = 0.6
    depth = render_depth(mesh.vertices / 1000.0, mesh.faces, K, pose, 240, 320)
    center = depth[120, 160]
    assert center == pytest.approx(0.55, abs=0.01)
    # depth increases toward the silhouette
    ring = depth[120, 160 + 20]
    assert ring > center


def test_renderer_interface(tmp_path):
    mesh = make_box_mesh(100, 80, 60)
    p = str(tmp_path / "obj.ply")
    save_ply(p, mesh)
    r = Renderer(K2meta(K), img_h=240, img_w=320)
    pose = np.eye(4)
    pose[2, 3] = 0.5
    r.addObject(1, p, pose=pose, mm2m=True)
    color, depth = r.render(depth_only=True)
    assert depth.shape == (240, 320) and (depth > 0).any()
    # move the object and re-render (the online loop's update pattern)
    pose2 = pose.copy()
    pose2[0, 3] = 0.05
    r.obj_nodes[1].matrix = pose2
    _, depth2 = r.render(depth_only=True)
    c1 = np.argwhere(depth > 0).mean(0)
    c2 = np.argwhere(depth2 > 0).mean(0)
    assert c2[1] > c1[1] + 10  # moved right


def test_decimate_vertex_clustering_preserves_surface():
    """The simplify path must decimate (collapse clusters), not drop faces:
    the rendered depth of the decimated mesh must stay hole-free and cover
    ~the same silhouette as the full mesh (ADVICE r1, medium — face
    subsampling produced mostly-holes masks on dense BOP meshes)."""
    from scipy import ndimage
    from ossid_code_tpu.render.rasterizer import decimate_vertex_clustering

    mesh = make_icosphere(0.05, subdiv=4)  # 5120 faces
    v, f = np.asarray(mesh.vertices), np.asarray(mesh.faces)
    v2, f2 = decimate_vertex_clustering(v, f, target_faces=1500)
    assert 200 < len(f2) <= 1500
    assert len(v2) < len(v)

    K = np.array([[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1]])
    pose = np.eye(4)
    pose[2, 3] = 0.4
    d_full = render_depth(v, f, K, pose, 120, 160)
    d_dec = render_depth(v2, f2, K, pose, 120, 160)
    m_full, m_dec = d_full > 0, d_dec > 0
    # hole-free interior
    holes = ndimage.binary_fill_holes(m_dec) & ~m_dec
    assert holes.sum() <= 0.01 * m_dec.sum()
    # silhouette coverage within 10% of the full mesh
    assert abs(m_dec.sum() - m_full.sum()) <= 0.1 * m_full.sum()
    # depth agrees where both cover (clustering error ~cell size)
    both = m_full & m_dec
    assert np.abs(d_full[both] - d_dec[both]).mean() < 0.01
    # small meshes pass through untouched
    v3, f3 = decimate_vertex_clustering(v2, f2, target_faces=5000)
    assert v3 is not None and len(f3) == len(f2)
    # colors are carried through cluster-averaged
    cols = np.tile(np.array([[1.0, 0.5, 0.25]]), (len(v), 1))
    v4, f4, c4 = decimate_vertex_clustering(v, f, 1500, colors=cols)
    assert c4.shape == (len(v4), 3)
    np.testing.assert_allclose(c4, np.tile(np.array([[1.0, 0.5, 0.25]]), (len(v4), 1)))


def test_visib_mask():
    d_test = np.array([[1.0, 1.0, 0.0], [2.0, 2.0, 2.0]])
    d_model = np.array([[1.0, 1.5, 1.0], [0.0, 2.004, 2.5]])
    # bop19 (bop_toolkit default): sensor holes (d_test==0) count as VISIBLE
    m = estimate_visib_mask_gt(d_test, d_model, 0.015)
    assert m[0, 0] and not m[0, 1] and m[0, 2]
    assert not m[1, 0] and m[1, 1] and not m[1, 2]
    # bop18: additionally requires valid test depth
    m18 = estimate_visib_mask_gt(d_test, d_model, 0.015, visib_mode="bop18")
    assert m18[0, 0] and not m18[0, 2]


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from ossid_code_tpu.data.synthetic import make_synthetic_bop, make_template_grid, default_objects

    root = str(tmp_path_factory.mktemp("bop"))
    make_synthetic_bop(root, n_frames=4, img_h=240, img_w=320)
    grid = os.path.join(root, "grid")
    make_template_grid(grid, default_objects(), n_views=8)
    return root


def test_bop_dataset_reader(synth_root):
    from ossid_code_tpu.data.bop import BopDataset, BopDatasetArgs

    ds = BopDataset(BopDatasetArgs(bop_root=synth_root, dataset_name="synth"))
    assert ds.obj_ids == [1, 2]
    assert len(ds.targets) == 8  # 4 frames x 2 objects
    data = ds.getDataByIds(1, 0, 0)
    assert data["img"].shape == (240, 320, 3)
    assert data["depth"].shape == (240, 320)
    assert 0.3 < data["depth"][data["depth"] > 0].min() < 0.7
    assert data["mat_gt"].shape == (4, 4)
    assert (data["mask_gt_visib"] > 0).sum() > 100
    # GT pose projects inside the visible mask region
    from ossid_code_tpu.utils.geometry import project_points_uv

    uv = project_points_uv(data["mat_gt"][None], np.zeros((1, 3)), data["scene_camera"]["cam_K"])
    u, v = uv[0, 0]
    ys, xs = (data["mask_gt"] > 0).nonzero()
    assert xs.min() - 5 <= u <= xs.max() + 5
    assert ys.min() - 5 <= v <= ys.max() + 5


def test_template_dataset(synth_root):
    from ossid_code_tpu.data.templates import TemplateDataset

    td = TemplateDataset(os.path.join(synth_root, "grid"), [1, 2], preload=False)
    assert len(td.view_ids) == 8
    img, xyz, mask = td.getTemplate(1, 0)
    assert img.shape == (124, 124, 3) and img.dtype == np.float32
    assert mask.shape == (124, 124, 1)
    assert xyz.shape == (124, 124, 3)
    assert 0.05 < mask.mean() < 0.9
    imgs, xyzs, masks = td.getTemplatesAll(2)
    assert imgs.shape == (8, 124, 124, 3)
    assert td.grid_quats.shape == (8, 4)


def test_template_dataset_noncontiguous_view_ids(synth_root, tmp_path):
    """Positions and literal view ids must not be conflated (ADVICE r1): with a
    non-contiguous vid2rot.pkl (e.g. imported reference grids), position-based
    and id-based access must agree, cached and uncached."""
    import pickle
    import shutil
    from ossid_code_tpu.data.templates import TemplateDataset

    src = os.path.join(synth_root, "grid")
    dst = str(tmp_path / "grid10")
    os.makedirs(dst)
    with open(os.path.join(src, "vid2rot.pkl"), "rb") as f:
        vid2rot = pickle.load(f)
    # remap view id v -> 10*v + 3: non-contiguous, non-zero-based
    with open(os.path.join(dst, "vid2rot.pkl"), "wb") as f:
        pickle.dump({10 * v + 3: r for v, r in vid2rot.items()}, f)
    for oid in (1, 2):
        odir = os.path.join(dst, f"{oid:06d}")
        os.makedirs(odir)
        for v in vid2rot:
            for suffix in ("_color.png", "_xyz.npy", "_mask.npy"):
                shutil.copy(
                    os.path.join(src, f"{oid:06d}", f"{v:04d}{suffix}"),
                    os.path.join(odir, f"{10 * v + 3:04d}{suffix}"),
                )

    td_ref = TemplateDataset(src, [1, 2], preload=False)
    for preload in (False, True):
        td = TemplateDataset(dst, [1, 2], preload=preload)
        assert td.view_ids == [10 * v + 3 for v in sorted(vid2rot)]
        for pos in (0, 3, 7):
            a = td.getTemplateByPos(1, pos)
            b = td.getTemplate(1, td.view_ids[pos])
            c = td_ref.getTemplateByPos(1, pos)
            for x, y, z in zip(a, b, c):
                np.testing.assert_array_equal(x, y)
                np.testing.assert_array_equal(x, z)
        np.testing.assert_array_equal(td.grid_rots, td_ref.grid_rots)


def test_dtoid_bop_dataset(synth_root):
    from ossid_code_tpu.core.config import default_config
    from ossid_code_tpu.data.dtoid_bop import get_dataloaders
    from ossid_code_tpu.data.bop import BopDataset, BopDatasetArgs
    from ossid_code_tpu.data.synthetic import make_zephyr_results_pkl
    import pickle

    cfg = default_config()
    cfg.dataset.bop_root = synth_root
    cfg.dataset.test_dataset_name = "synth"
    cfg.dataset.grid_root = os.path.join(synth_root, "grid")
    cfg.dataset.shorter_length = 240
    cfg.dataset.heatmap_shorter_length = 14
    cfg.dataset.n_local_test = 4
    cfg.train.batch_size = 2

    bop = BopDataset(BopDatasetArgs(bop_root=synth_root, dataset_name="synth"))
    zr_path = str(os.path.join(synth_root, "zephyr_results.pkl"))
    make_zephyr_results_pkl(zr_path, bop)
    with open(zr_path, "rb") as f:
        zrs = pickle.load(f)
    assert len(zrs) == 8 and zrs[0]["pred_mask_visib"].dtype == bool

    cfg.dataset.load_zephyr_result = True
    cfg.dataset.zephyr_result_path = zr_path
    train_loader, valid_loader, test_loader = get_dataloaders(cfg, zephyr_results=zrs)

    # test loader: batch of 1 with all templates
    batch = next(iter(test_loader))
    assert batch["img"].shape == (1, 240, 320, 3)
    assert batch["limg"].shape == (1, 4, 124, 124, 3)
    assert batch["mask"].shape == (1, 240, 320, 1)
    assert batch["heatmap"].shape[1:3] == (14, 19)
    assert batch["bbox_gt"].shape == (1, 1, 5)

    # train loader: batch of 2, single local template, pseudo-label masks
    tb = next(iter(train_loader))
    assert tb["img"].shape == (2, 240, 320, 3)
    assert tb["limg"].shape == (2, 124, 124, 3)
    assert (tb["bbox_gt"][:, 0, 4] == 1).all()

    # mutable-target API
    ds = test_loader.dataset
    n0 = len(ds)
    ds.clearTargets()
    assert len(ds) == 0
    ds.addTarget(1, 0, 0)
    ds.updateZephyrMask(1, 0, 0, np.ones((240, 320), bool), 42.0)
    assert len(ds) == 1
    ds.sortTargets()


def test_numpy_loader_shuffle(synth_root):
    from ossid_code_tpu.data.dtoid_bop import NumpyLoader

    class Toy:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.asarray([i])}

    l1 = NumpyLoader(Toy(), batch_size=3, shuffle=True, seed=1)
    order1 = np.concatenate([b["x"][:, 0] for b in l1])
    assert sorted(order1.tolist()) == list(range(10))
    assert len(l1) == 4
    l2 = NumpyLoader(Toy(), batch_size=3, shuffle=True, drop_last=True, seed=1)
    assert len(l2) == 3
