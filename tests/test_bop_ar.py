import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from ossid_code_tpu.data.synthetic import make_synthetic_bop
    from ossid_code_tpu.data.bop import BopDataset, BopDatasetArgs

    root = str(tmp_path_factory.mktemp("arworld"))
    make_synthetic_bop(root, n_frames=3, img_h=240, img_w=320)
    bop = BopDataset(BopDatasetArgs(bop_root=root, dataset_name="synth"))
    return bop


def test_symmetry_transforms():
    from ossid_code_tpu.eval.bop_ar import symmetry_transforms

    info = {"diameter": 100.0}
    assert len(symmetry_transforms(info)) == 1
    info = {
        "diameter": 100.0,
        "symmetries_discrete": [list(np.eye(4).reshape(-1))],
        "symmetries_continuous": [{"axis": [0, 0, 1], "offset": [0, 0, 0]}],
    }
    syms = symmetry_transforms(info)
    assert len(syms) > 5
    for s in syms:
        np.testing.assert_allclose(s[:3, :3] @ s[:3, :3].T, np.eye(3), atol=1e-8)


def test_symmetry_discretization_matches_toolkit_formula():
    """bop_toolkit misc.get_symmetry_transformations parity: the continuous-
    symmetry step count is ceil(pi / max_sym_disc_step) — diameter-independent
    and uncapped (315 at the toolkit's default 0.01) — and discrete x
    continuous symmetries are composed into a product set."""
    from ossid_code_tpu.eval.bop_ar import symmetry_transforms

    cont = {"symmetries_continuous": [{"axis": [0, 0, 1], "offset": [0, 0, 0]}]}
    n_expect = int(np.ceil(np.pi / 0.01))  # 315
    syms_small = symmetry_transforms({"diameter": 50.0, **cont})
    syms_large = symmetry_transforms({"diameter": 500.0, **cont})
    assert len(syms_small) == len(syms_large) == n_expect
    # consecutive rotations step by exactly 2*pi/315 about z
    ang1 = np.arctan2(syms_small[1][1, 0], syms_small[1][0, 0])
    np.testing.assert_allclose(ang1, 2 * np.pi / n_expect, atol=1e-12)
    # a coarser step honors the formula too
    assert len(symmetry_transforms(cont, max_sym_disc_step=0.1)) == 32

    # discrete x continuous product: (1 identity + 1 discrete) * 315
    flip = np.eye(4)
    flip[0, 0] = flip[1, 1] = -1.0
    both = dict(cont, symmetries_discrete=[list(flip.reshape(-1))])
    syms = symmetry_transforms(both)
    assert len(syms) == 2 * n_expect
    # the composed element cont@disc is present: row 316 = first cont (row 1) @ flip
    np.testing.assert_allclose(syms[n_expect + 1], syms[1] @ flip, atol=1e-12)

    # offset handling: t = offset - R @ offset (toolkit), offsets arrive in mm
    off = {"symmetries_continuous": [{"axis": [0, 0, 1], "offset": [100.0, 0, 0]}]}
    s1 = symmetry_transforms(off)[1]
    expect_t = np.array([0.1, 0, 0]) - s1[:3, :3] @ np.array([0.1, 0, 0])
    np.testing.assert_allclose(s1[:3, 3], expect_t, atol=1e-12)


def test_mssd_mspd_full_vertex_default(world):
    """Max-distance metrics must use every vertex by default: a severe
    subsample can only underestimate MSSD/MSPD (AR would be inflated)."""
    from ossid_code_tpu.eval.bop_ar import BopEvaluator, mssd, mspd

    ev_full = BopEvaluator(world)
    ev_sub = BopEvaluator(world, n_model_points=20)
    for oid in world.obj_ids:
        assert len(ev_full.points[oid]) == len(ev_full.meshes[oid].vertices)
        assert len(ev_sub.points[oid]) <= 20

    t = world.targets[0]
    data = world.getDataByIds(t["obj_id"], t["scene_id"], t["im_id"])
    gt = np.asarray(data["mat_gt"], np.float64)
    est = gt.copy()
    from scipy.spatial.transform import Rotation

    est[:3, :3] = Rotation.from_rotvec([0.15, 0.1, -0.2]).as_matrix() @ est[:3, :3]
    est[:3, 3] += [0.003, -0.002, 0.005]
    oid = t["obj_id"]
    K = np.asarray(data["scene_camera"]["cam_K"])
    syms = ev_full.syms[oid]
    e_full = mssd(est, gt, ev_full.points[oid], syms)
    e_sub = mssd(est, gt, ev_sub.points[oid], syms)
    assert e_sub <= e_full + 1e-12
    p_full = mspd(est, gt, ev_full.points[oid], syms, K)
    p_sub = mspd(est, gt, ev_sub.points[oid], syms, K)
    assert p_sub <= p_full + 1e-9
    # and the full-vertex evaluator still scores GT poses perfectly
    res = ev_full.evaluate([{**t, "pred_pose": gt}])
    assert res["AR_mssd"] == 1.0 and res["AR_mspd"] == 1.0


def test_mssd_mspd_symmetric():
    from ossid_code_tpu.eval.bop_ar import mssd, mspd

    pts = np.random.default_rng(0).normal(0, 0.05, (100, 3))
    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
    pose = np.eye(4)
    pose[2, 3] = 0.5
    # estimate rotated 180deg about z; with that symmetry declared, error ~ 0
    from scipy.spatial.transform import Rotation

    sym = np.eye(4)
    sym[:3, :3] = Rotation.from_euler("z", 180, degrees=True).as_matrix()
    est = pose @ sym
    assert mssd(est, pose, pts, [np.eye(4)]) > 0.01
    assert mssd(est, pose, pts, [np.eye(4), sym]) < 1e-9
    assert mspd(est, pose, pts, [np.eye(4), sym], K) < 1e-6


def test_mssd_mspd_golden_values():
    """Exact analytic values: a pure translation moves every surface point by
    |t| (MSSD = |t|), and shifts the projection of a planar object at constant
    depth Z by exactly f*dx/Z pixels (MSPD = f*dx/Z)."""
    from ossid_code_tpu.eval.bop_ar import mssd, mspd

    rng = np.random.default_rng(1)
    pts = rng.normal(0, 0.04, (64, 3))
    pose_gt = np.eye(4)
    pose_gt[2, 3] = 0.5
    t = np.array([0.003, -0.004, 0.012])  # |t| = 0.013
    pose_est = pose_gt.copy()
    pose_est[:3, 3] += t
    assert abs(mssd(pose_est, pose_gt, pts, [np.eye(4)]) - 0.013) < 1e-12

    # planar object, x-shift only
    pts_planar = pts.copy()
    pts_planar[:, 2] = 0.0
    K = np.array([[250.0, 0, 80], [0, 250.0, 60], [0, 0, 1]])
    Z, dx = 0.5, 0.02
    pose_est = pose_gt.copy()
    pose_est[0, 3] += dx
    expected = K[0, 0] * dx / Z  # 10 px
    assert abs(mspd(pose_est, pose_gt, pts_planar, [np.eye(4)], K) - expected) < 1e-9


def test_vsd_golden_values():
    """Analytic VSD goldens on a hand-built flat-square scene (bop_toolkit
    pose_error.vsd semantics, ref utils/bop_utils.py eval launch):
      * exact pose -> all tau errors 0;
      * disjoint silhouettes -> all 1;
      * half-overlap at identical depth -> ~0.5 (pure visibility cost);
      * behind by dz -> errors 1 for tau*diam < dz, ~0 above."""
    from ossid_code_tpu.eval.bop_ar import vsd, VSD_TAUS
    from ossid_code_tpu.render.mesh import Mesh
    from ossid_code_tpu.render.rasterizer import render_depth

    s = 0.05  # half-size: 0.1 m square in the z=0 plane
    verts_mm = np.array([[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]]) * 1000.0
    mesh = Mesh(verts_mm, np.array([[0, 1, 2], [0, 2, 3]]))
    diam = float(np.sqrt(2) * 2 * s)
    K = np.array([[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1]])
    Z = 0.4
    pose_gt = np.eye(4)
    pose_gt[2, 3] = Z
    # the scene IS the gt object: square projects 50 px wide at (80, 60)
    d_test = render_depth(mesh.vertices / 1000.0, mesh.faces, K, pose_gt, 120, 160)
    assert (d_test > 0).sum() > 2000

    errs = vsd(pose_gt, pose_gt, d_test, K, mesh, diam)
    np.testing.assert_allclose(errs, 0.0, atol=1e-9)

    disjoint = pose_gt.copy()
    disjoint[0, 3] += 0.15  # 75 px shift > 50 px width
    errs = vsd(disjoint, pose_gt, d_test, K, mesh, diam)
    np.testing.assert_allclose(errs, 1.0, atol=1e-9)

    half = pose_gt.copy()
    half[0, 3] += 0.05  # 25 px = half the silhouette; overlap depth identical
    errs = vsd(half, pose_gt, d_test, K, mesh, diam)
    # inter = half of gt, union = 1.5x gt silhouette -> err = (1/3 + 1/3) ... the
    # exact value: outside = union - inter = (2/3) of union -> 2/3 for every tau
    np.testing.assert_allclose(errs, 2.0 / 3.0, atol=0.02)

    behind = pose_gt.copy()
    behind[2, 3] += 0.04  # dist 0.04 on the overlap; fails tau*diam < 0.04
    errs = vsd(behind, pose_gt, d_test, K, mesh, diam)
    fail = VSD_TAUS * diam < 0.04
    assert fail.sum() == 5 and fail[:5].all()  # taus 0.05..0.25 of diam 0.1414
    assert (errs[fail] > 0.95).all()
    # above the threshold only the perspective-shrink ring remains:
    # 1 - (Z/(Z+dz))^2 ~= 19% of the silhouette, constant across taus
    ring = 1.0 - (Z / (Z + 0.04)) ** 2
    np.testing.assert_allclose(errs[~fail], errs[~fail][0], atol=1e-12)
    assert abs(errs[~fail][0] - ring) < 0.08


def test_visib_mask_bop19_semantics():
    """bop_toolkit visibility.py parity: bop19 counts sensor holes
    (d_test == 0) as visible; est visibility adds est pixels the gt sees."""
    from ossid_code_tpu.render.visib import (
        estimate_visib_mask_gt, estimate_visib_mask_est,
    )

    d_test = np.array([[0.5, 0.0, 0.5, 0.5]])
    d_gt = np.array([[0.5, 0.5, 0.6, 0.0]])  # in-tol | hole | behind 0.1 | absent
    v_gt = estimate_visib_mask_gt(d_test, d_gt, delta=0.015)
    np.testing.assert_array_equal(v_gt, [[True, True, False, False]])
    v_gt18 = estimate_visib_mask_gt(d_test, d_gt, delta=0.015, visib_mode="bop18")
    np.testing.assert_array_equal(v_gt18, [[True, False, False, False]])

    d_est = np.array([[0.6, 0.5, 0.6, 0.5]])  # behind | hole | behind-but-gt-sees...
    v_est = estimate_visib_mask_est(d_test, d_est, v_gt, delta=0.015)
    # px0: behind by 0.1 but gt-visible and est>0 -> visible
    # px1: hole -> visible; px2: behind and gt-invisible -> not; px3: in-tol
    np.testing.assert_array_equal(v_est, [[True, True, False, True]])


def test_bop_csv_cross_reference(tmp_path):
    """Write/read cross-check against the reference's own saveResultsBop /
    readResultsBop (ref utils/bop_utils.py:9-75), loaded standalone with its
    config import stubbed."""
    import importlib.util
    import sys
    import types

    ref_path = "/root/reference/python/ossid/utils/bop_utils.py"
    if not os.path.exists(ref_path):
        pytest.skip("reference tree not available")
    pytest.importorskip("pandas")
    stub_pkg = types.ModuleType("ossid")
    stub_cfg = types.ModuleType("ossid.config")
    stub_cfg.BOP_TOOLKIT_PATH = "/nonexistent"
    saved = {k: sys.modules.get(k) for k in ("ossid", "ossid.config")}
    sys.modules["ossid"] = stub_pkg
    sys.modules["ossid.config"] = stub_cfg
    try:
        spec = importlib.util.spec_from_file_location("ref_bop_utils", ref_path)
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v

    from ossid_code_tpu.eval.bop_csv import save_results_bop, read_results_bop
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(7)
    results = []
    for i in range(4):
        pose = np.eye(4)
        pose[:3, :3] = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
        pose[:3, 3] = rng.normal(0, 0.3, 3)
        results.append({"obj_id": i + 1, "scene_id": 2, "im_id": 10 + i,
                        "pose": pose, "score": float(rng.random()), "time": 0.1 * i})

    # ours -> reference reader
    path_ours = save_results_bop(
        [dict(r, pose=r["pose"].copy()) for r in results], str(tmp_path), "xck", "synth"
    )
    back_ref = ref.readResultsBop(path_ours)
    # reference -> our reader
    ref.saveResultsBop(
        [dict(r, pose=r["pose"].copy()) for r in results], str(tmp_path), "refw", "synth"
    )
    path_ref = os.path.join(tmp_path, "refw_synth-test.csv")
    back_ours = read_results_bop(path_ref)

    assert os.path.basename(path_ours) == "xck_synth-test.csv"
    for r, a, b in zip(results, back_ref, back_ours):
        expect = r["pose"].copy()
        expect[:3, 3] *= 1000.0  # both readers return mm translations
        np.testing.assert_allclose(a["pose"], expect, atol=1e-9)
        np.testing.assert_allclose(b["pose"], expect, atol=1e-9)
        assert a["obj_id"] == b["obj_id"] == r["obj_id"]
        assert abs(a["score"] - r["score"]) < 1e-12
        assert abs(b["score"] - r["score"]) < 1e-12


def test_bop_evaluator_gt_vs_perturbed(world):
    from ossid_code_tpu.eval.bop_ar import BopEvaluator

    ev = BopEvaluator(world)
    gt_results, bad_results = [], []
    for t in world.targets:
        data = world.getDataByIds(t["obj_id"], t["scene_id"], t["im_id"])
        gt_results.append({**t, "pred_pose": data["mat_gt"]})
        bad = data["mat_gt"].copy()
        bad[:3, 3] += [0.15, 0.1, 0.2]  # gross error
        bad_results.append({**t, "pred_pose": bad})

    good = ev.evaluate(gt_results)
    assert good["AR"] > 0.95, good
    assert good["AR_vsd"] > 0.9
    bad = ev.evaluate(bad_results)
    assert bad["AR"] < 0.2, bad
    # small perturbation lands in between
    mid_results = []
    for t in world.targets:
        data = world.getDataByIds(t["obj_id"], t["scene_id"], t["im_id"])
        mid = data["mat_gt"].copy()
        mid[:3, 3] += [0.004, 0.0, 0.004]
        mid_results.append({**t, "pred_pose": mid})
    mid = ev.evaluate(mid_results)
    assert bad["AR"] < mid["AR"] <= good["AR"] + 1e-9


# ----------------------------------------------------- device pp_err parity
def test_pp_err_device_matches_host():
    """The on-device per-hypothesis ADD/ADD-S (pose_metrics.pp_err_batch_async)
    reproduces the host numpy add_err_batch/adi_err_batch the loop used to
    call (ref online_learning.py:452 diagnostic)."""
    import jax.numpy as jnp

    from ossid_code_tpu.eval.pose_metrics import (
        add_err_batch, adi_err_batch, pp_err_batch_async, pp_err_fetch,
    )
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(11)
    pts = rng.normal(0, 0.03, (1500, 3)).astype(np.float32)
    mat_gt = np.eye(4, dtype=np.float32)
    mat_gt[:3, :3] = Rotation.from_rotvec([0.2, -0.1, 0.4]).as_matrix()
    mat_gt[:3, 3] = [0.02, -0.01, 0.8]
    poses = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    for i in range(5):
        poses[i, :3, :3] = Rotation.from_rotvec(rng.normal(0, 0.3, 3)).as_matrix()
        poses[i, :3, 3] = mat_gt[:3, 3] + rng.normal(0, 0.02, 3)

    pts_dev = jnp.asarray(pts)
    pts_q = pts[np.linspace(0, len(pts) - 1, 1000).round().astype(int)]

    got = pp_err_fetch(pp_err_batch_async(poses, mat_gt, pts_dev))
    want = add_err_batch(poses, mat_gt, pts)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    got_s = pp_err_fetch(pp_err_batch_async(
        poses, mat_gt, pts_dev, symmetric=True, pts_q_dev=jnp.asarray(pts_q)))
    want_s = adi_err_batch(poses, mat_gt, pts)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-3, atol=1e-5)
