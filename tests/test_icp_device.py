"""Device-side batched ICP refinement (ops/icp_device.py): the XLA program
that replaces per-hypothesis host ICP (role of Halcon DensePoseRefinement /
Open3D ICP, ref scripts/online_learning.py:442-447,473-480)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation


def _model_cloud(n=300, seed=0):
    rng = np.random.default_rng(seed)
    # asymmetric blob so the pose is well-determined
    pts = rng.normal(0, 0.03, (n, 3))
    pts[:, 0] *= 2.0
    pts += 0.01 * np.sin(pts[:, :1] * 40)
    return pts.astype(np.float32)


def _gt_pose():
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = Rotation.from_euler("xyz", [15, -10, 25], degrees=True).as_matrix()
    pose[:3, 3] = [0.03, -0.02, 0.55]
    return pose


def _perturbed(pose, rng, rot_deg, trans):
    p = pose.copy()
    p[:3, :3] = Rotation.from_rotvec(
        rng.normal(0, np.deg2rad(rot_deg), 3)).as_matrix() @ p[:3, :3]
    p[:3, 3] += rng.normal(0, trans, 3)
    return p


def test_batched_icp_recovers_poses():
    import jax
    from ossid_code_tpu.ops.icp_device import batched_icp

    mp = _model_cloud()
    gt = _gt_pose()
    scene = mp @ gt[:3, :3].T + gt[:3, 3]  # the scene IS the object surface
    rng = np.random.default_rng(1)
    K = 8
    poses0 = np.stack([_perturbed(gt, rng, 3.0, 0.004) for _ in range(K)])

    refined = np.asarray(jax.jit(batched_icp, static_argnames=("max_dist", "iters"))(
        poses0, mp, scene.astype(np.float32), np.ones(len(scene), bool),
        max_dist=0.02, iters=12,
    ))
    for i in range(K):
        before = np.linalg.norm(
            mp @ poses0[i, :3, :3].T + poses0[i, :3, 3] - scene, axis=1).mean()
        after = np.linalg.norm(
            mp @ refined[i, :3, :3].T + refined[i, :3, 3] - scene, axis=1).mean()
        assert after < before * 0.2, (i, before, after)
        assert after < 1.5e-3, (i, after)


def test_batched_icp_ignores_invalid_scene_points():
    import jax
    from ossid_code_tpu.ops.icp_device import batched_icp

    mp = _model_cloud()
    gt = _gt_pose()
    scene = (mp @ gt[:3, :3].T + gt[:3, 3]).astype(np.float32)
    # append garbage points marked invalid: they must not attract the solve
    junk = np.random.default_rng(2).normal(0, 0.01, (200, 3)).astype(np.float32)
    scene_all = np.concatenate([scene, junk + gt[:3, 3] + 0.02])
    valid = np.concatenate([np.ones(len(scene), bool), np.zeros(len(junk), bool)])

    rng = np.random.default_rng(3)
    poses0 = np.stack([_perturbed(gt, rng, 2.0, 0.003) for _ in range(4)])
    refined = np.asarray(batched_icp(poses0, mp, scene_all, valid,
                                     max_dist=0.02, iters=12))
    for i in range(4):
        err = np.linalg.norm(
            mp @ refined[i, :3, :3].T + refined[i, :3, 3] - scene, axis=1).mean()
        assert err < 1.5e-3, (i, err)


def test_batched_icp_plane_converges_on_well_conditioned_data():
    """Point-to-plane variant: sub-0.1mm convergence when the scene constrains
    all six DOF (all-around surface with exact normals)."""
    from ossid_code_tpu.ops.icp_device import batched_icp_plane
    from ossid_code_tpu.render.mesh import make_wedge_mesh
    from ossid_code_tpu.loop.online_learning import model_cloud_from_ply
    from ossid_code_tpu.eval.pose_metrics import add_err

    mesh = make_wedge_mesh(90, 60, 40)
    pts, _, nrms = model_cloud_from_ply(mesh, n_points=500)
    gt = _gt_pose()
    scene = (pts @ gt[:3, :3].T + gt[:3, 3]).astype(np.float32)
    snrm = (nrms @ gt[:3, :3].T).astype(np.float32)
    rng = np.random.default_rng(6)
    hypos = np.stack([_perturbed(gt, rng, 4.0, 0.006) for _ in range(6)])
    refined = np.asarray(batched_icp_plane(
        hypos, pts, scene, snrm, np.ones(len(scene), bool),
        max_dist=0.01, iters=10))
    for r in refined:
        err = add_err(r[:3, :3], r[:3, 3], gt[:3, :3], gt[:3, 3], pts)
        assert err < 1e-4, err


def test_batched_icp_degenerate_keeps_pose():
    from ossid_code_tpu.ops.icp_device import batched_icp

    mp = _model_cloud(50)
    gt = _gt_pose()
    scene = np.zeros((64, 3), np.float32)
    poses0 = gt[None].copy()
    # every scene point invalid -> zero correspondences -> pose must not move
    refined = np.asarray(batched_icp(poses0, mp, scene, np.zeros(64, bool),
                                     max_dist=0.01, iters=4))
    np.testing.assert_allclose(refined, poses0, atol=1e-6)


def test_unproject_depth_grid_crop_matches_full():
    import jax.numpy as jnp
    from ossid_code_tpu.ops.icp_device import unproject_depth_grid

    rng = np.random.default_rng(4)
    depth = rng.uniform(0.4, 0.8, (64, 80)).astype(np.float32)
    depth[10:20, 30:40] = 0.0  # holes
    K = np.array([[100.0, 0, 40], [0, 100.0, 32], [0, 0, 1]], np.float32)

    pts_full, ok_full = unproject_depth_grid(jnp.asarray(depth), jnp.asarray(K), stride=1)
    pts_full = np.asarray(pts_full).reshape(64, 80, 3)
    ok_full = np.asarray(ok_full).reshape(64, 80)

    crop = depth[8:40, 16:64]
    origin = jnp.asarray([8, 16], jnp.int32)
    pts_c, ok_c = unproject_depth_grid(jnp.asarray(crop), jnp.asarray(K),
                                       origin=origin, stride=2)
    pts_c = np.asarray(pts_c).reshape(16, 24, 3)
    ok_c = np.asarray(ok_c).reshape(16, 24)
    np.testing.assert_allclose(pts_c, pts_full[8:40:2, 16:64:2], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(ok_c, ok_full[8:40:2, 16:64:2])


def test_zephyr_in_graph_refinement_improves_pose():
    """ZephyrModel(refine_top=K): the scored/reported pose is device-refined —
    markedly closer to GT than the raw hypothesis it started from."""
    import jax
    from ossid_code_tpu.models.zephyr.module import ZephyrModel
    from ossid_code_tpu.render.mesh import make_wedge_mesh
    from ossid_code_tpu.render.rasterizer import render_depth
    from ossid_code_tpu.loop.online_learning import model_cloud_from_ply
    from ossid_code_tpu.eval.pose_metrics import add_err

    mesh = make_wedge_mesh(90, 60, 40)
    pts, cols, nrms = model_cloud_from_ply(mesh, n_points=600)
    gt = _gt_pose()
    # realistic pixel density (LM-O is f~570 at 480x640; coarser cameras floor
    # point-to-point ICP at the pixel footprint)
    Kmat = np.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1.0]])
    depth, color = render_depth(mesh.vertices / 1000.0, mesh.faces, Kmat, gt,
                                240, 320, colors=mesh.colors)
    img = (np.clip(color, 0, 1) * 255).astype(np.uint8)

    rng = np.random.default_rng(5)
    hypos = np.stack([_perturbed(gt, rng, 4.0, 0.006) for _ in range(16)])
    data = dict(img=img, depth=depth, cam_K=Kmat, model_points=pts,
                model_colors=cols, model_normals=nrms, pose_hypos=hypos)

    zm = ZephyrModel(num_points=128, inconst_ratio_th=100.0, seed=0,
                     need_uv=False, refine_top=16, refine_iters=20)
    out = zm.score_hypotheses(dict(data), obj_id=1)
    idx = out["pred_idx"]
    err_raw = add_err(hypos[idx, :3, :3], hypos[idx, :3, 3],
                      gt[:3, :3], gt[:3, 3], pts)
    err_ref = add_err(out["pred_pose"][:3, :3], out["pred_pose"][:3, 3],
                      gt[:3, :3], gt[:3, 3], pts)
    assert err_ref < err_raw * 0.5, (err_raw, err_ref)
    # point-to-point floor is ~1-2 px of surface footprint (1.4 mm/px here)
    assert err_ref < 0.0045, err_ref

    # refine_top=0 keeps the legacy behavior: reported pose is the raw hypothesis
    zm0 = ZephyrModel(num_points=128, inconst_ratio_th=100.0, seed=0,
                      need_uv=False, refine_top=0)
    out0 = zm0.score_hypotheses(dict(data), obj_id=1)
    np.testing.assert_allclose(out0["pred_pose"], hypos[out0["pred_idx"]], atol=0)
