"""Native PPF matcher tests: train on a model cloud, recover the pose of the
object in a rendered synthetic scene."""

import os
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", NATIVE_DIR, "-s"], check=True)


@pytest.fixture(scope="module")
def scene():
    from ossid_code_tpu.render.mesh import make_box_mesh
    from ossid_code_tpu.render.rasterizer import render_depth
    from ossid_code_tpu.utils.geometry import depth2cloud
    from scipy.spatial.transform import Rotation

    mesh = make_box_mesh(80, 60, 40)  # mm
    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
    pose = np.eye(4)
    pose[:3, :3] = Rotation.from_euler("xyz", [20, -15, 40], degrees=True).as_matrix()
    pose[:3, 3] = [0.02, -0.01, 0.5]
    depth = render_depth(mesh.vertices / 1000.0, mesh.faces, K, pose, 240, 320)
    cloud_m = depth2cloud(depth, depth > 0, K)
    return mesh, pose, cloud_m


def test_ppf_recovers_pose(scene):
    from ossid_code_tpu.hypo.ppf import PPFModelMeters, native_available
    from ossid_code_tpu.loop.online_learning import model_cloud_from_ply
    from ossid_code_tpu.eval.pose_metrics import adi_err

    assert native_available()
    mesh, pose_gt, cloud_m = scene
    pts_m, _, nrm = model_cloud_from_ply(mesh, n_points=4096)

    gen = PPFModelMeters(pts_m * 1000.0, ModelSamplingDist=0.04)
    poses, scores, dt = gen.find_surface_model(cloud_m, SceneSamplingDist=0.04, RefPtRate=1.0)
    assert len(poses) >= 1
    assert dt < 30.0
    # scores sorted descending
    assert all(scores[i] >= scores[i + 1] for i in range(len(scores) - 1))

    # some returned hypothesis matches GT up to box symmetry (ADD-S); ranking
    # the right one first is the zephyr scorer's job, not PPF's
    errs = [
        adi_err(p[:3, :3], p[:3, 3], pose_gt[:3, :3], pose_gt[:3, 3], pts_m)
        for p in poses
    ]
    assert min(errs) < 0.015, f"best ADD-S {min(errs):.4f} m"


def test_ppf_empty_scene():
    from ossid_code_tpu.hypo.ppf import PPFModelMeters

    gen = PPFModelMeters(np.random.default_rng(0).normal(0, 30, (500, 3)), ModelSamplingDist=0.05)
    poses, scores, dt = gen.find_surface_model(np.zeros((3, 3)))
    assert poses.shape[1:] == (4, 4)
