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
