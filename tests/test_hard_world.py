"""LM-O-difficulty hermetic world (VERDICT r2 next-step 4): 6 asymmetric
textured objects, two-row cluttered layout with inter-object occlusion,
unannotated distractor clutter, 60-frame streams — and an AR regression floor
over enough targets that ±0.02 is resolvable."""

import json
import os

import numpy as np
import pytest


N_FRAMES = 60


@pytest.fixture(scope="module")
def hard_world(tmp_path_factory):
    from ossid_code_tpu.data.synthetic import make_synthetic_bop, hard_objects
    from ossid_code_tpu.data.bop import BopDataset, BopDatasetArgs

    root = str(tmp_path_factory.mktemp("hardworld"))
    objs = hard_objects()
    make_synthetic_bop(root, n_frames=N_FRAMES, img_h=240, img_w=320,
                       objects=objs, layout="cluttered", n_clutter=3)
    bop = BopDataset(BopDatasetArgs(bop_root=root, dataset_name="synth"))
    return root, objs, bop


def test_hard_world_difficulty_properties(hard_world):
    """The world must actually be hard: 6 objects, 360 targets, substantial
    inter-object occlusion, and clutter pixels that belong to no target."""
    root, objs, bop = hard_world
    assert len(bop.obj_ids) == 6
    assert len(bop.targets) == 6 * N_FRAMES

    with open(os.path.join(root, "synth", "test", "000000",
                           "scene_gt_info.json")) as f:
        info = json.load(f)
    visib = np.asarray([inst["visib_fract"]
                        for frame in info.values() for inst in frame])
    assert len(visib) == 6 * N_FRAMES
    # at least 20% of instances lose >30% of their pixels to occlusion,
    # and some are heavily occluded
    assert (visib < 0.7).mean() >= 0.20, (visib < 0.7).mean()
    assert (visib < 0.5).sum() >= 10
    # nothing fully invisible on average — streams stay learnable
    assert visib.mean() > 0.6

    # clutter: foreground depth pixels outside every annotated mask
    data = bop.getDataByIds(bop.targets[0]["obj_id"], 0, 0)
    depth = data["depth"]
    ann = np.zeros(depth.shape, bool)
    for t in [t for t in bop.targets if t["im_id"] == 0]:
        d = bop.getDataByIds(t["obj_id"], 0, 0)
        ann |= np.asarray(d["mask_gt"]) > 0
    fg = depth < 1.9  # background plane sits at 2 m
    clutter_px = fg & ~ann
    assert clutter_px.sum() > 500, clutter_px.sum()


def test_hard_world_ar_regression_floor(hard_world):
    """Full-vertex BOP AR over all 360 hard-world targets: GT+3mm-noise poses
    (the precomputed-results stand-in) must score AR >= 0.85, and grossly
    wrong poses near zero — pinning the evaluator + world at a resolution
    where a 0.02 AR regression is detectable."""
    from ossid_code_tpu.data.synthetic import make_zephyr_results_pkl
    from ossid_code_tpu.eval.bop_ar import BopEvaluator
    import pickle

    root, objs, bop = hard_world
    zr_path = os.path.join(root, "zr.pkl")
    make_zephyr_results_pkl(zr_path, bop, noise_t=0.003, score=50.0)
    with open(zr_path, "rb") as f:
        zr = pickle.load(f)

    ev = BopEvaluator(bop)
    res = ev.evaluate(zr)
    assert res["AR"] >= 0.85, res
    assert res["AR_mssd"] >= 0.85 and res["AR_mspd"] >= 0.9, res

    bad = [dict(r) for r in zr[:60]]
    for r in bad:
        p = np.asarray(r["pred_pose"]).copy()
        p[:3, 3] += [0.12, -0.1, 0.15]
        r["pred_pose"] = p
    res_bad = ev.evaluate(bad)
    assert res_bad["AR"] < 0.2, res_bad


def test_hard_world_ppf_finds_occluded_object(hard_world):
    """Native PPF + device scoring still recover a back-row (occluded) object
    from its GT-region mask on the cluttered frame."""
    from ossid_code_tpu.hypo.ppf import PPFModelMeters, native_available
    from ossid_code_tpu.loop.online_learning import model_cloud_from_ply
    from ossid_code_tpu.render.mesh import load_ply
    from ossid_code_tpu.utils.geometry import depth2cloud
    from ossid_code_tpu.eval.pose_metrics import add_err

    if not native_available():
        pytest.skip("native PPF library not built")
    root, objs, bop = hard_world
    with open(os.path.join(root, "synth", "test", "000000",
                           "scene_gt_info.json")) as f:
        info = json.load(f)
    # most-occluded instance that still shows >=40% of its pixels
    best = None
    for im_id, frame in info.items():
        for gi, inst in enumerate(frame):
            if 0.4 <= inst["visib_fract"] < 0.75:
                t = [t for t in bop.targets if t["im_id"] == int(im_id)][gi]
                best = (int(im_id), t["obj_id"], inst["visib_fract"])
    assert best is not None
    im_id, obj_id, vf = best

    data = bop.getDataByIds(obj_id, 0, im_id)
    mask = np.asarray(data["mask_gt_visib"]) > 0
    depth = data["depth"]
    K = np.asarray(data["scene_camera"]["cam_K"])
    gen = PPFModelMeters(bop.getObjPath(obj_id), ModelSamplingDist=0.035,
                         scene_sampling_dist=0.035, ref_pt_rate=0.5,
                         refine_top=8, max_poses=64)
    scene = depth2cloud(depth, mask & (depth > 0), K)
    poses, scores, _ = gen.find_surface_model(scene)
    assert len(poses) > 0
    pts = model_cloud_from_ply(load_ply(bop.getObjPath(obj_id)))[0]
    gt = data["mat_gt"]
    errs = [add_err(p[:3, :3], p[:3, 3], gt[:3, :3], gt[:3, 3], pts) for p in poses]
    diam = float(np.linalg.norm(pts.max(0) - pts.min(0)))
    assert min(errs) < 0.15 * diam, (min(errs), diam, vf)


def test_sampled_objects_valid_and_deterministic():
    """sampled_objects(n): n watertight-ish textured meshes with sane extents,
    ids 1..n, deterministic per seed, disjoint draws per seed (the pretraining
    variety knob behind demo_e2e --pretrain_n)."""
    from ossid_code_tpu.data.synthetic import sampled_objects

    objs = sampled_objects(9, seed=3)
    assert sorted(objs) == list(range(1, 10))
    for m in objs.values():
        ext = m.vertices.max(0) - m.vertices.min(0)
        assert np.all(ext > 10) and np.all(ext < 250)
        assert m.faces.min() >= 0 and m.faces.max() < len(m.vertices)
        assert m.colors is not None and len(m.colors) == len(m.vertices)
    again = sampled_objects(9, seed=3)
    for oid in objs:
        assert np.array_equal(objs[oid].vertices, again[oid].vertices)
    other = sampled_objects(9, seed=4)
    assert not np.array_equal(objs[1].vertices, other[1].vertices)


def test_max_per_frame_subset_world(tmp_path):
    """make_synthetic_bop(max_per_frame=k): every frame places exactly k of
    the object set, targets/scene_gt list only the placed objects, and the
    whole set appears somewhere across the stream (the mechanism behind
    demo_e2e --pretrain_n pretraining-variety worlds)."""
    from ossid_code_tpu.data.bop import BopDataset, BopDatasetArgs
    from ossid_code_tpu.data.synthetic import make_synthetic_bop, sampled_objects

    objs = sampled_objects(10, seed=5)
    root = str(tmp_path)
    make_synthetic_bop(root, n_frames=12, img_h=120, img_w=160, objects=objs,
                       layout="cluttered", max_per_frame=4, seed=3)
    bop = BopDataset(BopDatasetArgs(bop_root=root, dataset_name="synth"))
    per_frame = {}
    for t in bop.targets:
        per_frame.setdefault(t["im_id"], []).append(t["obj_id"])
    assert len(per_frame) == 12
    assert all(len(v) == 4 for v in per_frame.values())
    seen = {o for v in per_frame.values() for o in v}
    assert len(seen) >= 9, seen  # variety actually cycles through the set

    with open(os.path.join(root, "synth", "test", "000000",
                           "scene_gt.json")) as f:
        gt = json.load(f)
    for im_id, objs_here in per_frame.items():
        assert sorted(int(g["obj_id"]) for g in gt[str(im_id)]) == sorted(objs_here)
        # loadable end to end (masks on disk, gt indexable)
    d = bop.getDataByIds(per_frame[0][0], 0, 0)
    assert d["img"].shape == (120, 160, 3)
