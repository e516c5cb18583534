"""Hermetic end-to-end test of the OSSID online loop on the synthetic BOP
fixture: detection -> gating -> fake hypotheses -> zephyr scoring -> rendering
-> pseudo-labels -> finetuning -> result rows (SURVEY.md §7.3)."""

import argparse
import os
import pickle

import numpy as np
import pytest

from ossid_code_tpu.core.config import default_config


def make_args(**kw):
    defaults = dict(
        dataset_name="synth", exp_name="t", use_offline_model=False,
        use_pretrained_dtoid=False, dtoid_weights_path=None, n_local_test=4,
        use_dtoid_segmask=False, ignore_dtoid_mask=False, always_dtoid_mask=False,
        use_oracle_gt=False, use_sift_hypos=False, test_seen=False, backward=False,
        use_maskrcnn=False, finetune_interval=4, finetune_warmup=0,
        finetune_epochs=1, finetune_reset=False, finetune_batch_size=2,
        non_cum=False, save_each=False, raw_dtoid=False, no_finetune=False,
        fast=True, hypo_backend="fake", n_fake_hypos=32, zephyr_depth_crop=0,
        yuv_transfer=False,
    )
    defaults.update(kw)
    return argparse.Namespace(**defaults)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """Synthetic BOP world at 128x160 + small DTOID + zephyr + loaders."""
    from ossid_code_tpu.data.synthetic import (
        make_synthetic_bop, make_template_grid, default_objects, make_zephyr_results_pkl,
    )
    from ossid_code_tpu.data.bop import BopDataset, BopDatasetArgs
    from ossid_code_tpu.data.dtoid_bop import get_dataloaders
    from ossid_code_tpu.models.dtoid.module import DtoidModel
    from ossid_code_tpu.models.zephyr.module import ZephyrModel

    root = str(tmp_path_factory.mktemp("bopworld"))
    make_synthetic_bop(root, n_frames=6, img_h=128, img_w=160)
    make_template_grid(os.path.join(root, "grid"), default_objects(), n_views=8)

    cfg = default_config()
    cfg.dataset.bop_root = root
    cfg.dataset.test_dataset_name = "synth"
    cfg.dataset.grid_root = os.path.join(root, "grid")
    cfg.dataset.shorter_length = 128
    cfg.dataset.heatmap_shorter_length = 7
    cfg.dataset.n_local_test = 4
    cfg.model.img_h, cfg.model.img_w = 128, 160
    cfg.model.heatmap_h, cfg.model.heatmap_w = 7, 9
    cfg.train.batch_size = 2
    cfg.dataset.load_zephyr_result = True

    bop = BopDataset(BopDatasetArgs(bop_root=root, dataset_name="synth"))
    zr_path = os.path.join(root, "zephyr_results.pkl")
    make_zephyr_results_pkl(zr_path, bop, score=50.0)
    cfg.dataset.zephyr_result_path = zr_path
    with open(zr_path, "rb") as f:
        zr_list = pickle.load(f)
    zephyr_results = {(r["obj_id"], r["scene_id"], r["im_id"]): r for r in zr_list}

    model = DtoidModel(cfg, seed=0)
    zmodel = ZephyrModel(num_points=128, inconst_ratio_th=100.0, seed=0)
    return dict(root=root, cfg=cfg, bop=bop, model=model, zmodel=zmodel,
                zephyr_results=zephyr_results, zr_list=zr_list)


def _build_loop(world, args, **kw):
    from ossid_code_tpu.data.dtoid_bop import get_dataloaders
    from ossid_code_tpu.hypo.fake import FakeHypoGen
    from ossid_code_tpu.loop.online_learning import OnlineLearningLoop

    cfg = world["cfg"]
    train_loader, valid_loader, test_loader = get_dataloaders(cfg, world["zr_list"])
    test_loader.dataset.sortTargets()
    train_ds = train_loader.dataset
    train_ds.clearTargets()
    # row-deep copy: updateZephyrMask mutates rows in place (reference
    # behavior), which must not leak across tests via the module fixture
    zr = {k: dict(v) for k, v in world["zephyr_results"].items()}
    train_ds.zephyr_results = zr

    hypo_gens = {oid: FakeHypoGen(n_hypos=args.n_fake_hypos, seed=oid)
                 for oid in world["bop"].obj_ids}
    return OnlineLearningLoop(
        args, cfg, world["model"], world["bop"], train_ds, test_loader,
        zr, zephyr_model=kw.get("zephyr_model", world["zmodel"]),
        hypo_gens=hypo_gens, use_icp=kw.get("use_icp", False),
    )


def test_loop_precomputed_branch(world):
    """ignore_dtoid_mask: the loop runs off precomputed results; poses are
    GT+noise so pose metrics must be good, and finetuning must trigger."""
    args = make_args(ignore_dtoid_mask=True, finetune_interval=4)
    loop = _build_loop(world, args)
    results = loop.run(progress=False)

    assert len(results) == 12  # 6 frames x 2 objects
    r0 = results[0]
    for key in ("obj_id", "pred_pose", "pred_score", "pred_err", "pred_add01d",
                "pred_mask_visib", "pred_iou_visib", "dtoid_bbox", "dtoid_score",
                "time_dtoid", "time_finetune", "use_dtoid_mask", "finetune"):
        assert key in r0, key
    assert not r0["use_dtoid_mask"]
    # precomputed poses are within noise of GT
    errs = [r["pred_err"] for r in results]
    assert np.median(errs) < 0.02
    assert np.mean([r["pred_add01d"] for r in results]) > 0.8
    assert np.mean([r["pred_iou_visib"] for r in results]) > 0.5
    # zephyr score 50 > 20 -> every frame added; finetunes at 4 and 8
    assert sum(r["finetune"] for r in results) >= 2
    assert any(r["time_finetune"] > 0 for r in results)


def test_loop_masked_branch(world):
    """always_dtoid_mask + oracle gt: full hypothesis generation + device
    scoring + rendering + pseudo-labels run every frame."""
    args = make_args(always_dtoid_mask=True, use_oracle_gt=True,
                     finetune_interval=6, n_fake_hypos=16)
    loop = _build_loop(world, args)
    results = loop.run(progress=False)
    assert len(results) == 12
    assert all(r["use_dtoid_mask"] for r in results)
    assert all(r["time_zephyr"] is not None for r in results)
    assert all(r["time_ppf"] is not None for r in results)
    assert all(np.isfinite(r["pred_score"]) for r in results)
    assert sum(r["finetune"] for r in results) >= 1
    # rendered masks exist
    assert all(r["pred_mask"].sum() >= 0 for r in results)
    # per-hypothesis diagnostics (ref online_learning.py:452): one error and
    # one score per generated hypothesis, count recorded
    assert all(r["n_hypos"] == 16 for r in results)
    assert all(len(r["pp_err"]) == r["n_hypos"] for r in results)
    assert all(len(r["hypo_scores"]) == r["n_hypos"] for r in results)
    assert all(np.isfinite(r["pp_err"]).all() for r in results)


def test_loop_icp_path_runs(world):
    """use_icp with a need_uv=False scorer: the loop's ICP stage must run on
    every masked frame (host-projected crop box — no device uv fetch)."""
    from ossid_code_tpu.models.zephyr.module import ZephyrModel

    args = make_args(always_dtoid_mask=True, use_oracle_gt=True,
                     no_finetune=True, n_fake_hypos=8)
    zm = ZephyrModel(num_points=128, inconst_ratio_th=100.0, seed=0, need_uv=False)
    loop = _build_loop(world, args, use_icp=True, zephyr_model=zm)
    results = loop.run(progress=False)
    assert len(results) == 12
    assert all(r["time_icp"] is not None and r["time_icp"] > 0 for r in results)
    assert all(np.isfinite(np.asarray(r["pred_pose"])).all() for r in results)


def test_icp_refinement_host_crop(world):
    """The exact crop+refine computation the loop's ICP stage performs: a
    pose perturbed off GT, cropped by the host projection of the model points
    under that pose, must refine toward GT against the rendered depth. (A
    degenerate crop — e.g. the dummy uv of a need_uv=False scorer — leaves
    the pose unrefined, which this asserts against.)"""
    from ossid_code_tpu.hypo.icp import icp_refinement
    from ossid_code_tpu.render.mesh import load_ply
    from ossid_code_tpu.loop.online_learning import model_cloud_from_ply

    bop = world["bop"]
    d = bop.getDataByIds(1, 0, 0)
    depth = np.asarray(d["depth"], np.float32)
    K = np.asarray(d["scene_camera"]["cam_K"], np.float64).reshape(3, 3)
    gt = np.asarray(d["mat_gt"], np.float64)
    pts, _, _ = model_cloud_from_ply(load_ply(bop.getObjPath(1)), n_points=512)

    rng = np.random.default_rng(0)
    pert = gt.copy()
    pert[:3, 3] += rng.normal(0, 0.004, 3)

    def add(p):
        a = pts @ p[:3, :3].T + p[:3, 3]
        b = pts @ gt[:3, :3].T + gt[:3, 3]
        return float(np.linalg.norm(a - b, axis=1).mean())

    cam = pts @ pert[:3, :3].T + pert[:3, 3]
    z = np.clip(cam[:, 2], 1e-6, None)
    uv = np.stack([K[0, 0] * cam[:, 0] / z + K[0, 2],
                   K[1, 1] * cam[:, 1] / z + K[1, 2]], axis=1).round().astype(int)
    refined, err = icp_refinement(depth, uv, pert, K, pts, icp_max_dist=0.01)
    assert np.isfinite(err)
    assert add(refined) < 0.6 * add(pert), (add(pert), add(refined))


def _assert_rows_equal(r_on, r_off):
    assert len(r_on) == len(r_off)
    for a, b in zip(r_on, r_off):
        assert set(a) == set(b)
        for k in a:
            if k.startswith("time_"):
                continue
            va, vb = a[k], b[k]
            if va is None or vb is None:
                assert va is vb, k
            elif isinstance(va, np.ndarray) or hasattr(va, "shape"):
                np.testing.assert_allclose(
                    np.asarray(va, np.float64), np.asarray(vb, np.float64),
                    rtol=1e-5, atol=1e-6, err_msg=k,
                )
            elif isinstance(va, float):
                assert (va == vb) or abs(va - vb) < 1e-6, (k, va, vb)
            else:
                assert va == vb, (k, va, vb)


def _run_pipeline_pair(world, args):
    model = world["model"]
    sd0 = model.state_dict()

    def run_once(pipeline):
        model.load_state_dict(sd0)
        model.reset_optimizer()
        model.clear_cache()
        loop = _build_loop(world, args)
        loop.pipeline_scoring = pipeline
        return loop.run(progress=False)

    return run_once(True), run_once(False)


def test_pipeline_equivalence(world):
    """The deferred-completion pipeline (zephyr score fetch overlapped with the
    next frame's host work) must be semantically exact: identical result rows,
    poses, gating decisions, and finetune schedule with pipelining on and off."""
    args = make_args(always_dtoid_mask=True, use_oracle_gt=True,
                     finetune_interval=4, n_fake_hypos=8)
    r_on, r_off = _run_pipeline_pair(world, args)
    # both finetune paths exercised: some frames deferred, the threshold frame not
    assert sum(r["finetune"] for r in r_on) >= 2
    _assert_rows_equal(r_on, r_off)


def test_pipeline_equivalence_production_flags(world):
    """The bench's exact production transport flags (YUV 4:2:0 frame transport
    + depth-crop scoring + deferred completion, bench.py defaults) must leave
    the loop semantically exact. YUV reconstruction is deterministic, so both
    runs see identical inputs and rows must match exactly — including across a
    finetune boundary that forces inline completion mid-stream."""
    args = make_args(always_dtoid_mask=True, use_oracle_gt=True,
                     finetune_interval=4, n_fake_hypos=8,
                     yuv_transfer=True, zephyr_depth_crop=96)
    r_on, r_off = _run_pipeline_pair(world, args)
    assert sum(r["finetune"] for r in r_on) >= 2
    _assert_rows_equal(r_on, r_off)


class _EmptyHypoGen:
    """Hypothesis generator that finds nothing (zero-match scene)."""

    def find_surface_model(self, scene_pc, **kw):
        return np.zeros((0, 4, 4)), np.zeros((0,)), 0.0


def test_empty_hypotheses_fail_closed(world):
    """Zero PPF matches must never produce a pseudo-label: without a
    precomputed fallback the frame reports -inf score and the gate stays shut
    (ref online_learning.py:367-378 falls back rather than scoring garbage)."""
    args = make_args(always_dtoid_mask=True, finetune_interval=2, n_fake_hypos=8)
    loop = _build_loop(world, args)
    loop.hypo_gens = {oid: _EmptyHypoGen() for oid in world["bop"].obj_ids}
    loop.zephyr_results = {}
    results = loop.run(progress=False)
    assert len(results) == 12
    assert all(r["pred_score"] == float("-inf") for r in results)
    assert not any(r["zephyr_confident"] for r in results)
    assert not any(r["finetune"] for r in results)
    assert len(loop.train_dataset) == 0


def test_empty_hypotheses_fall_back_to_precomputed(world):
    """With a precomputed zephyr result available, a zero-match frame falls
    back to it (reference behavior) and the loop proceeds normally."""
    args = make_args(always_dtoid_mask=True, finetune_interval=4, n_fake_hypos=8)
    loop = _build_loop(world, args)
    loop.hypo_gens = {oid: _EmptyHypoGen() for oid in world["bop"].obj_ids}
    results = loop.run(progress=False)
    assert len(results) == 12
    # precomputed results carry score 50 and GT+noise poses
    assert all(np.isfinite(r["pred_score"]) for r in results)
    assert np.mean([r["pred_add01d"] for r in results]) > 0.8
    assert sum(r["finetune"] for r in results) >= 2


def test_save_each_writes_reference_schema_ckpts(world, tmp_path):
    """--save_each snapshots {iteration, model_state_dict, conf} after each
    finetune (ref online_learning.py:535-546) and load_checkpoint reads them."""
    from ossid_code_tpu.core.checkpoint import load_checkpoint

    args = make_args(ignore_dtoid_mask=True, finetune_interval=4, save_each=True,
                     exp_name="se")
    args.save_root = str(tmp_path)
    loop = _build_loop(world, args)
    results = loop.run(progress=False)
    n_finetunes = sum(r["finetune"] for r in results)
    assert n_finetunes >= 2
    files = sorted(os.listdir(tmp_path / "se"))
    assert len(files) == n_finetunes
    assert all(f.startswith("epoch_") and f.endswith(".ckpt") for f in files)
    with open(tmp_path / "se" / files[0], "rb") as f:
        payload = pickle.load(f)
    assert set(payload) == {"iteration", "model_state_dict", "conf"}
    state = load_checkpoint(str(tmp_path / "se" / files[0]))
    assert "params" in state and "batch_stats" in state


def test_two_scorer_parity_selection(world):
    """YCB-V parity plumbing: even obj_ids are scored by the even-model, odd by
    the odd-model (ref online_learning.py:461-464)."""
    from ossid_code_tpu.models.zephyr.module import ZephyrModel

    args = make_args(always_dtoid_mask=True, use_oracle_gt=True, n_fake_hypos=8)
    loop = _build_loop(world, args)
    z_even = world["zmodel"]
    z_odd = ZephyrModel(num_points=128, inconst_ratio_th=100.0, seed=1)
    loop.zephyr_model_even = z_even
    loop.zephyr_model_odd = z_odd
    assert loop._zephyr_for(2) is z_even
    assert loop._zephyr_for(1) is z_odd
    # single-model fallback when no pair is configured
    loop.zephyr_model_even = loop.zephyr_model_odd = None
    assert loop._zephyr_for(1) is loop.zephyr_model
    assert loop._zephyr_for(2) is loop.zephyr_model


def test_raw_dtoid_path(world):
    from ossid_code_tpu.data.dtoid_bop import get_dataloaders
    from ossid_code_tpu.loop.online_learning import test_dtoid_model

    _, _, test_loader = get_dataloaders(world["cfg"], world["zr_list"])
    results = test_dtoid_model(world["model"], test_loader)
    assert len(results) == 12
    assert all("dtoid_iou" in r and "gt_bbox" in r for r in results)


def test_results_to_bop_csv(world, tmp_path):
    from ossid_code_tpu.eval.bop_csv import save_results_bop, read_results_bop

    results = [
        {"obj_id": 1, "scene_id": 0, "im_id": i, "pred_pose": np.eye(4), "pred_score": 0.5}
        for i in range(3)
    ]
    results[0]["pred_pose"] = results[0]["pred_pose"].copy()
    results[0]["pred_pose"][:3, 3] = [0.1, 0.2, 0.5]
    path = save_results_bop(results, str(tmp_path), "online_test", "synth",
                            pose_key="pred_pose", score_key="pred_score")
    assert os.path.basename(path) == "online-test_synth-test.csv"
    back = read_results_bop(path)
    assert len(back) == 3
    np.testing.assert_allclose(back[0]["pose"][:3, 3], [100, 200, 500])  # mm


def test_checkpoint_roundtrip(world, tmp_path):
    from ossid_code_tpu.core.checkpoint import save_checkpoint, load_checkpoint

    model = world["model"]
    sd = model.state_dict()
    p = str(tmp_path / "m.ckpt")
    save_checkpoint(p, sd)
    loaded = load_checkpoint(p)
    import jax

    leaves1 = jax.tree_util.tree_leaves(sd)
    leaves2 = jax.tree_util.tree_leaves(loaded)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_name_roundtrip(world):
    """flax -> torch-name export -> import produces the identical pytree, and
    covers the full parameter set (the mapping is complete)."""
    import jax
    from ossid_code_tpu.models.dtoid.torch_import import (
        export_dtoid_state_dict, convert_dtoid_state_dict,
    )

    model = world["model"]
    params = jax.device_get(model.params)
    bstats = jax.device_get(model.batch_stats)
    torch_sd = export_dtoid_state_dict(params, bstats)
    assert all(k.startswith("model.") for k in torch_sd)
    back = convert_dtoid_state_dict(torch_sd)

    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(back["params"])[0]
    assert len(flat1) == len(flat2), (len(flat1), len(flat2))
    d2 = {jax.tree_util.keystr(k): v for k, v in flat2}
    for k, v in flat1:
        np.testing.assert_allclose(np.asarray(v), d2[jax.tree_util.keystr(k)], err_msg=str(k))
    # batch stats complete too
    n1 = len(jax.tree_util.tree_leaves(bstats))
    n2 = len(jax.tree_util.tree_leaves(back["batch_stats"]))
    assert n1 == n2


def test_save_checkpoint_torch_format_dtoid(world, tmp_path):
    """save_checkpoint(torch_format=True) on a DTOID state writes a
    torch.load-able Lightning-style checkpoint (keys 'model.*', reference
    names) that load_checkpoint reads back bit-exact — the export half of
    BASELINE's "checkpoint formats preserved" (VERDICT r4 item 6; ref
    scripts/online_learning.py:159-162 loads such files)."""
    import torch
    import jax
    from ossid_code_tpu.core.checkpoint import save_checkpoint, load_checkpoint

    model = world["model"]
    state = {"params": jax.device_get(model.params),
             "batch_stats": jax.device_get(model.batch_stats)}
    path = str(tmp_path / "dtoid_export.ckpt")
    save_checkpoint(path, state, torch_format=True)

    raw = torch.load(path, map_location="cpu", weights_only=False)
    assert all(k.startswith("model.") for k in raw["state_dict"])
    assert "model.image_feature_extractor.backdense_0.0.weight" in raw["state_dict"]

    back = load_checkpoint(path)
    flat1 = jax.tree_util.tree_flatten_with_path(state["params"])[0]
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_flatten_with_path(back["params"])[0]}
    assert len(flat1) == len(flat2)
    for k, v in flat1:
        np.testing.assert_array_equal(np.asarray(v), flat2[jax.tree_util.keystr(k)],
                                      err_msg=str(k))
    assert (len(jax.tree_util.tree_leaves(back["batch_stats"]))
            == len(jax.tree_util.tree_leaves(state["batch_stats"])))


def test_spec_fetch_mode_equivalence(world, monkeypatch):
    """OSSID_SPEC_FETCH=thread (side-thread fetch+decode of the speculative
    detection) and =inline (async host copy, main-thread decode) are pure
    scheduling choices: with finetuning crossing the stream, the result rows
    must match exactly."""
    args = make_args(always_dtoid_mask=True, use_oracle_gt=True,
                     finetune_interval=4, n_fake_hypos=8)
    model = world["model"]
    sd0 = model.state_dict()

    def run_once(mode):
        monkeypatch.setenv("OSSID_SPEC_FETCH", mode)
        model.load_state_dict(sd0)
        model.reset_optimizer()
        model.clear_cache()
        loop = _build_loop(world, args)
        assert loop._spec_fetch_thread == (mode == "thread")
        return loop.run(progress=False)

    r_thread = run_once("thread")
    r_inline = run_once("inline")
    assert sum(r["finetune"] for r in r_thread) >= 2
    _assert_rows_equal(r_thread, r_inline)


def test_merged_fetch_equivalence(world, monkeypatch):
    """Thread mode's merged fetch (a deferred frame's completion outputs riding
    the SAME device_get RPC as the next frame's speculative detection fetch,
    OSSID_MERGED_FETCH=1, the default) is a pure transfer-scheduling choice:
    with finetuning crossing the stream, result rows must match the r3
    behavior (a separate completion RPC per deferred frame) exactly."""
    args = make_args(always_dtoid_mask=True, use_oracle_gt=True,
                     finetune_interval=4, n_fake_hypos=8)
    model = world["model"]
    sd0 = model.state_dict()
    monkeypatch.setenv("OSSID_SPEC_FETCH", "thread")

    def run_once(merged):
        monkeypatch.setenv("OSSID_MERGED_FETCH", merged)
        model.load_state_dict(sd0)
        model.reset_optimizer()
        model.clear_cache()
        loop = _build_loop(world, args)
        assert loop._merged_fetch == (merged == "1")
        return loop.run(progress=False)

    r_merged = run_once("1")
    r_split = run_once("0")
    assert sum(r["finetune"] for r in r_merged) >= 2
    _assert_rows_equal(r_merged, r_split)


def test_fetch_bundle_equivalence(world, monkeypatch):
    """OSSID_FETCH_BUNDLE=2 (frames N+1 and N+2 dispatched during frame N and
    fetched in ONE device_get — 0.5 fetch RPCs/frame) is a pure transfer-
    scheduling choice: with finetuning crossing the stream (which invalidates
    BOTH in-flight speculations and forces redispatch under the new weights),
    result rows must match the bundle=1 behavior exactly. Covers VERDICT r4
    item 3's exactness requirement (weights_version test extended to the
    paired path)."""
    args = make_args(always_dtoid_mask=True, use_oracle_gt=True,
                     finetune_interval=4, n_fake_hypos=8)
    model = world["model"]
    sd0 = model.state_dict()
    monkeypatch.setenv("OSSID_SPEC_FETCH", "thread")

    def run_once(bundle):
        monkeypatch.setenv("OSSID_FETCH_BUNDLE", bundle)
        monkeypatch.delenv("OSSID_PIPELINE_DEPTH", raising=False)
        model.load_state_dict(sd0)
        model.reset_optimizer()
        model.clear_cache()
        loop = _build_loop(world, args)
        assert loop._fetch_bundle == int(bundle)
        assert loop._pipeline_depth == int(bundle)  # default couples to bundle
        return loop.run(progress=False)

    r_pair = run_once("2")
    r_single = run_once("1")
    assert sum(r["finetune"] for r in r_pair) >= 2
    _assert_rows_equal(r_pair, r_single)


def test_fetch_bundle_production_flags(world, monkeypatch):
    """Bundle=2 under the bench's production transport flags (YUV 4:2:0 +
    depth-crop scoring) stays exact vs the fully synchronous loop
    (pipeline_scoring off)."""
    args = make_args(always_dtoid_mask=True, use_oracle_gt=True,
                     finetune_interval=4, n_fake_hypos=8,
                     yuv_transfer=True, zephyr_depth_crop=96)
    monkeypatch.setenv("OSSID_SPEC_FETCH", "thread")
    monkeypatch.setenv("OSSID_FETCH_BUNDLE", "2")
    r_on, r_off = _run_pipeline_pair(world, args)
    assert sum(r["finetune"] for r in r_on) >= 2
    _assert_rows_equal(r_on, r_off)


def test_frame_share_equivalence_and_contention(world, monkeypatch):
    """The per-(scene,im) shared frame/depth upload cache (+20%/+28% measured,
    r3) must be semantically invisible (VERDICT r3 weak #5): with the bench's
    production flags (YUV transport + depth-crop scoring), finetuning crossing
    the deferral boundary, the IO prefetch thread running, and a
    multi-target-per-image stream (2 objects/image, adjacent after
    sortTargets so the cache IS shared across targets and populated from both
    the prefetch thread and the dispatch path), result rows with sharing on
    and off must match exactly."""
    args = make_args(always_dtoid_mask=True, use_oracle_gt=True,
                     finetune_interval=4, n_fake_hypos=8,
                     yuv_transfer=True, zephyr_depth_crop=96)
    model = world["model"]
    sd0 = model.state_dict()

    def run_once(share):
        monkeypatch.setenv("OSSID_FRAME_SHARE", share)
        model.load_state_dict(sd0)
        model.reset_optimizer()
        model.clear_cache()
        loop = _build_loop(world, args)
        assert loop._frame_share == (share == "1")
        # multi-target-per-image stream: both objects on every image
        tgts = loop.test_loader.dataset.bop_dataset.targets
        per_img = {}
        for t in tgts:
            per_img.setdefault((t["scene_id"], t["im_id"]), set()).add(t["obj_id"])
        assert any(len(v) >= 2 for v in per_img.values())
        return loop.run(progress=False)

    r_share = run_once("1")
    r_plain = run_once("0")
    assert sum(r["finetune"] for r in r_share) >= 2
    _assert_rows_equal(r_share, r_plain)


def test_backward_stream(world):
    """--backward (ref online_learning.py:714): the test stream is processed
    in reverse target order via sortTargets(reverse=True). The loop must run
    the full pipeline on the reversed stream and emit rows in that order."""
    args = make_args(always_dtoid_mask=True, use_oracle_gt=True,
                     finetune_interval=4, n_fake_hypos=8, backward=True)
    model = world["model"]
    sd0 = model.state_dict()
    model.load_state_dict(sd0)
    model.reset_optimizer()
    model.clear_cache()
    loop = _build_loop(world, args)
    # the script applies the flag as sortTargets(reverse=args.backward)
    # (scripts/online_learning.py:290)
    loop.test_loader.dataset.sortTargets(reverse=args.backward)
    expected = [(t["obj_id"], t["scene_id"], t["im_id"])
                for t in loop.test_loader.dataset.bop_dataset.targets]
    # sortTargets orders by (scene, im, obj); backward reverses that key
    assert expected == sorted(
        expected, key=lambda t: (t[1], t[2], t[0]), reverse=True)
    rows = loop.run(progress=False)
    got = [(r["obj_id"], r["scene_id"], r["im_id"]) for r in rows]
    assert got == expected
    assert sum(r["finetune"] for r in rows) >= 1


def test_sift_hypos_in_loop(world, tmp_path_factory):
    """BASELINE config-4's defining feature driven through the LOOP (VERDICT
    r3 missing #4): real cv2 SIFT hypotheses (SiftHypoGen over the object's
    template grid) concatenate with the PPF/fake hypotheses on textured
    frames (nonzero time_sift, n_hypos grows), and a featureless frame (its
    rgb overwritten with a constant color, so cv2 SIFT finds zero keypoints)
    exercises the identity-fallback branch (time_sift None, 20 identity
    hypotheses; ref online_learning.py:423-437)."""
    cv2 = pytest.importorskip("cv2")
    if not hasattr(cv2, "SIFT_create"):
        pytest.skip("no SIFT in this cv2 build")
    import imageio.v2 as imageio

    from ossid_code_tpu.data.synthetic import (
        make_synthetic_bop, make_template_grid, make_zephyr_results_pkl,
    )
    from ossid_code_tpu.data.bop import BopDataset, BopDatasetArgs
    from ossid_code_tpu.data.dtoid_bop import get_dataloaders
    from ossid_code_tpu.data.templates import TemplateDataset
    from ossid_code_tpu.hypo.fake import FakeHypoGen
    from ossid_code_tpu.hypo.sift import SiftFeatureModel, SiftHypoGen
    from ossid_code_tpu.loop.online_learning import OnlineLearningLoop
    from ossid_code_tpu.render.mesh import make_wedge_mesh, texture_mesh

    root = str(tmp_path_factory.mktemp("siftworld"))
    objects = {
        1: texture_mesh(make_wedge_mesh(85, 62, 45, taper=0.55, shear=0.35),
                        amp=0.3, subdiv=3, seed=1),
        2: texture_mesh(make_wedge_mesh(70, 48, 55, taper=0.4, shear=-0.25),
                        amp=0.3, subdiv=3, seed=2),
    }
    make_synthetic_bop(root, n_frames=4, img_h=128, img_w=160, objects=objects)
    grid = os.path.join(root, "grid")
    make_template_grid(grid, objects, n_views=8)

    # blank one image: constant color = zero SIFT keypoints anywhere
    blank_im = 2
    rgb_path = os.path.join(root, "synth", "test", "000000", "rgb",
                            f"{blank_im:06d}.png")
    blank = np.full_like(imageio.imread(rgb_path), 128)
    imageio.imwrite(rgb_path, blank)

    import copy

    cfg = copy.deepcopy(world["cfg"])
    cfg.dataset.bop_root = root
    cfg.dataset.grid_root = grid
    bop = BopDataset(BopDatasetArgs(bop_root=root, dataset_name="synth"))
    zr_path = os.path.join(root, "zr.pkl")
    make_zephyr_results_pkl(zr_path, bop, score=50.0)
    cfg.dataset.zephyr_result_path = zr_path
    with open(zr_path, "rb") as f:
        zr_list = pickle.load(f)
    zephyr_results = {(r["obj_id"], r["scene_id"], r["im_id"]): r for r in zr_list}

    td = TemplateDataset(grid, list(objects))
    sift_gens = {}
    for oid in objects:
        fm = SiftFeatureModel().construct_from_templates(td, oid)
        K0 = np.asarray(bop.getDataByIds(oid, 0, 0)["scene_camera"]["cam_K"])
        sift_gens[oid] = SiftHypoGen(fm, K0, n_hypos=20)

    model = world["model"]
    model.clear_cache()
    # deterministic full-frame SIFT region: zero the seg head so the predicted
    # seg mask is empty and _dtoid_mask falls back to all-ones (the reference's
    # own <=25-pixel fallback, ref online_learning.py:386-387) — the frames
    # are textured, so cv2 SIFT then always finds keypoints on non-blanked
    # frames regardless of the (randomly initialized) detector's boxes
    sd = model.state_dict()
    seg_final = sd["params"]["correlation_model"]["seg_final"]
    seg_final["kernel"] = np.zeros_like(seg_final["kernel"])
    seg_final["bias"] = np.full_like(seg_final["bias"], -6.0)
    model.load_state_dict(sd)
    args = make_args(always_dtoid_mask=True, use_sift_hypos=True,
                     use_dtoid_segmask=True, no_finetune=True, n_fake_hypos=8)
    train_loader, _, test_loader = get_dataloaders(cfg, zr_list)
    test_loader.dataset.sortTargets()
    train_ds = train_loader.dataset
    train_ds.clearTargets()
    train_ds.zephyr_results = dict(zephyr_results)
    hypo_gens = {oid: FakeHypoGen(n_hypos=8, seed=oid) for oid in bop.obj_ids}
    loop = OnlineLearningLoop(
        args, cfg, model, bop, train_ds, test_loader, dict(zephyr_results),
        zephyr_model=world["zmodel"], hypo_gens=hypo_gens, sift_gens=sift_gens,
    )
    rows = loop.run(progress=False)

    masked = [r for r in rows if r["use_dtoid_mask"]]
    assert masked, "always_dtoid_mask rows missing"
    # every masked row carries concatenated SIFT hypotheses on top of the 8
    # fake ones (success: 1..20 RANSAC poses; fallback: exactly 20 identities)
    for r in masked:
        assert r["n_hypos"] > 8, r["n_hypos"]
    fallback = [r for r in masked if r["im_id"] == blank_im]
    assert fallback, "blanked frame missing from the stream"
    for r in fallback:
        assert r["time_sift"] is None  # identity-fallback branch
        assert r["n_hypos"] == 8 + 20
    ok_rows = [r for r in masked if r["time_sift"] not in (None, 0)]
    assert ok_rows, "no frame took the real SIFT-match branch"
    for r in ok_rows:
        assert r["time_sift"] > 0
