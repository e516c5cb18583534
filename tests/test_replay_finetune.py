"""Device-resident finetune replay (loop/replay.py): the u8/bit-packed feed
must be bit-exact vs the host float path, and the online loop must actually
serve finetune events from the buffer.

The reference re-reads and re-ships every buffered frame per finetune pass
(ref scripts/online_learning.py:650-679); the replay path trains from the
detection-time HBM uploads instead. Exactness matters because the pipelined
loop's semantics proofs (test_pipeline_equivalence*) assume finetuning is a
pure function of the gated frames, not of their transport."""

import argparse
import copy
import os
import pickle

import numpy as np
import pytest

from ossid_code_tpu.core.config import default_config


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from ossid_code_tpu.data.synthetic import (
        make_synthetic_bop, make_template_grid, default_objects, make_zephyr_results_pkl,
    )
    from ossid_code_tpu.data.bop import BopDataset, BopDatasetArgs
    from ossid_code_tpu.models.dtoid.module import DtoidModel

    root = str(tmp_path_factory.mktemp("replayworld"))
    make_synthetic_bop(root, n_frames=5, img_h=128, img_w=160)
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
    cfg.dataset.load_zephyr_result = True

    bop = BopDataset(BopDatasetArgs(bop_root=root, dataset_name="synth"))
    zr_path = os.path.join(root, "zephyr_results.pkl")
    make_zephyr_results_pkl(zr_path, bop, score=50.0)
    cfg.dataset.zephyr_result_path = zr_path
    with open(zr_path, "rb") as f:
        zr_list = pickle.load(f)
    model = DtoidModel(cfg, seed=0)
    return dict(root=root, cfg=cfg, bop=bop, model=model, zr_list=zr_list)


def _train_ds(world):
    from ossid_code_tpu.data.dtoid_bop import get_dataloaders

    train_loader, _, _ = get_dataloaders(world["cfg"], world["zr_list"])
    ds = train_loader.dataset
    ds.clearTargets()
    ds.zephyr_results = {
        (r["obj_id"], r["scene_id"], r["im_id"]): dict(r) for r in world["zr_list"]
    }
    return ds


def test_replay_annotations_bit_exact(world):
    """replay_annotations' u8 arrays decode to exactly __getitem__'s f32
    templates/bbox/heatmap when the rng starts from the same state."""
    ds = _train_ds(world)
    bop = world["bop"]
    t = bop.targets[0]
    obj_id, scene_id, im_id = int(t["obj_id"]), int(t["scene_id"]), int(t["im_id"])
    ds.addTarget(obj_id, scene_id, im_id)
    bop_data = bop.getDataByIds(obj_id, scene_id, im_id)
    mask = np.asarray(bop_data["mask_gt_visib"]) > 0
    ds.updateZephyrMask(obj_id, scene_id, im_id, mask, 50.0)

    rng_state = copy.deepcopy(ds.rng.bit_generator.state)
    host = ds[0]
    ds.rng.bit_generator.state = copy.deepcopy(rng_state)
    ann = ds.replay_annotations(obj_id, bop_data["mat_gt"], mask)

    np.testing.assert_array_equal(ann["limg_u8"].astype(np.float32) / 255.0, host["limg"])
    np.testing.assert_array_equal(ann["lmask_u8"].astype(np.float32), host["lmask"])
    np.testing.assert_array_equal(ann["gimg_u8"].astype(np.float32) / 255.0, host["gimg"])
    np.testing.assert_array_equal(ann["gmask_u8"].astype(np.float32), host["gmask"])
    np.testing.assert_array_equal(ann["bbox_gt"], host["bbox_gt"])
    np.testing.assert_array_equal(ann["heatmap"], host["heatmap"])


def test_train_step_u8_matches_f32(world):
    """One step through train_step_u8 (u8 frame + packed mask bits) must give
    the same losses and weights as train_step on the dense f32 batch."""
    import jax

    ds = _train_ds(world)
    bop = world["bop"]
    for t in bop.targets[:2]:
        obj_id, scene_id, im_id = int(t["obj_id"]), int(t["scene_id"]), int(t["im_id"])
        ds.addTarget(obj_id, scene_id, im_id)
        mask = np.asarray(bop.getDataByIds(obj_id, scene_id, im_id)["mask_gt_visib"]) > 0
        ds.updateZephyrMask(obj_id, scene_id, im_id, mask, 50.0)

    rng_state = copy.deepcopy(ds.rng.bit_generator.state)
    samples = [ds[0], ds[1]]
    feed_f32 = {
        k: np.stack([s[k] for s in samples])
        for k in ("img", "limg", "lmask", "gimg", "gmask", "bbox_gt", "heatmap", "mask")
    }

    ds.rng.bit_generator.state = copy.deepcopy(rng_state)
    feed_u8 = {"img_u8": [], "mask_bits": [], "limg_u8": [], "lmask_u8": [],
               "gimg_u8": [], "gmask_u8": [], "bbox_gt": [], "heatmap": []}
    for t in bop.targets[:2]:
        obj_id, scene_id, im_id = int(t["obj_id"]), int(t["scene_id"]), int(t["im_id"])
        bop_data = bop.getDataByIds(obj_id, scene_id, im_id)
        mask = ds.zephyr_results[(obj_id, scene_id, im_id)]["pred_mask_visib"]
        ann = ds.replay_annotations(obj_id, bop_data["mat_gt"], mask)
        feed_u8["img_u8"].append(np.asarray(bop_data["img"]))
        feed_u8["mask_bits"].append(
            np.packbits(np.asarray(mask).reshape(-1) > 0, bitorder="little")
        )
        for k in ("limg_u8", "lmask_u8", "gimg_u8", "gmask_u8", "bbox_gt", "heatmap"):
            feed_u8[k].append(ann[k])
    feed_u8 = {k: np.stack(v) for k, v in feed_u8.items()}

    model = world["model"]
    sd0 = model.state_dict()
    opt0 = jax.device_get(model.opt_state)

    def restore():
        model.load_state_dict(sd0)
        model.opt_state = jax.device_put(opt0)

    restore()
    m_f32 = {k: float(v) for k, v in model.train_step_async(feed_f32).items()}
    p_f32 = model.state_dict()

    restore()
    m_u8 = {k: float(v) for k, v in model.train_step_u8_async(feed_u8).items()}
    p_u8 = model.state_dict()

    for k in m_f32:
        assert abs(m_f32[k] - m_u8[k]) < 1e-5, (k, m_f32[k], m_u8[k])
    flat32, _ = jax.tree_util.tree_flatten(p_f32)
    flatu8, _ = jax.tree_util.tree_flatten(p_u8)
    for a, b in zip(flat32, flatu8):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    restore()


def test_loop_uses_replay(world):
    """End-to-end: the online loop's finetune events are served by the replay
    buffer (no host f32 re-ship) and still produce finite losses."""
    from ossid_code_tpu.data.dtoid_bop import get_dataloaders
    from ossid_code_tpu.hypo.fake import FakeHypoGen
    from ossid_code_tpu.loop.online_learning import OnlineLearningLoop
    from ossid_code_tpu.models.zephyr.module import ZephyrModel

    args = argparse.Namespace(
        dataset_name="synth", exp_name="t", use_offline_model=False,
        use_pretrained_dtoid=False, dtoid_weights_path=None, n_local_test=4,
        use_dtoid_segmask=False, ignore_dtoid_mask=False, always_dtoid_mask=True,
        use_oracle_gt=True, use_sift_hypos=False, test_seen=False, backward=False,
        use_maskrcnn=False, finetune_interval=4, finetune_warmup=0,
        finetune_epochs=1, finetune_reset=False, finetune_batch_size=2,
        non_cum=False, save_each=False, raw_dtoid=False, no_finetune=False,
        fast=True, hypo_backend="fake", n_fake_hypos=8, zephyr_depth_crop=0,
        yuv_transfer=False,
    )
    cfg = world["cfg"]
    _, _, test_loader = get_dataloaders(cfg, world["zr_list"])
    test_loader.dataset.sortTargets()
    train_ds = _train_ds(world)
    zmodel = ZephyrModel(num_points=128, inconst_ratio_th=100.0, seed=0)
    hypo_gens = {oid: FakeHypoGen(n_hypos=8, seed=oid) for oid in world["bop"].obj_ids}
    loop = OnlineLearningLoop(
        args, cfg, world["model"], world["bop"], train_ds, test_loader,
        train_ds.zephyr_results, zephyr_model=zmodel,
        hypo_gens=hypo_gens, use_icp=False,
    )
    results = loop.run(progress=False)
    n_ft = sum(r["finetune"] for r in results)
    assert n_ft >= 2
    assert loop.replay is not None and loop.replay.n_replay_events == n_ft
    assert len(loop.replay) > 0
    for logs in loop.finetune_logs:
        for epoch in logs:
            for step in epoch:
                assert np.isfinite(step["train_loss"])
