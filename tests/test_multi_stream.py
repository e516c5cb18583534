"""Loop-level multi-camera serving farm (VERDICT r2 next-step 10): N streams
(= N scenes) drive detection through ONE sharded program on a 2-D
(frames x templates) mesh, share the detector weights and pseudo-label
buffer, and produce per-stream result rows."""

import argparse
import os
import pickle

import numpy as np
import pytest

from ossid_code_tpu.core.config import default_config

N_SCENES = 2
N_FRAMES = 4


def make_args(**kw):
    defaults = dict(
        dataset_name="synth", exp_name="ms", use_offline_model=False,
        use_pretrained_dtoid=False, dtoid_weights_path=None, n_local_test=4,
        use_dtoid_segmask=False, ignore_dtoid_mask=False, always_dtoid_mask=True,
        use_oracle_gt=True, use_sift_hypos=False, test_seen=False, backward=False,
        use_maskrcnn=False, finetune_interval=6, finetune_warmup=0,
        finetune_epochs=1, finetune_reset=False, finetune_batch_size=2,
        non_cum=False, save_each=False, raw_dtoid=False, no_finetune=False,
        fast=True, hypo_backend="fake", n_fake_hypos=8, zephyr_depth_crop=0,
        yuv_transfer=False,
    )
    defaults.update(kw)
    return argparse.Namespace(**defaults)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from ossid_code_tpu.data.synthetic import (
        make_synthetic_bop, make_template_grid, default_objects, make_zephyr_results_pkl,
    )
    from ossid_code_tpu.data.bop import BopDataset, BopDatasetArgs
    from ossid_code_tpu.models.dtoid.module import DtoidModel
    from ossid_code_tpu.models.zephyr.module import ZephyrModel

    root = str(tmp_path_factory.mktemp("msworld"))
    make_synthetic_bop(root, n_frames=N_FRAMES, img_h=128, img_w=160,
                       n_scenes=N_SCENES)
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


def test_multi_stream_loop(world):
    import jax
    from ossid_code_tpu.data.dtoid_bop import get_dataloaders
    from ossid_code_tpu.hypo.fake import FakeHypoGen
    from ossid_code_tpu.loop.multi_stream import MultiStreamLoop
    from ossid_code_tpu.parallel.mesh import make_mesh_2d

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh_2d(2, 4)

    cfg = world["cfg"]
    args = make_args()
    train_loader, _, test_loader = get_dataloaders(cfg, world["zr_list"])
    test_loader.dataset.sortTargets()
    train_ds = train_loader.dataset
    train_ds.clearTargets()
    zr = {k: dict(v) for k, v in world["zephyr_results"].items()}
    train_ds.zephyr_results = zr

    model = world["model"]
    wv0 = model.weights_version
    hypo_gens = {oid: FakeHypoGen(n_hypos=args.n_fake_hypos, seed=oid)
                 for oid in world["bop"].obj_ids}
    loop = MultiStreamLoop(
        args, cfg, model, world["bop"], train_ds, test_loader, zr,
        zephyr_model=world["zmodel"], hypo_gens=hypo_gens, use_icp=False,
        mesh=mesh,
    )
    per_stream = loop.run(progress=False)

    # one result list per camera stream, every (frame, object) covered
    assert sorted(per_stream) == list(range(N_SCENES))
    for sid, rows in per_stream.items():
        assert len(rows) == N_FRAMES * 2  # 2 objects per frame
        assert all(r["scene_id"] == sid for r in rows)
        assert {r["obj_id"] for r in rows} == {1, 2}
        assert all(np.isfinite(r["pred_score"]) for r in rows)
        assert all(r["n_hypos"] == args.n_fake_hypos for r in rows)
        # pose quality: fake hypos are GT+noise, the scorer picks a finite one
        assert np.mean([r["pred_add01d"] for r in rows]) >= 0.0

    # shared self-supervision: pooled buffer finetuned the SHARED weights
    all_rows = [r for rows in per_stream.values() for r in rows]
    assert sum(r["finetune"] for r in all_rows) >= 2
    assert model.weights_version > wv0


def test_farm_detect_matches_single_device(world):
    """The sharded farm detection program returns the same detections as the
    model's own single-device detect program for each frame."""
    import jax
    from ossid_code_tpu.data.dtoid_bop import get_dataloaders
    from ossid_code_tpu.loop.multi_stream import make_farm_detect
    from ossid_code_tpu.parallel.mesh import make_mesh_2d

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh_2d(2, 4)
    model = world["model"]
    model.clear_cache()

    _, _, test_loader = get_dataloaders(world["cfg"], world["zr_list"])
    ds = test_loader.dataset
    # two frames of the same object from the two streams
    idxs = [i for i, t in enumerate(ds.bop_dataset.targets) if t["obj_id"] == 1][:2]
    assert len(idxs) == 2
    samples = [ds[i] for i in idxs]
    imgs = np.stack([
        (np.clip(np.asarray(s["img"]), 0, 1) * 255).round().astype(np.uint8)
        for s in samples
    ])
    local, glob = model.get_template_features(1, samples[0]["limg"], samples[0]["lmask"])

    farm = make_farm_detect(model, mesh)
    outs = jax.device_get(farm(model.params, model.batch_stats, imgs, local, glob))

    for i, s in enumerate(samples):
        ref = model.fetch_detections(model.detect_async(
            {"img": imgs[i], "obj_id": 1, "limg": s["limg"], "lmask": s["lmask"]}
        ))
        np.testing.assert_allclose(outs["pred_scores"][i], ref["pred_scores"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(outs["pred_bbox"][i], ref["pred_bbox"],
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(outs["pred_template_ids"][i],
                                      ref["pred_template_ids"])
