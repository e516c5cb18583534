"""Flagship-resolution (480x640) hermetic test on CPU (VERDICT r1 weak #5:
the 128x160 suite never exercised the real shapes — seg bit-packing w%8, the
29x39 heatmap/feature geometry (ref models/dtoid/network.py:404) — so shape
bugs could only surface on the TPU bench). One full online-loop pass: detect
-> mask -> hypotheses -> zephyr scoring -> render -> pseudo-label ->
finetune step, all at the default config's resolution."""

import argparse
import os
import pickle

import numpy as np
import pytest

from ossid_code_tpu.core.config import default_config
from tests.test_online_loop import make_args


@pytest.mark.slow
def test_fullres_online_loop(tmp_path_factory):
    from ossid_code_tpu.data.synthetic import (
        make_synthetic_bop, make_template_grid, default_objects, make_zephyr_results_pkl,
    )
    from ossid_code_tpu.data.bop import BopDataset, BopDatasetArgs
    from ossid_code_tpu.data.dtoid_bop import get_dataloaders
    from ossid_code_tpu.models.dtoid.module import DtoidModel
    from ossid_code_tpu.models.zephyr.module import ZephyrModel
    from ossid_code_tpu.hypo.fake import FakeHypoGen
    from ossid_code_tpu.loop.online_learning import OnlineLearningLoop

    root = str(tmp_path_factory.mktemp("bopworld480"))
    objects = {1: default_objects()[1]}
    make_synthetic_bop(root, n_frames=2, img_h=480, img_w=640, objects=objects)

    cfg = default_config()  # flagship 480x640, 29x39 heatmap, n_local_test=10
    cfg.dataset.bop_root = root
    cfg.dataset.test_dataset_name = "synth"
    cfg.dataset.grid_root = os.path.join(root, "grid")
    cfg.train.batch_size = 1
    cfg.dataset.load_zephyr_result = True

    bop = BopDataset(BopDatasetArgs(bop_root=root, dataset_name="synth"))
    make_template_grid(os.path.join(root, "grid"), objects, n_views=10)
    zr_path = os.path.join(root, "zephyr_results.pkl")
    make_zephyr_results_pkl(zr_path, bop, score=50.0)
    cfg.dataset.zephyr_result_path = zr_path
    with open(zr_path, "rb") as f:
        zr_list = pickle.load(f)
    zephyr_results = {(r["obj_id"], r["scene_id"], r["im_id"]): r for r in zr_list}

    model = DtoidModel(cfg, seed=0)
    zmodel = ZephyrModel(num_points=256, inconst_ratio_th=100.0, seed=0)

    train_loader, _, test_loader = get_dataloaders(cfg, zr_list)
    test_loader.dataset.sortTargets()
    train_ds = train_loader.dataset
    train_ds.clearTargets()
    train_ds.zephyr_results = {k: dict(v) for k, v in zephyr_results.items()}

    # finetune fires on the 2nd frame: the full train-step program compiles
    # and runs at 480x640 too
    args = make_args(always_dtoid_mask=True, use_oracle_gt=True,
                     finetune_interval=2, finetune_batch_size=1, n_fake_hypos=32,
                     n_local_test=10)
    loop = OnlineLearningLoop(
        args, cfg, model, bop, train_ds, test_loader,
        {k: dict(v) for k, v in zephyr_results.items()}, zephyr_model=zmodel,
        hypo_gens={1: FakeHypoGen(n_hypos=32, seed=1)}, use_icp=False,
    )
    results = loop.run(progress=False)

    assert len(results) == 2
    for r in results:
        assert r["use_dtoid_mask"]
        assert r["dtoid_pred_mask"].shape == (480, 640)
        assert r["pred_mask"].shape == (480, 640)
        assert r["n_hypos"] == 32
        assert np.isfinite(r["pred_score"])
        assert np.isfinite(r["pred_err"])
        assert np.isfinite(r["pp_err"]).all()
    # pose QUALITY is covered by the 128x160 loop tests and demo_e2e (the
    # un-anchored fake generator emits identity-rotation centroid poses);
    # this test pins the flagship SHAPES end-to-end
    assert sum(r["finetune"] for r in results) == 1
    # detection boxes live in processed-image coordinates == raw at 480x640
    bb = results[0]["dtoid_bbox"]
    assert (bb[:, 0] >= -1) .all() and (bb[:, 2] <= 641).all()
