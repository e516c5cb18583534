"""The Zephyr scorer must LEARN on the synthetic world: after offline
training, its argmax hypothesis should beat the untrained scorer."""

import os
import pytest
import numpy as np


@pytest.mark.slow
def test_zephyr_offline_training_improves(tmp_path):
    from ossid_code_tpu.data.synthetic import make_synthetic_bop
    from ossid_code_tpu.data.bop import BopDataset, BopDatasetArgs
    from ossid_code_tpu.models.zephyr.module import ZephyrModel
    from ossid_code_tpu.render.mesh import load_ply
    from ossid_code_tpu.loop.online_learning import model_cloud_from_ply
    from ossid_code_tpu.train.zephyr_offline import ZephyrOfflineTrainer

    root = str(tmp_path)
    make_synthetic_bop(root, n_frames=4, img_h=96, img_w=128)
    bop = BopDataset(BopDatasetArgs(bop_root=root, dataset_name="synth"))
    clouds = {
        oid: model_cloud_from_ply(load_ply(bop.getObjPath(oid)), n_points=256)
        for oid in bop.obj_ids
    }
    model = ZephyrModel(num_points=64, inconst_ratio_th=1000.0, seed=0)
    trainer = ZephyrOfflineTrainer(model, bop, clouds, n_hypos=16, seed=0)

    acc0 = trainer.eval_top1(max_frames=4)
    first_loss = trainer.train_epoch(max_frames=8, seed=0)
    losses = [trainer.train_epoch(max_frames=8, seed=e) for e in range(1, 4)]
    acc1 = trainer.eval_top1(max_frames=4)

    assert np.isfinite(first_loss)
    assert losses[-1] < first_loss, (first_loss, losses)
    # trained scorer should rank a near-GT hypothesis first most of the time
    assert acc1 >= max(acc0, 0.5), (acc0, acc1)
