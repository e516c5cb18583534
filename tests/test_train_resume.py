"""Offline-trainer full resume: optimizer state + epoch survive a checkpoint
round trip (ref train.py:27-41,97 — Lightning resume restores both;
VERDICT r1 missing #5)."""

import os

import numpy as np
import pytest


def _small_cfg():
    from ossid_code_tpu.core.config import default_config

    cfg = default_config()
    cfg.model.img_h, cfg.model.img_w = 64, 64
    cfg.model.heatmap_h, cfg.model.heatmap_w = 3, 3
    cfg.train.batch_size = 2
    return cfg


def _batch(b=2, rng=None):
    rng = rng or np.random.default_rng(0)
    ts = 124
    return {
        "img": rng.uniform(0, 1, (b, 64, 64, 3)).astype(np.float32),
        "limg": rng.uniform(0, 1, (b, ts, ts, 3)).astype(np.float32),
        "lmask": np.ones((b, ts, ts, 1), np.float32),
        "gimg": rng.uniform(0, 1, (b, ts, ts, 3)).astype(np.float32),
        "gmask": np.ones((b, ts, ts, 1), np.float32),
        "bbox_gt": np.asarray([[[10, 10, 50, 50, 1]]] * b, np.float32),
        "heatmap": rng.uniform(0, 1, (b, 3, 3, 1)).astype(np.float32),
        "mask": (rng.uniform(0, 1, (b, 64, 64, 1)) > 0.8).astype(np.float32),
    }


@pytest.mark.slow
def test_trainer_full_resume(tmp_path):
    import jax
    from ossid_code_tpu.models.dtoid.module import DtoidModel
    from ossid_code_tpu.train.offline import OfflineTrainer

    cfg = _small_cfg()
    loader = [_batch()]

    model = DtoidModel(cfg, seed=0)
    trainer = OfflineTrainer(model, cfg, n_devices=1, ckpt_dir=str(tmp_path))
    trainer.train_epoch(loader)  # one (slow CPU) epoch; writes last.ckpt
    assert trainer.epoch == 1
    assert os.path.exists(tmp_path / "last.ckpt")

    # fresh model + trainer; restore; must resume at epoch 1 with identical
    # params AND optimizer state (first/second moments, amsgrad max, step count)
    model_b = DtoidModel(cfg, seed=1)
    trainer_b = OfflineTrainer(model_b, cfg, n_devices=1, ckpt_dir=None)
    full = trainer_b.restore_trainer_state(str(tmp_path / "last.ckpt"))
    assert full
    assert trainer_b.epoch == 1

    for a, b in zip(jax.tree_util.tree_leaves(model.params),
                    jax.tree_util.tree_leaves(model_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    la = jax.tree_util.tree_leaves(trainer.opt_state)
    lb = jax.tree_util.tree_leaves(trainer_b.opt_state)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the restored optimizer is past step 0 (moments actually carried over)
    assert any(np.asarray(l).ndim == 0 and np.asarray(l) > 0 for l in lb)

    # weights-only checkpoints resume the model but not the schedule
    from ossid_code_tpu.core.checkpoint import save_checkpoint

    save_checkpoint(str(tmp_path / "w.ckpt"), model.state_dict())
    assert not trainer_b.restore_trainer_state(str(tmp_path / "w.ckpt"))
