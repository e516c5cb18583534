"""The Zephyr scorer must LEARN to rank REAL PPF hypothesis sets — the
distribution the online loop consumes. Round 3 proved synthetic
GT-perturbation sets are a misleading proxy (BCE-on-synthetic read healthy at
a 0.15 real pick rate, RESULTS.md), so both training and the pinned floor here
run on native-PPF hypothesis sets with oracle visible masks (VERDICT r3
next-step 4: a suite regression floor for the r3 ranking recipe)."""

import os
import subprocess
import pytest
import numpy as np


def _ensure_native():
    from ossid_code_tpu.hypo.ppf import native_available

    if native_available():
        return True
    native_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native")
    try:
        subprocess.run(["make", "-C", native_dir], check=True,
                       capture_output=True, timeout=300)
    except Exception:
        return False
    return native_available()


@pytest.mark.slow
def test_zephyr_training_pick_floor_on_real_ppf_sets(tmp_path):
    """Deterministic fixture: synthetic world, native PPF hypothesis sets,
    the shipped training recipe (listwise ranking + class-balanced BCE +
    mostly-real-PPF training sets, train/zephyr_offline.py). Pins a pick-rate
    floor so the r3 ranking recipe cannot silently regress."""
    if not _ensure_native():
        pytest.skip("native PPF library not built and make failed")

    from ossid_code_tpu.data.synthetic import make_synthetic_bop
    from ossid_code_tpu.data.bop import BopDataset, BopDatasetArgs
    from ossid_code_tpu.hypo.ppf import PPFModelMeters
    from ossid_code_tpu.models.zephyr.module import ZephyrModel
    from ossid_code_tpu.render.mesh import load_ply
    from ossid_code_tpu.loop.online_learning import model_cloud_from_ply
    from ossid_code_tpu.train.zephyr_offline import ZephyrOfflineTrainer

    root = str(tmp_path)
    make_synthetic_bop(root, n_frames=6, img_h=240, img_w=320)
    bop = BopDataset(BopDatasetArgs(bop_root=root, dataset_name="synth"))
    clouds = {
        oid: model_cloud_from_ply(load_ply(bop.getObjPath(oid)), n_points=512)
        for oid in bop.obj_ids
    }
    gens = {
        oid: PPFModelMeters(bop.getObjPath(oid), ModelSamplingDist=0.04,
                            scene_sampling_dist=0.04, ref_pt_rate=0.3,
                            refine_top=30, max_poses=128)
        for oid in bop.obj_ids
    }
    model = ZephyrModel(num_points=64, inconst_ratio_th=1000.0, seed=0,
                        need_uv=False, align_feats=True)
    trainer = ZephyrOfflineTrainer(model, bop, clouds, hypo_gens=gens,
                                   n_hypos=32, seed=0)

    first_loss = trainer.train_epoch(max_frames=8, seed=0)
    losses = [trainer.train_epoch(max_frames=8, seed=e) for e in range(1, 6)]
    assert np.isfinite(first_loss)
    assert losses[-1] < first_loss, (first_loss, losses)
    cal = trainer.calibrate_align_head(max_frames=8)
    assert cal is not None and np.isfinite(cal["weight"])

    pick, ceiling = trainer.eval_top1(max_frames=12, return_ceiling=True)
    # fixture sanity: PPF must supply a winnable set on most frames — if this
    # drops, the fixture (not the scorer) broke
    assert ceiling >= 0.6, f"PPF ceiling collapsed: {ceiling}"
    # the regression floor for the shipped ranking recipe (measured band on
    # this fixture: see RESULTS.md round 4)
    assert pick >= 0.5, f"scorer pick {pick} (ceiling {ceiling})"
