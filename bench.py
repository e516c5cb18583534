"""Headline benchmark: OSSID online-loop throughput on one TPU chip.

Runs the full per-frame pipeline on a synthetic 480x640 BOP scene — DTOID
zero-shot detection (10 templates), PPF hypothesis generation (native C++ if
built, else fake), Zephyr scoring of ~100 hypotheses on device, predicted-pose
depth render + visible-mask pseudo-label — and reports frames/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the BASELINE.md target of 10 frames/sec.

Progress goes to stderr; stdout carries only the JSON line.
"""

import json
import os
import sys
import time
import tempfile

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import argparse

    from ossid_code_tpu.core.config import default_config
    from ossid_code_tpu.data.synthetic import (
        make_synthetic_bop, make_template_grid, default_objects, make_zephyr_results_pkl,
    )
    from ossid_code_tpu.data.bop import BopDataset, BopDatasetArgs
    from ossid_code_tpu.data.dtoid_bop import get_dataloaders
    from ossid_code_tpu.models.dtoid.module import DtoidModel
    from ossid_code_tpu.models.zephyr.module import ZephyrModel
    from ossid_code_tpu.loop.online_learning import OnlineLearningLoop
    from ossid_code_tpu.hypo.fake import FakeHypoGen

    n_frames = int(os.environ.get("BENCH_FRAMES", "24"))
    n_hypos = int(os.environ.get("BENCH_HYPOS", "100"))

    root = tempfile.mkdtemp(prefix="ossid_bench_")
    log("building synthetic 480x640 world ...")
    make_synthetic_bop(root, n_frames=max(4, n_frames // 2), img_h=480, img_w=640)
    grid = os.path.join(root, "grid")
    make_template_grid(grid, default_objects(), n_views=10)

    cfg = default_config()
    cfg.dataset.bop_root = root
    cfg.dataset.test_dataset_name = "synth"
    cfg.dataset.grid_root = grid
    cfg.dataset.n_local_test = 10
    cfg.dataset.load_zephyr_result = True

    bop = BopDataset(BopDatasetArgs(bop_root=root, dataset_name="synth"))
    zr_path = os.path.join(root, "zr.pkl")
    make_zephyr_results_pkl(zr_path, bop, score=50.0)
    import pickle

    with open(zr_path, "rb") as f:
        zr_list = pickle.load(f)
    zephyr_results = {(r["obj_id"], r["scene_id"], r["im_id"]): r for r in zr_list}
    cfg.dataset.zephyr_result_path = zr_path

    log("initializing models ...")
    model = DtoidModel(cfg, seed=0)
    zmodel = ZephyrModel(num_points=512, inconst_ratio_th=100.0, seed=0, need_uv=False)

    train_loader, _, test_loader = get_dataloaders(cfg, zr_list)
    test_loader.dataset.sortTargets()
    train_ds = train_loader.dataset
    train_ds.clearTargets()
    train_ds.zephyr_results = dict(zephyr_results)

    # hypothesis generator: native PPF if available, else fake
    try:
        from ossid_code_tpu.hypo.ppf import PPFModelMeters, native_available

        if native_available():
            # throughput configuration: raw PPF hypotheses, ranking left to the
            # device scorer (refine_top>0 = the accuracy configuration used by
            # scripts/demo_e2e.py, ~5-10 ms per refined hypothesis on 1 core)
            hypo_gens = {
                oid: PPFModelMeters(
                    bop.getObjPath(oid), ModelSamplingDist=0.04,
                    scene_sampling_dist=0.05, ref_pt_rate=0.25, refine_top=0,
                )
                for oid in bop.obj_ids
            }
            log("hypothesis backend: native PPF")
        else:
            raise ImportError
    except Exception:
        hypo_gens = {oid: FakeHypoGen(n_hypos=n_hypos, seed=oid) for oid in bop.obj_ids}
        log("hypothesis backend: fake")

    args = argparse.Namespace(
        dataset_name="synth", exp_name="bench", use_offline_model=False,
        use_pretrained_dtoid=False, dtoid_weights_path=None, n_local_test=10,
        use_dtoid_segmask=False, ignore_dtoid_mask=False, always_dtoid_mask=True,
        use_oracle_gt=False, use_sift_hypos=False, test_seen=False, backward=False,
        use_maskrcnn=False, finetune_interval=10 ** 9, finetune_warmup=0,
        finetune_epochs=1, finetune_reset=False, finetune_batch_size=8,
        non_cum=False, save_each=False, raw_dtoid=False, no_finetune=True, fast=True,
        zephyr_depth_crop=int(os.environ.get("BENCH_DEPTH_CROP", "256")),
        yuv_transfer=os.environ.get("BENCH_YUV", "1") == "1",
    )
    loop = OnlineLearningLoop(
        args, cfg, model, bop, train_ds, test_loader, dict(zephyr_results),
        zephyr_model=zmodel, hypo_gens=hypo_gens, use_icp=False,
    )

    log("warmup pass (compiles) ...")
    t0 = time.perf_counter()
    loop.run(progress=False)
    log(f"warmup done in {time.perf_counter() - t0:.1f}s; timing ...")

    # best of 3 timed passes: the remote-TPU tunnel has multi-ms RPC jitter
    best = None
    for p in range(3):
        t0 = time.perf_counter()
        results = loop.run(progress=False)
        elapsed = time.perf_counter() - t0
        log(f"pass {p}: {len(results)} frames in {elapsed:.2f}s")
        if best is None or elapsed < best[0]:
            best = (elapsed, results)
    elapsed, results = best
    n = len(results)
    fps = n / elapsed

    hypos_scored = np.mean([r.get("n_hypos", n_hypos) for r in results])
    stage_keys = sorted({k for r in results for k in r if k.startswith("time_")})
    stages = " ".join(
        f"{k[5:]} {np.mean([r.get(k) or 0 for r in results]) * 1e3:.0f}ms"
        for k in stage_keys
    )
    log(f"{n} frames in {elapsed:.2f}s -> {fps:.2f} fps; mean stage times: {stages}")

    print(json.dumps({
        "metric": "online_loop_fps",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
