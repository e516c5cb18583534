"""Headline benchmark: OSSID online-loop throughput on one TPU chip.

Two profiles run on the full per-frame pipeline over a synthetic 480x640 BOP
scene (DTOID zero-shot detection with 10 templates, native PPF hypothesis
generation, Zephyr scoring on device, predicted-pose depth render +
visible-mask pseudo-label):

  * throughput — the serving config (no finetuning, no refinement), the
    BASELINE.md headline;
  * gating — BASELINE config-3 semantics (ref readme.md:74,
    online_learning.py:704-708): finetune_interval=32, finetune_epochs=1,
    always_dtoid_mask, pseudo-labels every frame (oracle gate), device-side
    dense refinement of the top-24 hypotheses (Halcon DensePoseRefinement
    role) and M up to 512 — the self-supervision half of the product,
    including amortized finetune wall time.

Prints one JSON line per profile; the LAST line is the headline
{"metric": "online_loop_fps", ...} with vs_baseline against the 10 fps target.
Progress goes to stderr; stdout carries only the JSON lines. Non-headline
lines stream out the moment they are measured; the headline (measured first)
is held to the end and flushed by a SIGTERM/atexit handler if the driver's
wall clock kills the run, so already-measured fps can never be lost.

Env knobs: BENCH_FRAMES, BENCH_HYPOS, BENCH_DEPTH_CROP, BENCH_YUV,
BENCH_PROFILE=throughput|gating|all (default all), BENCH_GATING_FRAMES,
BENCH_GATING_HYPOS, BENCH_REFINE_TOP, BENCH_BF16_FINETUNE,
BENCH_DEADLINE (secs; skip the quality demo when already past it).
"""

import atexit
import json
import os
import signal
import sys
import time
import tempfile

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---- unlosable artifact machinery (VERDICT r4 item 1) ----------------------
# Every metric line is printed+flushed the moment it is measured; ONLY the
# headline {"metric": "online_loop_fps"} is held so it lands last by
# construction. If the driver's wall clock kills the run (SIGTERM from
# `timeout`), the handler flushes the held headline before exiting, so an
# over-budget quality profile can no longer destroy already-measured fps.
_HELD = {"line": None, "printed": False}


def emit(line):
    print(json.dumps(line))
    sys.stdout.flush()


def hold_headline(line):
    _HELD["line"] = line


def flush_headline():
    if _HELD["line"] is not None and not _HELD["printed"]:
        _HELD["printed"] = True
        emit(_HELD["line"])


def _on_term(signum, frame):  # noqa: ARG001 — signal handler signature
    log(f"signal {signum} received; flushing held headline and exiting")
    flush_headline()
    # os._exit: worker/probe threads may be stuck inside the jax runtime and
    # normal teardown would abort (std::terminate) trying to join them
    os._exit(124)


def build_world(n_frames):
    from ossid_code_tpu.core.config import default_config
    from ossid_code_tpu.data.synthetic import (
        make_synthetic_bop, make_template_grid, default_objects, make_zephyr_results_pkl,
    )
    from ossid_code_tpu.data.bop import BopDataset, BopDatasetArgs

    root = tempfile.mkdtemp(prefix="ossid_bench_")
    log(f"building synthetic 480x640 world ({n_frames} frames) ...")
    make_synthetic_bop(root, n_frames=max(4, n_frames // 2), img_h=480, img_w=640)
    grid = os.path.join(root, "grid")
    make_template_grid(grid, default_objects(), n_views=10)

    cfg = default_config()
    cfg.dataset.bop_root = root
    cfg.dataset.test_dataset_name = "synth"
    cfg.dataset.grid_root = grid
    cfg.dataset.n_local_test = 10
    cfg.dataset.load_zephyr_result = True
    # decoded/processed frame caches sized to the gating profile's finetune
    # buffer: the finetune pass then reuses the stream's own decodes
    cfg.dataset.cache_frames = 80
    cfg.dataset.proc_cache_frames = 80

    bop = BopDataset(BopDatasetArgs(bop_root=root, dataset_name="synth"))
    zr_path = os.path.join(root, "zr.pkl")
    make_zephyr_results_pkl(zr_path, bop, score=50.0)
    import pickle

    with open(zr_path, "rb") as f:
        zr_list = pickle.load(f)
    zephyr_results = {(r["obj_id"], r["scene_id"], r["im_id"]): r for r in zr_list}
    cfg.dataset.zephyr_result_path = zr_path
    return cfg, bop, zr_list, zephyr_results


def ensure_native():
    """Build the native host libraries if absent (fresh checkouts: native/*.so
    is gitignored). Without them the bench silently degrades to FakeHypoGen +
    the python rasterizer — numbers from that configuration measure the wrong
    product (measured: gating 9.9 -> 3.1 fps)."""
    native_dir_ = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
    libs = [os.path.join(native_dir_, f"libossid_{n}.so")
            for n in ("ppf", "raster", "icp")]
    if all(os.path.exists(p) for p in libs):
        return
    import subprocess

    native_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
    log("native libs missing; building (make -C native) ...")
    try:
        subprocess.run(["make", "-C", native_dir], check=True,
                       stdout=sys.stderr, stderr=sys.stderr, timeout=300)
    except Exception as e:  # noqa: BLE001 — bench still runs, just degraded
        log(f"WARNING: native build failed ({e}); falling back to fake "
            f"hypothesis generation + python rasterizer — fps will NOT "
            f"reflect the real pipeline")


def build_ppf_gens(bop, max_poses):
    from ossid_code_tpu.hypo.ppf import PPFModelMeters, native_available

    if not native_available():
        raise ImportError("native PPF library not built")
    return {
        oid: PPFModelMeters(
            bop.getObjPath(oid), ModelSamplingDist=0.04,
            scene_sampling_dist=0.05, ref_pt_rate=0.25, refine_top=0,
            max_poses=max_poses,
        )
        for oid in bop.obj_ids
    }


def make_loop(cfg, bop, zr_list, zephyr_results, model, zmodel, hypo_gens, args):
    from ossid_code_tpu.data.dtoid_bop import get_dataloaders
    from ossid_code_tpu.loop.online_learning import OnlineLearningLoop

    train_loader, _, test_loader = get_dataloaders(cfg, zr_list)
    test_loader.dataset.sortTargets()
    train_ds = train_loader.dataset
    train_ds.clearTargets()
    train_ds.zephyr_results = dict(zephyr_results)
    return OnlineLearningLoop(
        args, cfg, model, bop, train_ds, test_loader, dict(zephyr_results),
        zephyr_model=zmodel, hypo_gens=hypo_gens, use_icp=False,
    )


def time_loop(loop, name, passes=3, reset_each=None):
    from ossid_code_tpu.utils.rpc_stats import STATS

    log(f"[{name}] warmup pass (compiles) ...")
    t0 = time.perf_counter()
    if reset_each:
        reset_each()
    loop.run(progress=False)
    log(f"[{name}] warmup done in {time.perf_counter() - t0:.1f}s; timing ...")
    best = None
    pass_fps = []
    for p in range(passes):
        if reset_each:
            reset_each()
        STATS.reset()
        t0 = time.perf_counter()
        results = loop.run(progress=False)
        elapsed = time.perf_counter() - t0
        pass_fps.append(round(len(results) / elapsed, 2))
        log(f"[{name}] pass {p}: {len(results)} frames in {elapsed:.2f}s "
            f"({len(results) / elapsed:.2f} fps)")
        # speculation + fetch-RPC accounting per pass: a degraded run must be
        # diagnosable from the artifact (spec misses vs tunnel RPC inflation)
        log(f"[{name}] pass {p} rpc: {STATS.summary(len(results))}")
        if best is None or elapsed < best[0]:
            best = (elapsed, results, STATS.snapshot(),
                    STATS.spec_hit_rate(), STATS.fetch_rpcs_per_frame(len(results)))
    elapsed, results, rpc_snap, spec_hit, rpc_pf = best
    fps = len(results) / elapsed
    stage_keys = sorted({k for r in results for k in r if k.startswith("time_")})
    stages = " ".join(
        f"{k[5:]} {np.mean([r.get(k) or 0 for r in results]) * 1e3:.0f}ms"
        for k in stage_keys
    )
    n_ft = sum(bool(r.get("finetune")) for r in results)
    hypos = np.mean([r.get("n_hypos", 0) for r in results])
    log(f"[{name}] {len(results)} frames in {elapsed:.2f}s -> {fps:.2f} fps; "
        f"mean hypos {hypos:.0f}; finetunes {n_ft}; mean stage times: {stages}")
    # all pass times + median go into the artifact so best-of-N selection
    # bias is visible and round-over-round comparisons can use the median
    # (ADVICE r4: best-of-3 vs best-of-2 inflation)
    diag = {"spec_hit_rate": None if spec_hit is None else round(spec_hit, 3),
            "fetch_rpc_per_frame": round(rpc_pf, 2),
            "pass_fps": pass_fps,
            "median_fps": round(float(np.median(pass_fps)), 2),
            "rpc_ms": {k: round(t / max(n, 1) * 1e3, 1)
                       for k, (n, t) in rpc_snap["rpcs"].items()}}
    return fps, results, diag


def wait_for_tunnel(probe_timeout_s=90.0, retry_sleep_s=60.0):
    """Block until a tiny host<->device round-trip completes, or give up.

    During a tunnel outage jax.device_put never returns (it cannot be
    cancelled either), so each attempt runs on a daemon thread with a
    watchdog timeout. Total wait is bounded by BENCH_TUNNEL_WAIT seconds
    (default 1800); returns False if the tunnel never recovers."""
    import threading

    import jax

    max_wait_s = float(os.environ.get("BENCH_TUNNEL_WAIT", "1800"))
    ok = threading.Event()
    wait_for_tunnel.saw_hang = False

    def attempt():
        try:
            np.asarray(jax.device_get(jax.device_put(np.zeros(8, np.float32))))
            ok.set()
        except Exception as e:  # noqa: BLE001 — any failure = not healthy yet
            log(f"tunnel probe error: {e}")

    deadline = time.monotonic() + max_wait_s
    first = True
    while True:
        t = threading.Thread(target=attempt, daemon=True)
        t.start()
        t.join(timeout=probe_timeout_s)
        if ok.is_set():
            if not first:
                log("tunnel recovered; proceeding")
            return True
        if time.monotonic() >= deadline:
            return False
        wait_for_tunnel.saw_hang = True
        log(f"tunnel probe hung >{probe_timeout_s:.0f}s (outage); "
            f"retrying for up to {max(0.0, deadline - time.monotonic()):.0f}s more ...")
        first = False
        time.sleep(min(retry_sleep_s, max(0.0, deadline - time.monotonic())))


def measure_probe():
    """Median round-trip of a tiny transfer (ms). The remote tunnel's per-RPC
    latency drifts between runs AND within a run; recording it at the start
    and the end makes fps numbers interpretable (mid-run degradation vs slow
    code — VERDICT r4 item 10). ~25-30 ms is healthy; >=40 ms inflates every
    RPC-bound stage."""
    import jax

    probe = np.zeros(8, np.float32)
    jax.device_get(jax.device_put(probe))  # connection setup outside timing
    rtts = []
    for _ in range(12):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(jax.device_put(probe)))
        rtts.append((time.perf_counter() - t0) * 1e3)
    log(f"tunnel probe: median round-trip {np.median(rtts):.1f} ms "
        f"(min {min(rtts):.1f}, max {max(rtts):.1f})")
    return round(float(np.median(rtts)), 1)


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import argparse

    t_start = time.monotonic()
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)
    atexit.register(flush_headline)

    # persistent compilation cache: reruns skip the ~4-5 min of TPU warmup
    # compiles (the cache keys on HLO+backend, so TPU entries live beside the
    # test suite's CPU-mesh entries)
    from ossid_code_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from ossid_code_tpu.models.dtoid.module import DtoidModel
    from ossid_code_tpu.models.zephyr.module import ZephyrModel
    from ossid_code_tpu.hypo.fake import FakeHypoGen

    profile = os.environ.get("BENCH_PROFILE", "all")
    n_frames = int(os.environ.get("BENCH_FRAMES", "24"))
    n_hypos = int(os.environ.get("BENCH_HYPOS", "100"))
    gating_frames = int(os.environ.get("BENCH_GATING_FRAMES", "72"))
    gating_hypos = int(os.environ.get("BENCH_GATING_HYPOS", "256"))
    refine_top = int(os.environ.get("BENCH_REFINE_TOP", "24"))
    bf16_finetune = os.environ.get("BENCH_BF16_FINETUNE", "1") == "1"
    depth_crop = int(os.environ.get("BENCH_DEPTH_CROP", "256"))
    yuv = os.environ.get("BENCH_YUV", "1") == "1"

    ensure_native()

    # The tunnel has genuine multi-hour OUTAGES where even an 8-float
    # device_put hangs forever (RESULTS.md). Probe through a watchdog thread
    # BEFORE building the world so an outage surfaces as a bounded, loud
    # failure instead of an indefinite hang that loses the round's bench run.
    import jax

    if not wait_for_tunnel():
        log("FATAL: TPU tunnel unreachable (tiny device_put hung on every "
            "probe); no fps can be measured. Re-run when the tunnel recovers.")
        # os._exit: the hung probe thread is stuck inside the runtime and
        # normal teardown aborts (std::terminate) trying to join it
        os._exit(2)

    world_frames = max(n_frames, gating_frames if profile in ("all", "gating") else 0)
    cfg, bop, zr_list, zephyr_results = build_world(world_frames)

    tunnel_rpc_ms = measure_probe()

    log("initializing models ...")
    # BENCH_BF16_FINETUNE=1 (default): mixed-precision finetune steps (bf16
    # fwd/bwd, f32 master weights — the standard TPU recipe; only the gating
    # profile finetunes). Measured on the real v5e: 114.7 -> 74.5 ms/step at
    # b=8, gating profile 11.5 -> 12.8 fps; loss matches f32 within 5%
    # (unit-tested). BENCH_BF16_FINETUNE=0 reverts to f32 steps.
    cfg.model.bf16_finetune = bf16_finetune
    model = DtoidModel(cfg, seed=0)

    def base_args(**kw):
        d = dict(
            dataset_name="synth", exp_name="bench", use_offline_model=False,
            use_pretrained_dtoid=False, dtoid_weights_path=None, n_local_test=10,
            use_dtoid_segmask=False, ignore_dtoid_mask=False, always_dtoid_mask=True,
            use_oracle_gt=False, use_sift_hypos=False, test_seen=False, backward=False,
            use_maskrcnn=False, finetune_interval=10 ** 9, finetune_warmup=0,
            finetune_epochs=1, finetune_reset=False, finetune_batch_size=8,
            non_cum=False, save_each=False, raw_dtoid=False, no_finetune=True, fast=True,
            zephyr_depth_crop=depth_crop, yuv_transfer=yuv,
        )
        d.update(kw)
        return argparse.Namespace(**d)

    # ---- throughput profile (the BASELINE headline) -----------------------
    # Measured FIRST, but its JSON line is HELD so it prints last (the driver
    # parses the last stdout line); gating/quality lines stream out eagerly.
    if profile in ("all", "throughput"):
        try:
            hypo_gens = build_ppf_gens(bop, max_poses=n_hypos)
            log("hypothesis backend: native PPF")
        except Exception:
            hypo_gens = {oid: FakeHypoGen(n_hypos=n_hypos, seed=oid) for oid in bop.obj_ids}
            log("hypothesis backend: fake")
        zmodel = ZephyrModel(num_points=512, inconst_ratio_th=100.0, seed=0, need_uv=False)
        args = base_args()
        # throughput world may be a subset of the generated frames
        loop = make_loop(cfg, bop, zr_list, zephyr_results, model, zmodel, hypo_gens, args)
        if world_frames > n_frames:
            ds = loop.test_loader.dataset
            ds.bop_dataset.targets = ds.bop_dataset.targets[:n_frames]
        fps, _, diag = time_loop(loop, "throughput")
        hold_headline({
            "metric": "online_loop_fps", "value": round(fps, 3),
            "unit": "frames/sec", "vs_baseline": round(fps / 10.0, 3),
            "tunnel_rpc_ms": tunnel_rpc_ms, **diag,
        })

    # ---- gating profile (BASELINE config 3 semantics) ---------------------
    if profile in ("all", "gating"):
        try:
            g_gens = build_ppf_gens(bop, max_poses=gating_hypos)
            log("gating hypothesis backend: native PPF")
        except Exception:
            g_gens = {oid: FakeHypoGen(n_hypos=gating_hypos, seed=oid) for oid in bop.obj_ids}
            log("gating hypothesis backend: fake (NOT representative)")
        g_zmodel = ZephyrModel(num_points=512, inconst_ratio_th=100.0, seed=0,
                               need_uv=False, refine_top=refine_top)
        g_args = base_args(no_finetune=False, finetune_interval=32,
                           use_oracle_gt=True)
        g_loop = make_loop(cfg, bop, zr_list, zephyr_results, model, g_zmodel,
                           g_gens, g_args)
        if world_frames > gating_frames:
            ds = g_loop.test_loader.dataset
            ds.bop_dataset.targets = ds.bop_dataset.targets[:gating_frames]
        sd0 = model.state_dict()
        import jax
        import jax.numpy as jnp

        # one scalar touching every model/optimizer array: device_get of it
        # forces the lazy h2d uploads queued by load_state_dict to complete
        # BEFORE the timed pass (else frame 0's detect fetch absorbs the
        # whole ~state-size transfer on the bandwidth-capped link)
        touch = jax.jit(
            lambda arrs: sum(jnp.sum(a.astype(jnp.float32)) for a in arrs))

        def reset():
            # identical work each pass: same weights, empty pseudo-label
            # buffer, SAME dataset rng — template draws feed the finetune, so
            # a drifting rng makes each pass's post-finetune weights (hence
            # detection masks, hence PPF hypo counts, hence score-program
            # BUCKETS) differ; a new bucket appearing only in a timed pass
            # lazily compiles at its first fetch, a 12-15 s stall that is
            # warmup cost, not steady-state cost
            model.load_state_dict(sd0)
            model.reset_optimizer()
            model.clear_cache()
            g_loop.train_dataset.clearTargets()
            g_loop.train_dataset.rng = np.random.default_rng(0)
            g_loop.next_finetune_number = g_args.finetune_interval
            np.asarray(jax.device_get(touch(jax.tree_util.tree_leaves(
                (model.params, model.batch_stats, model.opt_state)))))

        # best-of-3: tunnel jitter routinely sinks one pass (measured same-code
        # passes of 10.60 and 6.78 fps minutes apart); a third pass costs ~10 s
        # against a ~275 s warmup and halves the odds the driver's artifact
        # records a jitter hit as the round's headline
        g_passes = int(os.environ.get("BENCH_GATING_PASSES", "3"))
        fps_g, _, diag_g = time_loop(g_loop, "gating", passes=g_passes, reset_each=reset)
        emit({
            "metric": "online_loop_fps_gating", "value": round(fps_g, 3),
            "unit": "frames/sec", "vs_baseline": round(fps_g / 10.0, 3),
            "tunnel_rpc_ms": tunnel_rpc_ms, **diag_g,
        })

    # ---- quality profile: reduced honest hard-world closed loop -----------
    # A driver-capturable QUALITY number (VERDICT r3 next-step 4): the
    # demo_e2e --hard protocol (disjoint pretraining, trained scorer, honest
    # full-scene bootstrap, online self-supervised loop) on a reduced world —
    # first 2 hard objects, 24-frame streams, fixed seeds. ~12-18 min on the
    # real chip (calibration run: AR 0.4095 at zephyr_epochs=8/pre_frames=16,
    # 1123 s). BENCH_PROFILE=quality runs it alone; BENCH_QUALITY=0 skips.
    # Deadline budget (VERDICT r4 item 1): the quality demo only STARTS if
    # elapsed wall is under BENCH_DEADLINE (default 20 min) — r4 lost the
    # whole artifact to a quality run that outlived the driver's wall clock.
    # Even if it still overruns, the fps lines above are already on stdout
    # and the SIGTERM handler flushes the held headline.
    if profile in ("all", "quality") and os.environ.get("BENCH_QUALITY", "1") == "1":
        deadline_s = float(os.environ.get("BENCH_DEADLINE", "1200"))
        elapsed_s = time.monotonic() - t_start
        if profile == "all" and elapsed_s > deadline_s:
            log(f"[quality] SKIPPED: elapsed {elapsed_s:.0f}s > "
                f"BENCH_DEADLINE {deadline_s:.0f}s (fps lines already emitted)")
            emit({"metric": "hard_world_ar", "value": None, "unit": "AR",
                  "skipped": f"deadline: elapsed {elapsed_s:.0f}s > {deadline_s:.0f}s"})
        else:
            from ossid_code_tpu.scripts import demo_e2e

            q_argv = [
                "--hard",
                "--n_objects", os.environ.get("BENCH_QUALITY_OBJECTS", "2"),
                "--frames", os.environ.get("BENCH_QUALITY_FRAMES", "24"),
                "--epochs", os.environ.get("BENCH_QUALITY_EPOCHS", "8"),
                "--zephyr_epochs", os.environ.get("BENCH_QUALITY_ZEPOCHS", "6"),
                "--pretrain_frames", os.environ.get("BENCH_QUALITY_PRE_FRAMES", "12"),
            ]
            log(f"[quality] running reduced hard-world demo: {' '.join(q_argv)}")
            t0 = time.perf_counter()
            try:
                qs = demo_e2e.main(q_argv)
                log(f"[quality] done in {time.perf_counter() - t0:.0f}s")
                emit({
                    "metric": "hard_world_ar", "value": qs["AR"], "unit": "AR",
                    # floor = 0.30 (VERDICT r4 item 5, raised from 0.20): the
                    # honest reduced protocol's measured band is 0.41-0.54
                    # when the closed loop works (RESULTS.md r4); the r3
                    # scorer-collapse class of bug (pick 0.15) reads ~0.17 —
                    # the floor now catches it with margin on both sides
                    "vs_baseline": round(qs["AR"] / 0.30, 3),
                    "detail": {k: qs[k] for k in (
                        "dtoid_iou_pretrained", "dtoid_iou_online", "pose_add01d",
                        "zephyr_visib_recall", "n_finetunes")},
                })
            except Exception as e:  # noqa: BLE001 — quality must not kill the fps lines
                log(f"[quality] FAILED after {time.perf_counter() - t0:.0f}s: {e!r}")
                emit({"metric": "hard_world_ar", "value": 0.0, "unit": "AR",
                      "vs_baseline": 0.0, "error": repr(e)})

    # end-of-run tunnel probe into the headline: distinguishes mid-run tunnel
    # degradation from slow code in the artifact itself (VERDICT r4 item 10)
    if _HELD["line"] is not None:
        try:
            _HELD["line"]["tunnel_rpc_ms_end"] = measure_probe()
        except Exception as e:  # noqa: BLE001 — never lose the headline to a probe
            log(f"end probe failed: {e!r}")
    flush_headline()
    # a probe thread that hung is still stuck inside jax.device_put; normal
    # interpreter teardown aborts (std::terminate) trying to finalize the
    # runtime with it alive, turning a successful run into a nonzero exit.
    # All JSON lines are already flushed — exit immediately.
    os._exit(0)


if __name__ == "__main__":
    main()
