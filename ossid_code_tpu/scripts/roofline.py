"""MFU / roofline accounting for the three hot programs (VERDICT r2 #7):

  * the DTOID detect program (480x640, 10 templates),
  * the Zephyr score program at M=128 and M=512 (f32 and bf16),
  * the DTOID finetune train step (batch 8).

FLOP counts come from XLA's own cost model (`compiled.cost_analysis()`), so
they reflect the program actually executed (post-fusion), not a hand model.
On-chip time is measured amortized: k back-to-back dispatches and ONE final
fetch — `(t(k) - t(1)) / (k - 1)` cancels the fixed per-fetch RPC of the
remote-attached chip (block_until_ready does not synchronize there).

Usage: python -m ossid_code_tpu.scripts.roofline [--hypos 128 512]
Prints one markdown table + a JSON line. Peak FLOP/s defaults to TPU v5e
(197 TFLOP/s bf16, 98.5 f32 — bf16 MXU at half rate for f32); override with
OSSID_PEAK_TFLOPS_F32 / OSSID_PEAK_TFLOPS_BF16 for other chips.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def amortized_time(fn, args, iters: int = 12) -> float:
    """Seconds per call, fixed fetch/dispatch overhead removed."""
    import jax

    def run(k):
        out = None
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf))
        return time.perf_counter() - t0

    run(2)  # warmup/compile
    t1 = min(run(1) for _ in range(3))
    tk = min(run(iters) for _ in range(3))
    return max((tk - t1) / (iters - 1), 1e-9)


def program_flops(jitted, *args) -> float:
    """XLA cost-model FLOPs of the compiled program (post-fusion)."""
    compiled = jitted.lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device program
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--hypos", type=int, nargs="+", default=[128, 512])
    parser.add_argument("--iters", type=int, default=12)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ossid_code_tpu.core.config import default_config
    from ossid_code_tpu.models.dtoid.module import DtoidModel
    from ossid_code_tpu.models.zephyr.module import ZephyrModel

    dev = jax.devices()[0]
    peak_f32 = float(os.environ.get("OSSID_PEAK_TFLOPS_F32", "98.5")) * 1e12
    peak_bf16 = float(os.environ.get("OSSID_PEAK_TFLOPS_BF16", "197")) * 1e12
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}; "
        f"peaks f32={peak_f32 / 1e12:.1f} bf16={peak_bf16 / 1e12:.1f} TFLOP/s")

    cfg = default_config()  # 480x640 production geometry
    rows = []

    def add_row(name, flops, secs, peak):
        tf = flops / secs / 1e12
        rows.append({
            "program": name, "gflops": flops / 1e9, "ms": secs * 1e3,
            "tflops": tf, "mfu_pct": 100.0 * flops / secs / peak,
        })
        log(f"  {name}: {flops / 1e9:.1f} GFLOP, {secs * 1e3:.2f} ms, "
            f"{tf:.1f} TFLOP/s, {rows[-1]['mfu_pct']:.1f}% of peak")

    # ---- DTOID detect (10 templates) --------------------------------------
    log("DTOID detect program ...")
    model = DtoidModel(cfg, seed=0)
    rngk = np.random.default_rng(0)
    img = jnp.asarray(rngk.integers(0, 255, (1, 480, 640, 3), dtype=np.uint8))
    ts = int(cfg.dataset.get("template_size", 124))
    limg = rngk.uniform(0, 1, (10, ts, ts, 3)).astype(np.float32)
    lmask = np.ones((10, ts, ts, 1), np.float32)
    local, glob = model.get_template_features(1, limg, lmask)
    params, stats = model._infer_vars()
    det_args = (params, stats, img, local, glob)
    flops = program_flops(model._infer, *det_args)
    secs = amortized_time(model._infer, det_args, args.iters)
    add_row("detect t=10 f32", flops, secs, peak_f32)

    # ---- DTOID finetune step (batch 8) ------------------------------------
    log("DTOID finetune step ...")
    b = 8
    fh, fw = int(cfg.model.heatmap_h), int(cfg.model.heatmap_w)
    batch = {
        "img": jnp.asarray(rngk.uniform(0, 1, (b, 480, 640, 3)).astype(np.float32)),
        "limg": jnp.asarray(rngk.uniform(0, 1, (b, ts, ts, 3)).astype(np.float32)),
        "lmask": jnp.ones((b, ts, ts, 1), jnp.float32),
        "gimg": jnp.asarray(rngk.uniform(0, 1, (b, ts, ts, 3)).astype(np.float32)),
        "gmask": jnp.ones((b, ts, ts, 1), jnp.float32),
        "bbox_gt": jnp.asarray(np.tile([[100, 100, 200, 200, 1]], (b, 1, 1)).astype(np.float32)),
        "heatmap": jnp.zeros((b, fh, fw, 1), jnp.float32),
        "mask": jnp.zeros((b, 480, 640, 1), jnp.float32),
    }
    ft_args = (model.params, model.batch_stats, model.opt_state, batch)
    flops = program_flops(model._train_step, *ft_args)
    secs = amortized_time(
        lambda p, s, o, bt: model._train_step(p, s, o, bt)[3]["loss"],
        ft_args, max(4, args.iters // 2))
    add_row("finetune b=8 f32", flops, secs, peak_f32)

    # ---- Zephyr score at each M, f32 and bf16 -----------------------------
    for bf16 in (False, True):
        os.environ["OSSID_BF16_SCORER"] = "1" if bf16 else "0"
        zm = ZephyrModel(num_points=512, inconst_ratio_th=100.0, seed=0, need_uv=False)
        pts = rngk.normal(0, 0.03, (2048, 3)).astype(np.float32)
        cols = rngk.uniform(0, 1, (2048, 3)).astype(np.float32)
        nrms = np.tile(np.asarray([[0, 0, -1.0]], np.float32), (2048, 1))
        prep = zm.prepare_object(1, pts, cols, nrms)
        img_z = jnp.asarray(rngk.integers(0, 255, (480, 640, 3), dtype=np.uint8))
        depth = jnp.asarray(
            rngk.uniform(400, 900, (256, 256)).astype(np.uint16))
        K = jnp.asarray(np.array([[572.0, 0, 325], [0, 573.0, 242], [0, 0, 1]], np.float32))
        origin = jnp.asarray([100, 150], jnp.int32)
        sparams, sstats = zm._score_vars()
        for m in args.hypos:
            poses = np.tile(np.eye(4, dtype=np.float32), (m, 1, 1))
            poses[:, 2, 3] = 0.6
            sargs = (sparams, sstats, img_z, depth, origin, K) + prep + (
                jnp.asarray(poses), jnp.ones((m,), bool))
            flops = program_flops(zm._score, *sargs)
            secs = amortized_time(zm._score, sargs, args.iters)
            add_row(f"score M={m} {'bf16' if bf16 else 'f32'}", flops, secs,
                    peak_bf16 if bf16 else peak_f32)
    os.environ.pop("OSSID_BF16_SCORER", None)

    print("| program | GFLOP | ms | TFLOP/s | % peak |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['program']} | {r['gflops']:.1f} | {r['ms']:.2f} "
              f"| {r['tflops']:.1f} | {r['mfu_pct']:.1f} |")
    print(json.dumps({"roofline": rows}))
    return rows


if __name__ == "__main__":
    main()
