"""On-chip A/B of the opt-in scorer paths (round-3 pending measurements):

  * OSSID_FUSED_SCORER=1  — BN-folded inference with VMEM-resident pallas
    SetAbstraction kernels (ops/sa_fused.py),
  * OSSID_PACKED_SAMPLE=1 — single-gather packed bilinear taps in the
    feature assembly (models/zephyr/features.py),

each against the plain XLA baseline, at M in {128, 512}, f32 and bf16.
Timing is amortized over k back-to-back dispatches with one fetch, which
cancels the remote tunnel's fixed per-fetch RPC (same method as
scripts/roofline.py). Each config gets a fresh ZephyrModel because the env
knobs are read at _build_jits time.

Usage: python -m ossid_code_tpu.scripts.ab_scorer [--hypos 128 512]
Prints one markdown table + a JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--hypos", type=int, nargs="+", default=[128, 512])
    parser.add_argument("--iters", type=int, default=12)
    parser.add_argument("--bf16", type=int, nargs="+", default=[0, 1])
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ossid_code_tpu.models.zephyr.module import ZephyrModel
    from ossid_code_tpu.scripts.roofline import amortized_time

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    rngk = np.random.default_rng(0)
    pts = rngk.normal(0, 0.03, (2048, 3)).astype(np.float32)
    cols = rngk.uniform(0, 1, (2048, 3)).astype(np.float32)
    nrms = np.tile(np.asarray([[0, 0, -1.0]], np.float32), (2048, 1))
    img_z = jnp.asarray(rngk.integers(0, 255, (480, 640, 3), dtype=np.uint8))
    depth = jnp.asarray(rngk.uniform(400, 900, (256, 256)).astype(np.uint16))
    K = jnp.asarray(
        np.array([[572.0, 0, 325], [0, 573.0, 242], [0, 0, 1]], np.float32))
    origin = jnp.asarray([100, 150], jnp.int32)

    # OSSID_PACKED_SAMPLE defaults ON in module.py, so the baseline (the
    # four-tap XLA path) must pin it OFF explicitly or it silently measures
    # the packed path against itself.
    CONFIGS = [
        ("baseline", {"OSSID_PACKED_SAMPLE": "0"}),
        ("packed", {"OSSID_PACKED_SAMPLE": "1"}),
        ("fused", {"OSSID_FUSED_SCORER": "1", "OSSID_PACKED_SAMPLE": "0"}),
        ("fused+packed", {"OSSID_FUSED_SCORER": "1",
                          "OSSID_PACKED_SAMPLE": "1"}),
    ]
    KNOBS = ("OSSID_FUSED_SCORER", "OSSID_PACKED_SAMPLE", "OSSID_BF16_SCORER")

    rows = []
    for bf16 in args.bf16:
        for name, env in CONFIGS:
            for k in KNOBS:
                os.environ.pop(k, None)
            os.environ.update(env)
            if bf16:
                os.environ["OSSID_BF16_SCORER"] = "1"
            zm = ZephyrModel(num_points=512, inconst_ratio_th=100.0, seed=0,
                             need_uv=False)
            prep = zm.prepare_object(1, pts, cols, nrms)
            sparams, sstats = zm._score_vars()
            for m in args.hypos:
                poses = np.tile(np.eye(4, dtype=np.float32), (m, 1, 1))
                poses[:, 2, 3] = 0.6
                sargs = (sparams, sstats, img_z, depth, origin, K) + prep + (
                    jnp.asarray(poses), jnp.ones((m,), bool))
                # correctness pin vs whatever baseline ran first at this (m, bf16)
                scores = np.asarray(jax.device_get(zm._score(*sargs)[1]))
                secs = amortized_time(zm._score, sargs, args.iters)
                tag = f"{name} M={m} {'bf16' if bf16 else 'f32'}"
                rows.append({"config": name, "m": m, "bf16": bool(bf16),
                             "ms": secs * 1e3,
                             "score_sum": float(np.nansum(
                                 np.where(np.isfinite(scores), scores, 0.0)))})
                log(f"  {tag}: {secs * 1e3:.2f} ms")
    for k in KNOBS:
        os.environ.pop(k, None)

    print("| config | M | prec | ms | vs baseline |")
    print("|---|---|---|---|---|")
    base = {(r["m"], r["bf16"]): r["ms"] for r in rows
            if r["config"] == "baseline"}
    for r in rows:
        b = base.get((r["m"], r["bf16"]), float("nan"))
        print(f"| {r['config']} | {r['m']} | {'bf16' if r['bf16'] else 'f32'} "
              f"| {r['ms']:.2f} | {b / r['ms']:.2f}x |")
    print(json.dumps({"ab_scorer": rows}))
    return rows


if __name__ == "__main__":
    main()
