"""A/B: finetune-step cost levers at the production geometry (VERDICT r3
next-step 7 — the step is the gating profile's largest queued device cost;
74.5 ms at b=8 bf16 after round 3's mixed-precision pass).

Times the fused train step (480x640, batch 8) amortized on the real chip for:
  * f32 vs bf16 (the r3 default),
  * full-res vs half-res segmentation supervision (model.seg_loss_half:
    the decoder's two highest-resolution stages carry most of the step's HBM
    traffic; the BCE target becomes the exact 2x2 mean of the mask).

Usage: python -m ossid_code_tpu.scripts.ab_finetune [--iters 8]
Prints one JSON line per config.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--batch", type=int, default=8)
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from ossid_code_tpu.core.config import default_config
    from ossid_code_tpu.models.dtoid.module import DtoidModel
    from ossid_code_tpu.scripts.roofline import amortized_time

    rngk = np.random.default_rng(0)
    b = args.batch
    ts = 124

    def build_batch(cfg):
        fh, fw = int(cfg.model.heatmap_h), int(cfg.model.heatmap_w)
        return {
            "img": jnp.asarray(rngk.uniform(0, 1, (b, 480, 640, 3)).astype(np.float32)),
            "limg": jnp.asarray(rngk.uniform(0, 1, (b, ts, ts, 3)).astype(np.float32)),
            "lmask": jnp.ones((b, ts, ts, 1), jnp.float32),
            "gimg": jnp.asarray(rngk.uniform(0, 1, (b, ts, ts, 3)).astype(np.float32)),
            "gmask": jnp.ones((b, ts, ts, 1), jnp.float32),
            "bbox_gt": jnp.asarray(
                np.tile([[100, 100, 200, 200, 1]], (b, 1, 1)).astype(np.float32)),
            "heatmap": jnp.zeros((b, fh, fw, 1), jnp.float32),
            "mask": jnp.zeros((b, 480, 640, 1), jnp.float32),
        }

    for bf16 in (True, False):
        for seg_half in (False, True):
            cfg = default_config()
            cfg.model.bf16_finetune = bf16
            cfg.model.seg_loss_half = seg_half
            model = DtoidModel(cfg, seed=0)
            batch = build_batch(cfg)
            ft_args = (model.params, model.batch_stats, model.opt_state, batch)
            secs = amortized_time(
                lambda p, s, o, bt: model._train_step(p, s, o, bt)[3]["loss"],
                ft_args, args.iters)
            line = {
                "metric": "finetune_step_ms", "bf16": bf16, "seg_half": seg_half,
                "batch": b, "value": round(secs * 1e3, 2), "unit": "ms",
            }
            log(str(line))
            print(json.dumps(line))
            sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
