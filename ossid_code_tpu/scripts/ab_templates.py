"""Serving at the reference's template scale: one detect program at
n_local_test up to 160, 480x640 (VERDICT r3 next-step 3).

The reference's author-checkpoint inference runs 160 local templates per
frame, chunked 120 at a time through the torch net (ref
models/dtoid/__init__.py:92-98, readme.md:74); the repo's worlds exercise
6-10. This script compile-checks and times the one-batch all-templates detect
program at T in {10, 40, 80, 160} on the real chip, reporting amortized
per-frame device time, compile wall, and the template-featurization one-off,
so the product's real serving shape has measured behavior (or a documented
wall).

Usage: python -m ossid_code_tpu.scripts.ab_templates [--sizes 10 40 160]
Prints one JSON line per T.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", type=int, nargs="+", default=[10, 40, 80, 160])
    parser.add_argument("--img_h", type=int, default=480)
    parser.add_argument("--img_w", type=int, default=640)
    parser.add_argument("--iters", type=int, default=8)
    args = parser.parse_args(argv)

    import jax

    from ossid_code_tpu.core.config import default_config
    from ossid_code_tpu.models.dtoid.module import DtoidModel
    from ossid_code_tpu.scripts.roofline import amortized_time

    cfg = default_config()
    cfg.model.img_h, cfg.model.img_w = args.img_h, args.img_w
    cfg.model.heatmap_h = args.img_h // 16 - 1
    cfg.model.heatmap_w = args.img_w // 16 - 1
    model = DtoidModel(cfg, seed=0)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (1, args.img_h, args.img_w, 3), dtype=np.uint8)
    ts = model.template_size

    for t_count in args.sizes:
        limg = rng.random((t_count, ts, ts, 3), dtype=np.float32)
        lmask = (rng.random((t_count, ts, ts, 1)) > 0.5).astype(np.float32)

        # one-off template featurization (cache fill), timed to first fetch
        model.clear_cache()
        t0 = time.perf_counter()
        local, glob = model.get_template_features(t_count, limg, lmask)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(local)[0]))
        t_feat = time.perf_counter() - t0

        batch = {"img": img, "obj_id": t_count, "limg": limg, "lmask": lmask}
        # compile wall: first dispatch+fetch (compilation happens lazily at
        # the first fetch on the axon tunnel)
        t0 = time.perf_counter()
        out = model.detect_async(batch)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
        t_compile = time.perf_counter() - t0

        def dispatch(b=batch):
            return model.detect_async(b)

        t_amort = amortized_time(dispatch, (), iters=args.iters)
        line = {
            "metric": "detect_ms_per_frame", "templates": t_count,
            "img": [args.img_h, args.img_w],
            "value": round(t_amort * 1e3, 2), "unit": "ms",
            "template_featurize_s": round(t_feat, 2),
            "first_call_s": round(t_compile, 2),
            "fps_equiv": round(1.0 / t_amort, 1),
        }
        log(f"T={t_count}: {line}")
        print(json.dumps(line))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
