"""A/B: blending a geometric alignment statistic into hypothesis ranking.

Round-3 stage isolation on the hard hermetic world measured (oracle GT masks,
host-refined PPF sets): PPF ceiling 0.736 ADD<0.1d, trained-scorer pick 0.583,
and a HAND-CRAFTED statistic — the fraction of valid projected model points
that are simultaneously depth-aligned and hue-consistent — picking 0.667 on
its own. The net and the statistic fail on different frames, so this script
measures whether ensembling them closes the pick->ceiling gap:

  * net score alone (argmax over the hypothesis set)         [baseline]
  * alignment statistic alone, over a (tau_depth, tau_hue) grid
  * additive blends  score + lambda * stat_z (z-scored per set)
  * top-k rerank: among the net's top-k, argmax statistic

Everything reuses the demo_e2e --hard training recipe (same world seeds, same
ZephyrOfflineTrainer) so pick rates are comparable with RESULTS.md. Run on the
real chip; ~15-25 min. Prints one JSON line per strategy plus a summary.

Usage: python -m ossid_code_tpu.scripts.ab_rank_blend [--targets 72]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

import numpy as np


def log(msg):
    print(f"[ab_rank_blend] {msg}", file=sys.stderr, flush=True)


TAU_D = (0.005, 0.0075, 0.01, 0.015, 0.02)   # depth-alignment tolerance (m)
TAU_H = (0.05, 0.08, 0.12, 0.2, 0.5)          # circular hue tolerance ([0,0.5])


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=60)
    parser.add_argument("--targets", type=int, default=72,
                        help="sampled targets to evaluate picks on")
    parser.add_argument("--zephyr_epochs", type=int, default=16)
    parser.add_argument("--img_h", type=int, default=240)
    parser.add_argument("--img_w", type=int, default=320)
    parser.add_argument("--root", type=str, default=None)
    parser.add_argument("--max_poses", type=int, default=128)
    parser.add_argument("--align_feats", type=int, default=1,
                        help="scorer consumes the 12-cell alignment-fraction "
                             "grid as a head input (0 = r3 scorer)")
    parser.add_argument("--rank_weight", type=float, default=1.0)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ossid_code_tpu.data.bop import BopDataset, BopDatasetArgs
    from ossid_code_tpu.data.synthetic import make_synthetic_bop, hard_objects
    from ossid_code_tpu.eval.pose_metrics import add_err, object_diameter
    from ossid_code_tpu.hypo.ppf import PPFModelMeters, native_available
    from ossid_code_tpu.models.zephyr.features import assemble_score_features
    from ossid_code_tpu.models.zephyr.module import ZephyrModel, _blur5
    from ossid_code_tpu.render.mesh import load_ply
    from ossid_code_tpu.train.zephyr_offline import ZephyrOfflineTrainer
    from ossid_code_tpu.loop.online_learning import model_cloud_from_ply
    from ossid_code_tpu.utils.geometry import depth2cloud

    if not native_available():
        log("native PPF lib missing — build with `make -C native`")
        return 1

    root = args.root or tempfile.mkdtemp(prefix="ab_rank_blend_")
    h, w = args.img_h, args.img_w
    log(f"building hard world under {root} ...")
    objects = hard_objects()
    make_synthetic_bop(root, n_frames=args.frames, img_h=h, img_w=w,
                       objects=objects, layout="cluttered", n_clutter=3)
    bop = BopDataset(BopDatasetArgs(bop_root=root, dataset_name="synth"))

    hypo_gens = {
        oid: PPFModelMeters(bop.getObjPath(oid), ModelSamplingDist=0.04,
                            scene_sampling_dist=0.04, ref_pt_rate=0.3,
                            refine_top=30)
        for oid in bop.obj_ids
    }
    clouds = {
        oid: model_cloud_from_ply(load_ply(bop.getObjPath(oid)), n_points=1024)
        for oid in bop.obj_ids
    }
    zmodel = ZephyrModel(num_points=256, inconst_ratio_th=100.0, seed=0,
                         need_uv=False, align_feats=bool(args.align_feats),
                         rank_weight=args.rank_weight)
    ztrainer = ZephyrOfflineTrainer(zmodel, bop, clouds, hypo_gens=hypo_gens,
                                    n_hypos=64, seed=0)
    log(f"training scorer ({args.zephyr_epochs} epochs, demo recipe) ...")
    t0 = time.time()
    for ep in range(args.zephyr_epochs):
        loss = ztrainer.train_epoch(max_frames=24, seed=ep)
        log(f"  epoch {ep}: loss {loss:.3f}")
    log(f"scorer training took {time.time() - t0:.0f}s")
    if args.align_feats:
        cal = ztrainer.calibrate_align_head(max_frames=None)
        log(f"align head calibrated: {cal}")

    # per-hypothesis alignment statistics over the (tau_d, tau_h) grid,
    # computed from the same blurred-frame features the scorer consumes
    @jax.jit
    def _stats(img, depth, cam_K, pd, cd, nd, poses):
        point_x, _, _ = assemble_score_features(
            _blur5(img), depth, cam_K, pd, cd, nd, poses)
        dh = point_x[..., 3]          # circular hue diff, [0, 0.5]
        dd = jnp.abs(point_x[..., 6])  # |depth diff| (clipped 0.1 m)
        ok = point_x[..., 10]          # validity
        nvalid = jnp.maximum(ok.sum(-1), 1.0)
        grid = []
        for td in TAU_D:
            for th_ in TAU_H:
                aligned = ok * (dd < td) * (dh < th_)
                grid.append(aligned.sum(-1) / nvalid)
        return jnp.stack(grid, axis=-1)  # (M, len(TAU_D)*len(TAU_H))

    rng = np.random.default_rng(0)
    targets = list(bop.targets)
    rng.shuffle(targets)
    targets = targets[: args.targets]

    rows = []
    log(f"evaluating {len(targets)} targets (oracle masks, refined PPF) ...")
    t0 = time.time()
    for ti, t in enumerate(targets):
        oid = t["obj_id"]
        d = bop.getDataByIds(oid, t["scene_id"], t["im_id"])
        depth = np.asarray(d["depth"], np.float32)
        cam_K = np.asarray(d["scene_camera"]["cam_K"], np.float64).reshape(3, 3)
        gt = np.asarray(d["mat_gt"], np.float64)
        mask = np.asarray(d["mask_gt_visib"]) > 0
        cloud = depth2cloud(depth, mask & (depth > 0), cam_K)
        if len(cloud) < 50:
            continue
        poses, _, _ = hypo_gens[oid].find_surface_model(
            cloud, max_poses=args.max_poses)
        if not len(poses):
            continue
        poses = poses.astype(np.float32)
        out = zmodel.score_hypotheses(
            {"img": d["img"], "depth": depth, "cam_K": cam_K,
             "model_points": clouds[oid][0], "model_colors": clouds[oid][1],
             "model_normals": clouds[oid][2], "pose_hypos": poses},
            obj_id=oid,
        )
        pd_, cd_, nd_, *_ = zmodel._objects[oid]
        stats = np.asarray(_stats(
            jnp.asarray(d["img"].astype(np.float32) / 255.0),
            jnp.asarray(depth), jnp.asarray(cam_K.astype(np.float32)),
            pd_, cd_, nd_, jnp.asarray(poses),
        ))
        pts = clouds[oid][0]
        errs = np.asarray([
            add_err(p[:3, :3], p[:3, 3], gt[:3, :3], gt[:3, 3], pts)
            for p in poses
        ])
        rows.append({
            "scores": out["scores"], "stats": stats, "errs": errs,
            "diam": object_diameter(pts),
        })
        if (ti + 1) % 12 == 0:
            log(f"  {ti + 1}/{len(targets)} ({time.time() - t0:.0f}s)")

    log(f"eval data collected in {time.time() - t0:.0f}s over {len(rows)} frames")

    def pick_rate(rank_fn):
        hits = []
        for r in rows:
            i = int(rank_fn(r))
            hits.append(r["errs"][i] < 0.1 * r["diam"])
        return float(np.mean(hits))

    results = {}
    results["ceiling"] = float(np.mean(
        [r["errs"].min() < 0.1 * r["diam"] for r in rows]))
    results["net_only"] = pick_rate(lambda r: np.argmax(r["scores"]))

    # statistic alone, per grid cell
    stat_cells = {}
    for gi, (td, th_) in enumerate(
            [(a, b) for a in TAU_D for b in TAU_H]):
        stat_cells[f"stat_d{td}_h{th_}"] = pick_rate(
            lambda r, gi=gi: np.argmax(r["stats"][:, gi]))
    best_cell = max(stat_cells, key=stat_cells.get)
    results["stat_best"] = stat_cells[best_cell]
    results["stat_best_cell"] = best_cell
    gi_best = list(stat_cells).index(best_cell)

    # additive blend: z-score both per hypothesis set, score + lam * stat
    def blend(r, lam, gi):
        s = r["scores"].copy()
        finite = np.isfinite(s)
        if finite.sum() < 2:
            return int(np.argmax(r["stats"][:, gi]))
        mu, sd = s[finite].mean(), max(s[finite].std(), 1e-6)
        sz = np.where(finite, (s - mu) / sd, -1e9)
        st = r["stats"][:, gi]
        tz = (st - st.mean()) / max(st.std(), 1e-6)
        return int(np.argmax(sz + lam * tz))

    for lam in (0.25, 0.5, 1.0, 2.0, 4.0):
        results[f"blend_lam{lam}"] = pick_rate(
            lambda r, lam=lam: blend(r, lam, gi_best))

    # top-k rerank: among net's top-k, argmax statistic
    def rerank(r, k, gi):
        s = r["scores"]
        order = np.argsort(s)[::-1][:k]
        return int(order[np.argmax(r["stats"][order, gi])])

    for k in (4, 8, 16, 32):
        results[f"rerank_top{k}"] = pick_rate(
            lambda r, k=k: rerank(r, k, gi_best))

    for k, v in sorted(stat_cells.items()):
        log(f"  {k}: {v:.3f}")
    for k, v in results.items():
        if isinstance(v, float):
            print(json.dumps({"strategy": k, "pick_add01d": round(v, 4)}))
    print(json.dumps({"summary": {k: (round(v, 4) if isinstance(v, float) else v)
                                  for k, v in results.items()},
                      "n_frames": len(rows)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
