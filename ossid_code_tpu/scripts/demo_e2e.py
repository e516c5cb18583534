"""End-to-end demonstration of the OSSID mechanism on this framework,
hermetically on one chip:

  1. build a synthetic BOP world (objects, scenes, template grids);
  2. pretrain DTOID offline (data-parallel jitted steps, GT masks);
  3. train the Zephyr scorer offline (hypothesis labeling by ADD error);
  4. run the online self-supervised loop with native PPF hypotheses:
     DTOID masks -> PPF -> Zephyr scoring -> ICP -> pseudo-labels -> finetune;
  5. report detection IoU (before/after), pose AR, ADD(-S)<0.1d.

Usage: python -m ossid_code_tpu.scripts.demo_e2e [--frames 12] [--epochs 20]
Prints a JSON summary line at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import tempfile
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=None,
                        help="frames per object stream (default 12; 60 with --hard)")
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--zephyr_epochs", type=int, default=16)
    parser.add_argument("--img_h", type=int, default=240)
    parser.add_argument("--img_w", type=int, default=320)
    parser.add_argument("--root", type=str, default=None)
    parser.add_argument("--hard", action="store_true",
                        help="LM-O-difficulty world: 6 asymmetric textured "
                             "objects, two-row cluttered layout with "
                             "inter-object occlusion, unannotated distractor "
                             "clutter, 60+ frame streams")
    parser.add_argument("--n_objects", type=int, default=0,
                        help="limit the test world to the first N objects "
                             "(0 = all). Used by the bench quality profile to "
                             "bound the reduced hard-world run's wall time")
    parser.add_argument("--n_views", type=int, default=10,
                        help="template-grid views per object (the reference's "
                             "LM-O grid has 301 views; detection quality on "
                             "novel objects is bounded by view coverage)")
    parser.add_argument("--n_templates", type=int, default=6,
                        help="local templates per detection forward "
                             "(n_local_test; the reference tests with up to "
                             "160)")
    parser.add_argument("--pretrain_n", type=int, default=0,
                        help="size of the procedurally sampled pretraining "
                             "object set (0 = the fixed 6-object "
                             "pretrain_objects() world). Detector transfer to "
                             "novel objects scales with pretraining variety")
    parser.add_argument("--pretrain_frames", type=int, default=None,
                        help="frames in the pretraining world (default: "
                             "--frames)")
    parser.add_argument("--rank_blend", type=float, default=None,
                        help="host-side blend weight of the z-scored "
                             "alignment statistic in hypothesis ranking "
                             "(scripts/online_learning.py --rank_blend). "
                             "Default: net-only argmax — since r4 the scorer "
                             "carries a calibrated alignment head and "
                             "net-only measures BEST (AR 0.426 vs 0.408 "
                             "blended on the honest hard protocol)")
    parser.add_argument("--align_feats", type=int, default=1,
                        help="feed the 12-cell alignment-fraction grid to the "
                             "scorer head (models/zephyr/pointnet2.py). The "
                             "hand statistic outranked the r3 net (RESULTS.md)"
                             "; as an input feature the net learns it "
                             "directly. 0 reverts to the r3 scorer")
    parser.add_argument("--use_maskrcnn", action="store_true",
                        help="score the class-conditional alternative "
                             "detector (ref --use_maskrcnn, models/"
                             "maskrcnn.py) instead of DTOID. Implies "
                             "--same_pretrain: a class-conditional detector "
                             "has no template conditioning, so it must train "
                             "on its classes (the reference's detect dataset "
                             "likewise trains on test-object pseudo-labels)")
    parser.add_argument("--same_pretrain", action="store_true",
                        help="pretrain DTOID on the TEST objects (legacy "
                             "upper-bound protocol). Default for --hard is "
                             "the reference-faithful protocol: pretrain on a "
                             "DISJOINT object set, so the online loop's "
                             "self-supervision is what adapts the detector "
                             "to the novel stream objects")
    args = parser.parse_args(argv)
    if args.frames is None:
        args.frames = 60 if args.hard else 12

    from ossid_code_tpu.core.config import default_config
    from ossid_code_tpu.data.synthetic import (
        make_synthetic_bop, make_template_grid, default_objects, hard_objects,
        pretrain_objects, make_zephyr_results_pkl,
    )
    from ossid_code_tpu.data.bop import BopDataset, BopDatasetArgs
    from ossid_code_tpu.data.dtoid_bop import get_dataloaders
    from ossid_code_tpu.models.dtoid.module import DtoidModel
    from ossid_code_tpu.models.zephyr.module import ZephyrModel
    from ossid_code_tpu.train.offline import OfflineTrainer
    from ossid_code_tpu.train.zephyr_offline import ZephyrOfflineTrainer
    from ossid_code_tpu.loop.online_learning import (
        OnlineLearningLoop, test_dtoid_model, model_cloud_from_ply,
    )
    from ossid_code_tpu.render.mesh import load_ply
    from ossid_code_tpu.eval.bop_ar import BopEvaluator

    h, w = args.img_h, args.img_w
    assert h % 16 == 0 and w % 16 == 0
    root = args.root or tempfile.mkdtemp(prefix="ossid_demo_")
    log("world ->", root, "(hard)" if args.hard else "")
    objects = hard_objects() if args.hard else default_objects()
    if args.n_objects:
        objects = dict(list(objects.items())[: args.n_objects])
    make_synthetic_bop(
        root, n_frames=args.frames, img_h=h, img_w=w, objects=objects,
        layout="cluttered" if args.hard else "spread",
        n_clutter=3 if args.hard else 0,
    )
    grid = os.path.join(root, "grid")
    make_template_grid(grid, objects, n_views=args.n_views)

    cfg = default_config()
    cfg.dataset.bop_root = root
    cfg.dataset.test_dataset_name = "synth"
    cfg.dataset.grid_root = grid
    cfg.dataset.shorter_length = h
    fh, fw = h // 16 - 1, w // 16 - 1
    cfg.dataset.heatmap_shorter_length = fh
    cfg.dataset.n_local_test = args.n_templates
    cfg.model.img_h, cfg.model.img_w = h, w
    cfg.model.heatmap_h, cfg.model.heatmap_w = fh, fw
    cfg.train.batch_size = 4
    cfg.dataset.load_zephyr_result = True

    bop = BopDataset(BopDatasetArgs(bop_root=root, dataset_name="synth"))
    zr_path = os.path.join(root, "zr.pkl")
    make_zephyr_results_pkl(zr_path, bop, score=50.0)
    with open(zr_path, "rb") as f:
        zr_list = pickle.load(f)
    zephyr_results = {(r["obj_id"], r["scene_id"], r["im_id"]): r for r in zr_list}
    cfg.dataset.zephyr_result_path = zr_path

    train_loader, _, test_loader = get_dataloaders(cfg, zr_list)
    test_loader.dataset.sortTargets()

    if args.use_maskrcnn:
        from ossid_code_tpu.models.maskrcnn import MaskRCNN

        if args.hard and not args.same_pretrain:
            log("--use_maskrcnn implies --same_pretrain (class-conditional "
                "detector; see --help)")
            args.same_pretrain = True
        cfg.dataset.n_classes = int(max(bop.obj_ids))
        # MaskRCNN sizes its anchors from the DATASET image shape
        cfg.dataset.img_h, cfg.dataset.img_w = h, w
        model = MaskRCNN(cfg, seed=0)
    else:
        model = DtoidModel(cfg, seed=0)

    # ---- detection quality before any training -----------------------------
    log("eval: untrained DTOID ...")
    res0 = test_dtoid_model(model, test_loader)
    iou_untrained = float(np.mean([r["dtoid_iou"] for r in res0]))

    # ---- offline DTOID pretraining (GT masks, single templates) ------------
    # reference-faithful protocol for the hard world: pretrain on a DISJOINT
    # object set (the reference pretrains on ShapeNet renders; the stream's
    # objects are novel, and online self-supervision is what adapts to them)
    disjoint = args.hard and not args.same_pretrain
    pre_updates = {"dataset": {"load_zephyr_result": False}}
    if disjoint:
        log("building disjoint pretraining world ...")
        if args.pretrain_n:
            from ossid_code_tpu.data.synthetic import sampled_objects

            pre_objects = sampled_objects(args.pretrain_n, seed=11)
        else:
            pre_objects = pretrain_objects()
        make_synthetic_bop(
            root, dataset_name="synth_pre",
            n_frames=args.pretrain_frames or args.frames, img_h=h,
            img_w=w, objects=pre_objects, layout="cluttered", n_clutter=3,
            seed=7, max_per_frame=6,
        )
        grid_pre = os.path.join(root, "grid_pre")
        make_template_grid(grid_pre, pre_objects, n_views=args.n_views, seed=1)
        pre_updates["dataset"].update(
            {"test_dataset_name": "synth_pre", "grid_root": grid_pre})
    log(f"pretraining {'MaskRCNN' if args.use_maskrcnn else 'DTOID'} for "
        f"{args.epochs} epochs ({'disjoint' if disjoint else 'test'} objects) ...")
    pre_cfg = cfg.merged(pre_updates)
    pre_train_loader, _, _ = get_dataloaders(pre_cfg, None)
    t0 = time.time()
    if args.use_maskrcnn:
        # per-IMAGE multi-object annotations (data/detect.py, the reference's
        # detect-dataset path): a class-conditional detector must see every
        # visible object labeled — per-target single-object rows would teach
        # it that the other classes' objects are background
        from ossid_code_tpu.data.detect import DetectDataset
        from ossid_code_tpu.data.dtoid_bop import NumpyLoader

        det_ds = DetectDataset(bop, cfg.dataset)
        det_loader = NumpyLoader(det_ds, batch_size=int(cfg.train.batch_size),
                                 shuffle=True, seed=0, drop_last=True)
        for ep in range(args.epochs):
            losses = [model.train_step(
                {k: b[k] for k in ("img", "bbox_gt", "masks")})["loss"]
                for b in det_loader]
            if ep % 5 == 0 or ep == args.epochs - 1:
                log(f"  epoch {ep}: loss {np.mean(losses):.3f}")
    else:
        trainer = OfflineTrainer(model, cfg, n_devices=1)
        for ep in range(args.epochs):
            m = trainer.train_epoch(pre_train_loader)
            if ep % 5 == 0 or ep == args.epochs - 1:
                log(f"  epoch {ep}: loss {m.get('loss', float('nan')):.3f} "
                    f"seg {m.get('loss_seg', float('nan')):.3f}")
    log(f"pretraining took {time.time() - t0:.0f}s")
    model.clear_cache()

    log("eval: pretrained DTOID ...")
    res1 = test_dtoid_model(model, test_loader)
    iou_pretrained = float(np.mean([r["dtoid_iou"] for r in res1]))

    # ---- hypothesis generators ----------------------------------------------
    from ossid_code_tpu.hypo.ppf import PPFModelMeters, native_available

    if native_available():
        hypo_gens = {
            oid: PPFModelMeters(bop.getObjPath(oid), ModelSamplingDist=0.04,
                                scene_sampling_dist=0.04, ref_pt_rate=0.3,
                                refine_top=30)
            for oid in bop.obj_ids
        }
    else:
        from ossid_code_tpu.hypo.fake import FakeHypoGen

        hypo_gens = {oid: FakeHypoGen(n_hypos=64, seed=oid) for oid in bop.obj_ids}

    # ---- offline zephyr training (hard negatives from real PPF hypos) ------
    log("training zephyr scorer ...")
    clouds = {
        oid: model_cloud_from_ply(load_ply(bop.getObjPath(oid)), n_points=1024)
        for oid in bop.obj_ids
    }
    zmodel = ZephyrModel(num_points=256, inconst_ratio_th=100.0, seed=0, need_uv=False,
                         align_feats=bool(args.align_feats))
    # r4: the scorer's calibrated residual alignment head made net-only
    # argmax the best ranking on the honest disjoint protocol (AR 0.426 vs
    # 0.408 for the r3 host-side blend; pick 0.653 vs 0.583 isolated), so the
    # default is reference-faithful net-only everywhere. --rank_blend re-adds
    # the host-side z-scored blend on top for A/Bs.
    if args.rank_blend is not None:
        zmodel.rank_blend = float(args.rank_blend)
    ztrainer = ZephyrOfflineTrainer(zmodel, bop, clouds, hypo_gens=hypo_gens,
                                    n_hypos=64, seed=0)
    for ep in range(args.zephyr_epochs):
        loss = ztrainer.train_epoch(max_frames=24, seed=ep)
        log(f"  zephyr epoch {ep}: loss {loss:.3f}")
    if args.align_feats:
        # deterministic post-hoc fit of the residual alignment head on real
        # PPF training sets (SGD never touches it — see pointnet2.py)
        cal = ztrainer.calibrate_align_head(max_frames=None)
        log(f"align head calibrated: {cal}")

    # ---- honest bootstrap: full-scene zephyr results ------------------------
    # The reference's online loop pseudo-labels unconfident-detector frames
    # from PRECOMPUTED zephyr results — full-scene PPF + scoring run offline
    # (ref scripts/online_learning.py:246-248,367-378). In the disjoint
    # protocol the GT+noise stand-in would be oracle leakage, so those rows
    # are generated the same way the reference generated its pickles: PPF
    # over the whole scene cloud, scored by the trained scorer. Only rows the
    # confidence gate admits ever become pseudo-labels.
    # One definition for the pseudo-label confidence gate: the loop applies it
    # (loop_args below) and the bootstrap diagnostic reports against it.
    confident_th = 1.25
    if disjoint:
        log("generating full-scene zephyr results (bootstrap) ...")
        from ossid_code_tpu.utils.geometry import depth2cloud

        t0 = time.time()
        zr_rows = []
        for t in bop.targets:
            oid = t["obj_id"]
            d = bop.getDataByIds(oid, t["scene_id"], t["im_id"])
            depth = np.asarray(d["depth"], np.float32)
            # in front of the synthetic background plane (the stand-in for
            # no-return pixels of a real RGB-D camera)
            cloud = depth2cloud(depth, depth < 1.2, np.asarray(
                d["scene_camera"]["cam_K"], np.float64).reshape(3, 3))
            poses, _, _ = hypo_gens[oid].find_surface_model(
                cloud, max_poses=256)
            row = {"obj_id": oid, "scene_id": t["scene_id"], "im_id": t["im_id"],
                   "score": float("-inf"), "pred_pose": np.eye(4),
                   "pred_mask_visib": np.zeros_like(depth, bool)}
            if len(poses):
                pts, cols, nrms = clouds[oid]
                out = zmodel.score_hypotheses(
                    {"img": d["img"], "depth": depth,
                     "cam_K": np.asarray(d["scene_camera"]["cam_K"]),
                     "model_points": pts, "model_colors": cols,
                     "model_normals": nrms,
                     "pose_hypos": poses.astype(np.float32)},
                    obj_id=oid,
                )
                row["score"] = float(out["pred_score"])
                row["pred_pose"] = np.asarray(out["pred_pose"])
            zr_rows.append(row)
        zephyr_results = {(r["obj_id"], r["scene_id"], r["im_id"]): r
                          for r in zr_rows}
        n_conf = sum(r["score"] > confident_th for r in zr_rows)
        log(f"bootstrap took {time.time()-t0:.0f}s; "
            f"{n_conf}/{len(zr_rows)} rows above the confidence gate")

    # ---- the online self-supervised loop ------------------------------------
    log("running the online loop (PPF + zephyr + finetuning) ...")

    loop_args = argparse.Namespace(
        dataset_name="synth", exp_name="demo", use_offline_model=False,
        use_pretrained_dtoid=False, dtoid_weights_path=None,
        n_local_test=args.n_templates,
        use_dtoid_segmask=True, ignore_dtoid_mask=False,
        # disjoint protocol: masks only once the detector is confident; the
        # full-scene bootstrap rows carry the unconfident frames (reference
        # default). Same-pretrain keeps --always_dtoid_mask (config-3 style).
        always_dtoid_mask=not disjoint,
        use_oracle_gt=False, use_sift_hypos=False, test_seen=False, backward=False,
        use_maskrcnn=args.use_maskrcnn, finetune_interval=8, finetune_warmup=0,
        finetune_epochs=1, finetune_reset=False, finetune_batch_size=4,
        non_cum=False, save_each=False, raw_dtoid=False, no_finetune=False,
        fast=True, zephyr_confident_threshold=confident_th,
    )
    train_ds = train_loader.dataset
    train_ds.clearTargets()
    train_ds.zephyr_results = dict(zephyr_results)
    loop = OnlineLearningLoop(
        loop_args, cfg, model, bop, train_ds, test_loader, dict(zephyr_results),
        zephyr_model=zmodel, hypo_gens=hypo_gens, use_icp=True,
    )
    results = loop.run(progress=True)

    # ---- metrics -------------------------------------------------------------
    dtoid_iou_online = float(np.mean([r["dtoid_iou"] for r in results]))
    add01d = float(np.mean([r["pred_add01d"] for r in results]))
    iou_visib = float(np.mean([r["pred_iou_visib"] > 0.5 for r in results]))
    n_finetunes = int(sum(r["finetune"] for r in results))
    ar = BopEvaluator(bop).evaluate(results)

    summary = {
        "dtoid_iou_untrained": round(iou_untrained, 4),
        "dtoid_iou_pretrained": round(iou_pretrained, 4),
        "dtoid_iou_online": round(dtoid_iou_online, 4),
        "pose_add01d": round(add01d, 4),
        "zephyr_visib_recall": round(iou_visib, 4),
        "n_finetunes": n_finetunes,
        "AR": round(ar["AR"], 4),
        "AR_vsd": round(ar["AR_vsd"], 4),
        "AR_mssd": round(ar["AR_mssd"], 4),
        "AR_mspd": round(ar["AR_mspd"], 4),
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
