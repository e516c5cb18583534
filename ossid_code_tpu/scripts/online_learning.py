"""Online-learning CLI — flag-compatible with the reference entry point
(ref scripts/online_learning.py:681-719; BASELINE: "online_learning.py flags
preserved").

Environment roots come from BOP_DATASETS_ROOT / OSSID_DATA_ROOT /
OSSID_CKPT_ROOT / OSSID_RESULT_ROOT env vars (core/config.py) instead of the
reference's edit-in-place config.py.
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np
import pandas as pd

from ossid_code_tpu.core import config as C
from ossid_code_tpu.core.config import Config, default_config
from ossid_code_tpu.data.bop import BopDataset, BopDatasetArgs
from ossid_code_tpu.data.dtoid_bop import get_dataloaders
from ossid_code_tpu.eval.bop_csv import save_results_bop
from ossid_code_tpu.eval.detection_map import eval_detection_results
from ossid_code_tpu.loop.online_learning import OnlineLearningLoop, test_dtoid_model
from ossid_code_tpu.utils.geometry import load_model_shifts
from ossid_code_tpu.models.dtoid.module import DtoidModel
from ossid_code_tpu.models.zephyr.module import ZephyrModel


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Arguments for test-time training")
    parser.add_argument("--dataset_name", type=str, default="lmo",
                        help="The name of the dataset to be used (lmo, ycbv, or a synthetic one)")
    parser.add_argument("--exp_name", type=str, default="exp")

    parser.add_argument("--use_offline_model", action="store_true")
    parser.add_argument("--use_pretrained_dtoid", action="store_true")
    parser.add_argument("--dtoid_weights_path", type=str, default=None)
    parser.add_argument("--n_local_test", type=int, default=None)
    parser.add_argument("--use_dtoid_segmask", action="store_true")
    parser.add_argument("--ignore_dtoid_mask", action="store_true")
    parser.add_argument("--always_dtoid_mask", action="store_true")
    parser.add_argument("--use_oracle_gt", action="store_true")

    parser.add_argument("--use_sift_hypos", action="store_true")
    parser.add_argument("--test_seen", action="store_true")
    parser.add_argument("--backward", action="store_true")
    parser.add_argument("--use_maskrcnn", action="store_true")

    parser.add_argument("--finetune_interval", type=int, default=8)
    parser.add_argument("--finetune_warmup", type=int, default=0)
    parser.add_argument("--finetune_epochs", type=int, default=1)
    parser.add_argument("--finetune_reset", action="store_true")
    parser.add_argument("--finetune_batch_size", type=int, default=8)
    parser.add_argument("--non_cum", action="store_true")
    parser.add_argument("--save_each", action="store_true")

    parser.add_argument("--raw_dtoid", action="store_true")
    parser.add_argument("--no_finetune", action="store_true")
    parser.add_argument("--fast", action="store_true")

    # TPU-framework additions (no reference analogue)
    parser.add_argument("--zephyr_confident_threshold", type=float, default=20.0,
                        help="Pseudo-label gate on the scorer output (ref uses 20; "
                             "scorers trained in this framework emit logits, so "
                             "0.0 is the natural gate)")
    parser.add_argument("--zephyr_depth_crop", type=int, default=0,
                        help="Ship only an SxS detection-centered depth crop to "
                             "the scorer (0 = full frame). The h2d link of a "
                             "remote-attached chip caps loop throughput; 256 "
                             "covers LM-O/YCB-V objects and saves ~40%% of the "
                             "per-frame transfer budget")
    parser.add_argument("--model_shift_path", type=str, default=None,
                        help="JSON of per-object model-frame offsets (meters), "
                             "{obj_id: [x,y,z]} — the YCB-V original-frame vs "
                             "BOP-frame shift zephyr ckpts expect (role of "
                             "zephyr modelPointsShiftYcbv2Bop)")
    parser.add_argument("--yuv_transfer", action="store_true",
                        help="Ship frames to the device as YUV 4:2:0 (1.5 "
                             "bytes/px, the camera-sensor wire format) and "
                             "reconstruct RGB on-chip; halves the largest "
                             "per-frame transfer on the bandwidth-capped "
                             "host->device link")
    parser.add_argument("--bf16_finetune", action="store_true",
                        help="Mixed-precision online finetuning: bf16 "
                             "forward/backward with f32 master weights and "
                             "f32 loss/optimizer math (the standard TPU "
                             "training recipe; ~2x faster finetune events). "
                             "Numerics differ from f32 at bf16 rounding "
                             "level, so off by default for reference-exact "
                             "training parity")
    parser.add_argument("--hypo_backend", type=str, default="auto",
                        choices=["auto", "ppf", "fake"],
                        help="Pose hypothesis generator backend")
    parser.add_argument("--n_fake_hypos", type=int, default=100)
    parser.add_argument("--conf_path", type=str, default=None,
                        help="Explicit config yaml (else built from defaults)")
    # PPF accuracy/throughput knobs (ref Halcon find_surface_model params,
    # online_learning.py:442-447; previously hard-wired)
    parser.add_argument("--model_sampling_dist", type=float, default=None,
                        help="PPF model sampling distance (default: 0.03 ycbv, 0.025 else)")
    parser.add_argument("--scene_sampling_dist", type=float, default=None,
                        help="PPF scene sampling distance (default = model_sampling_dist)")
    parser.add_argument("--ref_pt_rate", type=float, default=0.4,
                        help="PPF reference point rate")
    parser.add_argument("--max_pose_hypos", type=int, default=100,
                        help="Cap on PPF pose hypotheses per frame (M); the "
                             "quality config scores up to 512")
    parser.add_argument("--align_feats", type=int, default=0,
                        help="scorer consumes the 12-cell alignment-fraction "
                             "grid as classifier-head inputs "
                             "(models/zephyr/pointnet2.py). Default 0 for "
                             "reference-checkpoint shape compatibility; "
                             "checkpoints trained in this framework with the "
                             "feature need 1. Reference torch ckpts load "
                             "either way (fc1 zero-padding, torch_import.py)")
    parser.add_argument("--rank_blend", type=float, default=None,
                        help="blend weight of the geometric alignment "
                             "statistic in hypothesis ranking (z-scored net "
                             "score + w * z-scored stat; "
                             "scripts/ab_rank_blend.py measured pick ADD<0.1d "
                             "0.583 -> 0.67-0.68 at w in [0.5, 4]). Default: "
                             "the OSSID_RANK_BLEND env (0 = net-only argmax)")
    parser.add_argument("--refine_top", type=int, default=10,
                        help="ICP-refine the top-N PPF hypotheses (0 = throughput config)")
    parser.add_argument("--refine_device", action="store_true",
                        help="Run the top-N refinement ON DEVICE inside the "
                             "scoring program (batched point-to-point ICP, "
                             "ops/icp_device.py) instead of host ICP — "
                             "single-digit ms for refine_top=20-30 vs 5-10 ms "
                             "PER hypothesis on one host core")
    # zephyr scorer checkpoints (ref loads one per dataset on LM-O, two by
    # object-id parity on YCB-V; ref online_learning.py:171-181,212-227)
    parser.add_argument("--zephyr_ckpt_path", type=str, default=None,
                        help="Scorer ckpt (torch .ckpt or native); default "
                             "OSSID_CKPT_ROOT/final_<dataset>.ckpt if present")
    parser.add_argument("--zephyr_ckpt_path_even", type=str, default=None,
                        help="YCB-V: scorer applied to even obj_ids")
    parser.add_argument("--zephyr_ckpt_path_odd", type=str, default=None,
                        help="YCB-V: scorer applied to odd obj_ids")
    return parser


def build_config(args) -> Config:
    if args.conf_path:
        cfg = default_config().merged(Config.load(args.conf_path).to_dict())
    else:
        cfg = default_config()
    d = cfg.dataset
    d.bop_root = C.BOP_DATASETS_ROOT
    d.test_dataset_name = args.dataset_name
    d.train_dataset_name = args.dataset_name
    d.zephyr_filter_key = None
    d.zephyr_results_percent = 1
    d.train_local_template_sample_from = 10  # ref online_learning.py:136
    # frame caches sized to the finetune buffer (see data/bop.py cache_frames)
    d.cache_frames = max(4, 2 * int(args.finetune_interval) + 16) \
        if args.finetune_interval < 10 ** 6 else 4
    d.proc_cache_frames = d.cache_frames

    if args.dataset_name == "ycbv":
        d.grid_root = os.path.join(C.OSSID_DATA_ROOT, "templates_YCBV_BOP")
        d.zephyr_result_path = os.path.join(
            C.OSSID_DATA_ROOT, "test_ycbv_boptest_zephyr_result_unseen.pkl")
    elif args.dataset_name == "lmo":
        d.grid_root = os.path.join(C.OSSID_DATA_ROOT, "templates_LMO_DTOID")
        d.zephyr_result_path = os.path.join(
            C.OSSID_DATA_ROOT, "lmo_boptest_zephyr_result.pkl")
    else:  # synthetic / custom datasets
        d.grid_root = os.path.join(C.BOP_DATASETS_ROOT, "grid")
        d.zephyr_result_path = os.path.join(
            C.BOP_DATASETS_ROOT, f"{args.dataset_name}_zephyr_results.pkl")
        # custom worlds need not be 480x640 (lmo/ycbv are): take the frame
        # size from the BOP camera.json so the anchors/network/dataset agree
        cam_json = os.path.join(C.BOP_DATASETS_ROOT, args.dataset_name, "camera.json")
        if os.path.exists(cam_json):
            import json

            with open(cam_json) as fp:
                cam = json.load(fp)
            if "height" in cam and "width" in cam:
                h, w = int(cam["height"]), int(cam["width"])
                cfg.model.img_h, cfg.model.img_w = h, w
                d.shorter_length = min(h, w)
                # conv trunk geometry: stride-16 valid-ish heatmap (29x39 at
                # 480x640, see models/dtoid/network.py)
                cfg.model.heatmap_h, cfg.model.heatmap_w = h // 16 - 1, w // 16 - 1
                d.heatmap_shorter_length = min(cfg.model.heatmap_h, cfg.model.heatmap_w)

    if args.n_local_test is not None:
        d.n_local_test = args.n_local_test
    elif args.use_pretrained_dtoid:
        d.n_local_test = 160
    else:
        d.n_local_test = 10
    d.use_provided_template = bool(args.use_pretrained_dtoid)
    return cfg


def build_hypo_gens(args, bop_dataset, zephyr_results):
    """PPF if the native library is available (or forced), else fake.

    The accuracy/throughput trade-off (refine_top, sampling distances,
    ref_pt_rate) is CLI-exposed (ref Halcon params, online_learning.py:442-447)."""
    backend = args.hypo_backend
    if backend in ("auto", "ppf"):
        try:
            from ossid_code_tpu.hypo.ppf import PPFModelMeters, native_available

            if native_available() or backend == "ppf":
                gens = {}
                sampling = args.model_sampling_dist
                if sampling is None:
                    sampling = 0.03 if args.dataset_name == "ycbv" else 0.025
                for oid in bop_dataset.obj_ids:
                    gens[oid] = PPFModelMeters(
                        bop_dataset.getObjPath(oid),
                        ModelSamplingDist=sampling,
                        scene_sampling_dist=args.scene_sampling_dist or sampling,
                        ref_pt_rate=args.ref_pt_rate,
                        # with --refine_device the scorer refines in-graph;
                        # the host ICP pass would be redundant work
                        refine_top=0 if args.refine_device else args.refine_top,
                        max_poses=getattr(args, "max_pose_hypos", 100),
                    )
                return gens
        except ImportError:
            pass
    from ossid_code_tpu.hypo.fake import FakeHypoGen

    return {oid: FakeHypoGen(n_hypos=args.n_fake_hypos, seed=oid) for oid in bop_dataset.obj_ids}


def select_dtoid_weights(args) -> str | None:
    """Which DTOID checkpoint family to load (ref online_learning.py:94-109):
    explicit --dtoid_weights_path wins; --use_pretrained_dtoid selects the
    original-author weights; --use_offline_model selects the transductively-
    finetuned family, else the offline-pretrained one. Returns None when the
    selected file doesn't exist (fresh init, e.g. synthetic runs)."""
    if args.dtoid_weights_path:
        return args.dtoid_weights_path
    if args.use_pretrained_dtoid:
        cand = os.path.join(C.OSSID_CKPT_ROOT, "dtoid_pretrained_original.pth.tar")
    elif args.use_offline_model:
        cand = os.path.join(C.OSSID_CKPT_ROOT, f"dtoid_transductive_{args.dataset_name}.ckpt")
    else:
        cand = os.path.join(C.OSSID_CKPT_ROOT, "dtoid_pretrained.ckpt")
    if os.path.exists(cand):
        return cand
    print(f"DTOID checkpoint {cand} not found; starting from fresh init")
    return None


def select_zephyr_ckpts(args) -> dict:
    """Scorer checkpoint selection (ref online_learning.py:171-181,212-227).

    LM-O: one scorer (final_lmo.ckpt). YCB-V: two scorers chosen by object-id
    parity; --test_seen swaps which checkpoint serves which parity (each ckpt
    was trained with the other half of the objects held out). Returns
    {'single': path|None, 'even': path|None, 'odd': path|None}."""
    out = {"single": None, "even": None, "odd": None}
    if args.dataset_name == "ycbv":
        for_odd = args.zephyr_ckpt_path_odd
        for_even = args.zephyr_ckpt_path_even
        if for_odd is None and for_even is None:
            if args.test_seen:
                for_odd = os.path.join(C.OSSID_CKPT_ROOT, "final_ycbv.ckpt")
                for_even = os.path.join(C.OSSID_CKPT_ROOT, "final_ycbv_valodd.ckpt")
            else:
                for_odd = os.path.join(C.OSSID_CKPT_ROOT, "final_ycbv_valodd.ckpt")
                for_even = os.path.join(C.OSSID_CKPT_ROOT, "final_ycbv.ckpt")
        out["odd"] = for_odd if for_odd and os.path.exists(for_odd) else None
        out["even"] = for_even if for_even and os.path.exists(for_even) else None
    else:
        cand = args.zephyr_ckpt_path or os.path.join(
            C.OSSID_CKPT_ROOT, f"final_{args.dataset_name}.ckpt")
        out["single"] = cand if os.path.exists(cand) else None
    return out


def main(args):
    np.random.seed(42)
    cfg = build_config(args)
    save_root = C.OSSID_RESULT_ROOT
    os.makedirs(save_root, exist_ok=True)
    os.makedirs(C.BOP_RESULTS_FOLDER, exist_ok=True)
    assert not (args.ignore_dtoid_mask and args.always_dtoid_mask)

    with open(cfg.dataset.zephyr_result_path, "rb") as f:
        zephyr_results_list = pickle.load(f)
    zephyr_results = {
        (r["obj_id"], r["scene_id"], r["im_id"]): r for r in zephyr_results_list
    }

    cfg.dataset.load_zephyr_result = True
    train_loader, valid_loader, test_loader = get_dataloaders(cfg, zephyr_results_list)
    test_loader.dataset.sortTargets(reverse=args.backward)

    if getattr(args, "bf16_finetune", False):
        cfg.model.bf16_finetune = True
    if args.use_maskrcnn:
        from ossid_code_tpu.models.maskrcnn import MaskRCNN

        cfg.model.name = "maskrcnn"
        model = MaskRCNN(cfg, seed=cfg.seed)
    else:
        model = DtoidModel(cfg, seed=cfg.seed)
    dtoid_ckpt = select_dtoid_weights(args)
    if dtoid_ckpt:
        from ossid_code_tpu.core.checkpoint import load_checkpoint

        print("Loading DTOID model weights from", dtoid_ckpt)
        model.load_state_dict(load_checkpoint(dtoid_ckpt))

    train_dataset = train_loader.dataset
    train_dataset.clearTargets()
    train_dataset.zephyr_results = zephyr_results

    if args.raw_dtoid:
        test_results = test_dtoid_model(model, test_loader)
        save_path = os.path.join(save_root, f"before_finetune_dtoid_results_{args.exp_name}.pkl")
        with open(save_path, "wb") as f:
            pickle.dump({"test_results": test_results, "main_args": vars(args)}, f)
        df = pd.DataFrame.from_dict(test_results)
        print("DTOID mean IoU:", df["dtoid_iou"].mean())
        print("DTOID Valid IoU recall", (df["dtoid_iou"] > 0.5).astype(float).mean())
        return 0

    bop_args = BopDatasetArgs(
        bop_root=C.BOP_DATASETS_ROOT, dataset_name=args.dataset_name,
        split_name="bop_test", split="test",
    )
    bop_dataset = BopDataset(bop_args)

    inconst_th = 10 if args.dataset_name == "ycbv" else 100
    # the loop's ICP crop box is host-projected from the picked pose now; no
    # path needs the device uv map (need_uv stays available on ZephyrModel
    # for callers that fetch per-point uv)
    need_uv = False

    def make_scorer(ckpt_path):
        zm = ZephyrModel(num_points=512, inconst_ratio_th=inconst_th, need_uv=need_uv,
                         refine_top=(args.refine_top if args.refine_device else 0),
                         align_feats=bool(args.align_feats))
        if args.rank_blend is not None:
            zm.rank_blend = float(args.rank_blend)
        if ckpt_path:
            from ossid_code_tpu.core.checkpoint import load_checkpoint

            print("Loading zephyr scorer weights from", ckpt_path)
            zm.load_state_dict(load_checkpoint(
                ckpt_path, align_feats=bool(args.align_feats)))
        return zm

    zckpts = select_zephyr_ckpts(args)
    zephyr_model_even = zephyr_model_odd = None
    if args.dataset_name == "ycbv" and (zckpts["even"] or zckpts["odd"]):
        # two scorers selected by object-id parity (ref :212-227,461-464)
        zephyr_model_even = make_scorer(zckpts["even"])
        zephyr_model_odd = make_scorer(zckpts["odd"])
        zephyr_model = zephyr_model_even
    else:
        zephyr_model = make_scorer(zckpts["single"])
    hypo_gens = build_hypo_gens(args, bop_dataset, zephyr_results)

    sift_gens = {}
    if args.use_sift_hypos:
        # per-object SIFT feature banks from the template grids
        # (ref online_learning.py:283-285 getFeaturizedModels)
        from ossid_code_tpu.hypo.sift import SiftFeatureModel, SiftHypoGen

        td = test_loader.dataset.template_dataset
        for oid in bop_dataset.obj_ids:
            try:
                fm = SiftFeatureModel().construct_from_templates(td, oid)
                sift_gens[oid] = SiftHypoGen(fm, bop_dataset.dataset_camera["K"])
            except ValueError as e:
                print(f"SIFT featurization failed for obj {oid}: {e}")

    loop = OnlineLearningLoop(
        args, cfg, model, bop_dataset, train_dataset, test_loader,
        zephyr_results, zephyr_model=zephyr_model,
        zephyr_model_even=zephyr_model_even, zephyr_model_odd=zephyr_model_odd,
        hypo_gens=hypo_gens, sift_gens=sift_gens,
        use_icp=(args.dataset_name == "ycbv"),
        model_shifts=(load_model_shifts(args.model_shift_path)
                      if args.model_shift_path else None),
    )
    test_results = loop.run()

    save_path = os.path.join(save_root, f"results_{args.exp_name}.pkl")
    with open(save_path, "wb") as f:
        pickle.dump(
            {
                "test_results": test_results,
                "main_args": vars(args),
                "finetune_logs": loop.finetune_logs,
                "final_state_dict": model.state_dict(),
            },
            f,
        )
    print("Saved results to", save_path)

    save_results_bop(
        test_results, C.BOP_RESULTS_FOLDER, f"online-{args.exp_name}",
        args.dataset_name, pose_key="pred_pose", score_key="pred_score",
        run_eval_script=True,
    )

    # in-repo BOP AR (runs even without bop_toolkit; same bop19 definitions)
    try:
        from ossid_code_tpu.eval.bop_ar import BopEvaluator

        ar = BopEvaluator(bop_dataset).evaluate(test_results)
        print(
            f"BOP AR: {ar['AR']:.4f} (VSD {ar['AR_vsd']:.4f} "
            f"MSSD {ar['AR_mssd']:.4f} MSPD {ar['AR_mspd']:.4f})"
        )
    except Exception as e:  # eval must never kill a finished run
        print("in-repo BOP AR evaluation failed:", e)

    df = pd.DataFrame.from_dict(
        [{k: r[k] for k in ("dtoid_iou", "pred_iou_visib", "pred_add01d")} for r in test_results]
    )
    print("DTOID mean IoU:", df["dtoid_iou"].mean())
    print("DTOID Valid IoU recall", (df["dtoid_iou"] > 0.5).astype(float).mean())
    print("Zephyr Valid IoU recall", (df["pred_iou_visib"] > 0.5).astype(float).mean())
    print("ADD(-S) < 0.1d:", df["pred_add01d"].mean())

    # in-repo detection mAP (replaces the Cartucho/mAP subprocess)
    gt_boxes = {}
    for t in bop_dataset.targets:
        mask = bop_dataset.getMaskByIds(t["obj_id"], t["scene_id"], t["im_id"], visib=True)
        ys, xs = (np.asarray(mask) > 0).nonzero()
        if len(ys):
            gt_boxes[(t["obj_id"], t["scene_id"], t["im_id"])] = (
                xs.min(), ys.min(), xs.max(), ys.max())
    aps, mAP = eval_detection_results(test_results, gt_boxes)
    print("Detection mAP@0.5:", mAP)
    return 0


if __name__ == "__main__":
    main(build_parser().parse_args())
