"""Multi-camera (N-stream) online serving loop on a 2-D device mesh.

Scale-out story for production deployments (SURVEY.md §2.4 scalable axes —
the reference serves exactly one frame on one GPU,
ref scripts/online_learning.py:166): N camera streams watch the same object
set from different viewpoints (different BOP scenes). Each round, the N
current frames are detected by ONE sharded program on a (dp=frames,
tp=templates) mesh — every chip correlates its template slice against its
frame slice — then each stream runs hypothesis generation + device scoring +
pseudo-labeling through the standard loop machinery. All streams share the
detector weights and ONE pseudo-label buffer, so every camera's confident
poses finetune the detector that serves all cameras.

Semantics: sequential per round (no cross-frame speculation), so a finetune
triggered by stream i is visible to stream i+1's detection in the SAME round —
the straightforward generalization of the reference's sequential loop.
"""

from __future__ import annotations

import numpy as np

from ossid_code_tpu.loop.online_learning import OnlineLearningLoop


def make_farm_detect(dtoid_model, mesh, axes=("dp", "tp"), topk: int = 500):
    """Batched fused detection on a 2-D mesh: F uint8 frames shard over
    `axes[0]`, the T template features over `axes[1]`; the full serving path
    (trunk, correlation, heads, top-k, NMS, winner-template seg decode) runs
    in one program per round. Params are ARGUMENTS (replicated), so online
    finetuning never retraces.

    Returns fn(params, batch_stats, images_u8 (F, H, W, 3), local_feats
    (T, 7, 7, 640), global_feat) -> dict of per-frame detection outputs."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ossid_code_tpu.models.dtoid.network import DtoidNetwork

    net = dtoid_model.net
    anchors = dtoid_model.anchors
    m = dtoid_model.cfg.model
    fshard = NamedSharding(mesh, P(axes[0]))
    tshard = NamedSharding(mesh, P(axes[1]))
    repl = NamedSharding(mesh, P())

    def one_frame(params, batch_stats, img_u8, local_feats, global_feat):
        return net.apply(
            {"params": params, "batch_stats": batch_stats},
            img_u8[None], local_feats, global_feat, anchors,
            pre_nms_topk=int(m.get("topk_pre_nms", 1000)),
            topk=topk, nms_iou=float(m.nms_iou_thresh),
            pack_seg=False,
            method=DtoidNetwork.detect,
        )

    fwd = jax.vmap(one_frame, in_axes=(None, None, 0, None, None))
    return jax.jit(fwd, in_shardings=(repl, repl, fshard, tshard, repl))


class MultiStreamLoop(OnlineLearningLoop):
    """Drives N streams (= N scenes of one BOP world) with farm detection.

    Construction mirrors OnlineLearningLoop (same injected components); the
    test loader must cover all streams' targets. `mesh` is the 2-D device
    mesh from parallel.mesh.make_mesh_2d."""

    def __init__(self, *args, mesh=None, **kwargs):
        super().__init__(*args, **kwargs)
        assert mesh is not None, "MultiStreamLoop needs a 2-D mesh"
        self.mesh = mesh
        self._farm = make_farm_detect(self.model, mesh)

    # per-round grouping: all scenes' frames of the same (obj, im) ----------
    def _rounds(self):
        ds = self.test_loader.dataset
        groups: dict = {}
        for idx, t in enumerate(ds.bop_dataset.targets):
            groups.setdefault((t["im_id"], t["obj_id"]), []).append(
                (t["scene_id"], idx))
        return [
            (key, sorted(v)) for key, v in sorted(groups.items())
        ]

    def run(self, progress: bool = True):
        try:
            return self._run_streams(progress)
        finally:
            self.close()

    def _run_streams(self, progress: bool = True):
        import jax

        ds = self.test_loader.dataset
        per_stream: dict = {}
        iteration = -1
        for (im_id, obj_id), members in self._rounds():
            iteration += 1
            samples = [ds[idx] for _, idx in members]
            scene_ids = [sid for sid, _ in members]
            imgs = np.stack([np.asarray(s["img"]) for s in samples])
            if imgs.dtype != np.uint8:
                imgs = (np.clip(imgs, 0, 1) * 255.0).round().astype(np.uint8)
            self.proc_hw = imgs.shape[1:3]

            local, glob = self.model.get_template_features(
                obj_id, samples[0]["limg"], samples[0]["lmask"]
            )
            outs = jax.device_get(
                self._farm(self.model.params, self.model.batch_stats,
                           imgs, local, glob)
            )

            for si, (scene_id, idx) in enumerate(members):
                out = {k: np.asarray(v[si]) for k, v in outs.items()}
                out["segmentation"] = out.pop("seg_u8").astype(np.float32) / 255.0
                out["final_bbox"] = [out["pred_bbox"]]
                out["final_score"] = [out["pred_scores"]]
                self._one_stream_frame(
                    iteration, obj_id, scene_id, im_id, samples[si], out,
                    per_stream.setdefault(scene_id, []), progress,
                )
        return per_stream

    def _one_stream_frame(self, iteration, obj_id, scene_id, im_id, sample,
                          out, results, progress):
        """Post-detection half of one stream's frame: mask -> hypotheses ->
        device scoring -> completion (render, gate, shared-buffer finetune) —
        the standard loop stages, sequential."""
        import time

        from ossid_code_tpu.eval.pose_metrics import (
            add_err, adi_err, pp_err_batch_async,
        )
        from ossid_code_tpu.utils.timing import Timer

        args = self.args
        bop_data = self.bop_dataset.getDataByIds(obj_id, scene_id, im_id)
        depth = bop_data["depth"]
        mat_gt = bop_data["mat_gt"]
        cam_K = np.asarray(bop_data["scene_camera"]["cam_K"])
        model_points = self.model_clouds[obj_id][0]
        is_sym = obj_id in self.bop_dataset.sym_obj_ids
        err_func = add_err if args.fast else (adi_err if is_sym else add_err)

        times = {"time_ppf": None, "time_sift": None, "time_zephyr": None,
                 "time_icp": None, "time_finetune": 0, "time_data": 0.0,
                 "time_mask": 0.0, "time_pperr": 0.0, "time_label": 0.0,
                 "time_iter": 0.0}
        t0 = time.perf_counter()
        final_score = out["final_score"][0]
        dtoid_confident = bool(final_score[0] > 0.5)
        use_dtoid_mask = (
            False if args.ignore_dtoid_mask
            else True if args.always_dtoid_mask else dtoid_confident
        )
        ctx = {
            "iteration": iteration, "obj_id": obj_id,
            "scene_id": scene_id, "im_id": im_id,
            "depth": depth, "mat_gt": mat_gt, "cam_K": cam_K,
            "model_points": model_points, "err_func": err_func,
            "mask_gt": bop_data["mask_gt"], "mask_gt_visib": bop_data["mask_gt_visib"],
            "times": times, "time_dtoid": 0.0,
            "final_bbox": out["final_bbox"][0], "final_score": final_score,
            "dtoid_iou": 0.0, "dtoid_pred_mask": out["segmentation"],
            "dtoid_confident": dtoid_confident,
            "use_dtoid_mask": use_dtoid_mask,
            "zhandle": None, "zr": self.zephyr_results.get((obj_id, scene_id, im_id)),
            "poses": None, "pp_err": None, "n_hypos": 0,
        }
        if use_dtoid_mask:
            batch = {"img": np.asarray(sample["img"])[None]}
            with Timer() as t_mask:
                dist_mask = self._dtoid_mask(batch, out, depth)
            times["time_mask"] = t_mask.interval
            poses = self._generate_hypotheses(
                obj_id, bop_data["img"], depth, dist_mask, cam_K,
                bop_data["scene_meta"], mat_gt, times,
            )
            if len(poses):
                depth_u16 = (depth * 1000.0).round().clip(0, 65535).astype(np.uint16)
                ctx["zhandle"] = self._score_hypotheses_async(
                    obj_id, bop_data["img"], depth_u16, cam_K, poses, times
                )
                ctx["poses"] = poses
                ctx["n_hypos"] = len(poses)
                pts_dev, pts_q_dev = self._pp_pts(obj_id)
                ctx["pp_handle"] = pp_err_batch_async(
                    poses, mat_gt, pts_dev,
                    symmetric=err_func is adi_err, pts_q_dev=pts_q_dev,
                )
        elif ctx["zr"] is None:
            raise RuntimeError(
                f"no precomputed zephyr result for {(obj_id, scene_id, im_id)}"
            )
        times["time_iter"] = time.perf_counter() - t0
        self._complete_frame(ctx, results, progress)
