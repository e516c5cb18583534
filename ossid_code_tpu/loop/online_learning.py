"""The OSSID online self-supervised learning loop — the product.

TPU-native reimplementation of ref scripts/online_learning.py:78-679: stream
BOP test frames; DTOID zero-shot detection -> confidence gate -> pose
hypothesis generation (PPF/SIFT/fake, host-side) in the detected region ->
Zephyr hypothesis scoring (one fused device program) -> optional ICP ->
render-based pseudo-mask -> confident poses added to the finetune buffer ->
periodic DTOID finetuning as one compiled train step per batch.

Differences by design (TPU-first):
  * detection + scoring are fixed-shape jitted programs compiled once;
  * the template feature cache lives on device;
  * the finetune step never retraces (fixed batch shape, padded annotations);
  * result rows keep the reference's schema (obj/scene/im ids, masks, IoUs,
    per-stage time_* fields) so downstream eval tooling is unchanged.

Components are injected so the loop runs hermetically in tests (FakeHypoGen +
synthetic BOP fixture) and with real PPF/SIFT in production.
"""

from __future__ import annotations

import os
import pickle
import time

import numpy as np
import cv2

from ossid_code_tpu.utils.geometry import expand_box, depth2cloud
from ossid_code_tpu.utils.timing import Timer
from ossid_code_tpu.data.dtoid_bop import NumpyLoader
from ossid_code_tpu.render.rasterizer import Renderer
from ossid_code_tpu.render.visib import estimate_visib_mask_gt
from ossid_code_tpu.utils.geometry import K2meta
from ossid_code_tpu.eval.pose_metrics import (
    add_err, add_err_batch, adi_err, adi_err_batch, object_diameter,
    pp_err_batch_async, pp_err_fetch,
)
from ossid_code_tpu.hypo.icp import icp_refinement
from ossid_code_tpu.utils.rpc_stats import STATS

DTOID_CONFIDENT_THRESHOLD = 0.5  # ref online_learning.py:84
ZEPHYR_CONFIDENT_THRESHOLD = 20  # ref online_learning.py:85


class _PartFut:
    """View into one element of a bundled fetch future (a single device_get
    RPC carrying the next frame's detection outputs plus one or more deferred
    frames' completion outputs). `path` indexes nested tuples. Never
    cancellable: the other elements' consumers still need the payload even if
    this view's consumer loses interest (e.g. a finetune invalidates the
    speculative detection)."""

    def __init__(self, fut, *path: int):
        self._fut, self._path = fut, path

    def result(self, timeout=None):
        out = self._fut.result(timeout)
        for i in self._path:
            out = out[i]
        return out

    def cancel(self) -> bool:
        return False


def model_cloud_from_ply(mesh, n_points: int = 2048, seed: int = 0):
    """Sample a colored, normal-equipped model cloud (meters) from a BOP mesh
    (mm), replacing the reference's precomputed model_cloud_{:02d}.npz files
    (ref online_learning.py:303-311) when they are absent."""
    rng = np.random.default_rng(seed)
    v = mesh.vertices / 1000.0
    faces = mesh.faces
    # sample on faces proportionally to area
    a, b, c = v[faces[:, 0]], v[faces[:, 1]], v[faces[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    probs = areas / areas.sum()
    fidx = rng.choice(len(faces), n_points, p=probs)
    r1, r2 = rng.random((2, n_points))
    s1 = np.sqrt(r1)
    w0, w1, w2 = 1 - s1, s1 * (1 - r2), s1 * r2
    pts = w0[:, None] * v[faces[fidx, 0]] + w1[:, None] * v[faces[fidx, 1]] + w2[:, None] * v[faces[fidx, 2]]
    fn = np.cross(b - a, c - a)
    fn /= np.clip(np.linalg.norm(fn, axis=1, keepdims=True), 1e-12, None)
    # orient normals outward (mesh winding is arbitrary; PPF features compare
    # these against camera-facing scene normals, so the sign must be coherent).
    # Stored vertex normals win when present: the centroid rule mis-orients
    # concave regions of compound shapes (L/T brackets), whereas primitive
    # pieces carry piece-local outward normals.
    if mesh.normals is not None and len(mesh.normals) == len(v):
        vn = (mesh.normals[faces[:, 0]] + mesh.normals[faces[:, 1]]
              + mesh.normals[faces[:, 2]])
        flip = np.einsum("ij,ij->i", fn, vn) < 0
    else:
        centroid = v.mean(axis=0)
        face_centers = (a + b + c) / 3.0
        flip = np.einsum("ij,ij->i", fn, face_centers - centroid) < 0
    fn[flip] *= -1.0
    normals = fn[fidx]
    if mesh.colors is not None:
        cols = (
            w0[:, None] * mesh.colors[faces[fidx, 0]]
            + w1[:, None] * mesh.colors[faces[fidx, 1]]
            + w2[:, None] * mesh.colors[faces[fidx, 2]]
        )
    else:
        cols = np.full((n_points, 3), 0.5)
    return pts.astype(np.float32), cols.astype(np.float32), normals.astype(np.float32)


class OnlineLearningLoop:
    def __init__(
        self,
        args,
        cfg,
        dtoid_model,
        bop_dataset,
        train_dataset,
        test_loader,
        zephyr_results: dict,
        zephyr_model=None,
        zephyr_model_even=None,
        zephyr_model_odd=None,
        hypo_gens: dict | None = None,
        sift_gens: dict | None = None,
        model_clouds: dict | None = None,
        use_icp: bool = False,
        pipeline_scoring: bool = True,
        model_shifts: dict | None = None,
    ):
        self.args = args
        self.cfg = cfg
        self.model = dtoid_model
        # share the test dataset's reader when it points at the same data so
        # the per-frame PNG decode cache is hit instead of decoding twice
        loader_reader = getattr(getattr(test_loader, "dataset", None), "bop_dataset", None)
        if (
            loader_reader is not None
            and loader_reader.dataset_root == bop_dataset.dataset_root
            and loader_reader.split == bop_dataset.split
        ):
            bop_dataset = loader_reader
        self.bop_dataset = bop_dataset
        self.train_dataset = train_dataset
        self.test_loader = test_loader
        self.zephyr_results = zephyr_results
        self.zephyr_model = zephyr_model
        # YCB-V two-scorer plumbing: the reference selects between two
        # checkpoints by object-id parity (each trained with the other half
        # of the objects held out; ref online_learning.py:212-227,461-464)
        self.zephyr_model_even = zephyr_model_even
        self.zephyr_model_odd = zephyr_model_odd
        self.hypo_gens = hypo_gens or {}
        self.sift_gens = sift_gens or {}
        self.use_icp = use_icp
        self.pipeline_scoring = pipeline_scoring

        # model clouds (points m, colors, normals) per object
        if model_clouds is None:
            from ossid_code_tpu.render.mesh import load_ply

            model_clouds = {}
            for oid in bop_dataset.obj_ids:
                mesh = load_ply(bop_dataset.getObjPath(oid))
                model_clouds[oid] = model_cloud_from_ply(mesh)
        if model_shifts:
            # per-object model-frame offsets (role of zephyr
            # modelPointsShiftYcbv2Bop, ref online_learning.py:440 — YCB-V
            # scorer ckpts expect original-YCB-frame clouds)
            from ossid_code_tpu.utils.geometry import shift_model_points

            model_clouds = {
                oid: ((shift_model_points(pc[0], model_shifts[oid]), pc[1], pc[2])
                      if oid in model_shifts else pc)
                for oid, pc in model_clouds.items()
            }
        self.model_clouds = model_clouds
        self.diameters = {
            oid: object_diameter(pc[0]) for oid, pc in self.model_clouds.items()
        }
        for zm in {id(m): m for m in (zephyr_model, zephyr_model_even, zephyr_model_odd)
                   if m is not None}.values():
            # pin per-object model data + grouping indices on device up front
            for oid, (pts, cols, nrms) in self.model_clouds.items():
                zm.prepare_object(oid, pts, cols, nrms)

        self.initial_state_dict = dtoid_model.state_dict()
        self.renderers: dict = {}
        # device-resident model clouds for the on-device pp_err diagnostic
        # (uploaded once; per-frame re-upload would eat the h2d budget)
        self._pp_pts_dev: dict = {}
        # one IO thread (created lazily): next-frame PNG decode overlaps the
        # detection-fetch RPC (cv2 releases the GIL during decode)
        self._io_pool = None
        self._prefetched: dict = {}  # ids -> Future[bop_data]
        # host packs + uploads produced 2 frames ahead on the IO thread
        # (_prefetch_frame), consumed by _build_det_batch
        self._extras: dict = {}  # ids -> {img_shared_dev, depth_u16, depth_dev}
        # frame-level upload sharing: the targets list has one row PER OBJECT
        # per image (LM-O: 8 objects/image; ref sortTargets orders them
        # adjacently, online_learning.py:150), but the frame/depth uploads are
        # object-independent — uploading them once per TARGET wastes the
        # scarce h2d link. Keyed by (scene_id, im_id), shared by every target
        # on that image; bounded LRU (uploads are ~1 MB HBM each).
        import threading

        self._frame_uploads: dict = {}
        self._frame_uploads_order: list = []
        self._frame_uploads_lock = threading.Lock()
        # OSSID_FRAME_SHARE=0 reverts to one upload per target (A/B knob)
        self._frame_share = os.environ.get("OSSID_FRAME_SHARE", "1") == "1"
        # dedicated fetch thread: the ~30 ms device_get RPC of the speculative
        # detection runs here, overlapped with this frame's PPF/dispatch host
        # work (a separate pool from _io_pool so a PNG decode never delays it).
        # History: r3 measured thread mode LOSING in the shallow-queue
        # throughput config (26 -> 41 ms — its RPC serialized against the
        # separate deferred score fetch), so auto meant "thread iff
        # finetuning". r5's bundled fetch removed that separate RPC (every
        # deferred completion rides the detection bundle), and thread mode now
        # wins BOTH profiles (throughput 15.75 -> 20.85 fps, gating 13.1 at
        # 0.62 RPC/frame) — auto is thread everywhere. Override with
        # OSSID_SPEC_FETCH=thread|inline.
        self._fetch_pool = None
        mode = os.environ.get("OSSID_SPEC_FETCH", "auto")
        self._spec_fetch_thread = (
            mode == "thread" if mode in ("thread", "inline") else True
        )
        self.next_finetune_number = args.finetune_interval
        # prefetch a deferred frame's completion outputs (scores + refined
        # poses + pp_err) instead of paying a separate blocking device_get RPC
        # inside _complete_frame: inline spec-fetch mode merges them into the
        # detection fetch (ONE device_get), thread mode hands them to the
        # fetch thread right at deferral time. Values are identical — only the
        # transfer timing moves — so pipeline semantics are untouched.
        # OSSID_COMPLETE_PREFETCH=0 reverts to the per-completion RPC.
        self._complete_prefetch = os.environ.get(
            "OSSID_COMPLETE_PREFETCH", "1") == "1"
        # thread mode: bundle the deferred completion arrays into the SAME
        # device_get RPC as the next frame's speculative detection fetch —
        # steady state then pays ONE fetch RPC per frame (the tunnel serializes
        # RPCs, so two side-thread fetches still cost two round trips of
        # tunnel occupancy). OSSID_MERGED_FETCH=0 reverts to the r3 behavior
        # (a separate completion RPC handed to the fetch thread at deferral).
        self._merged_fetch = os.environ.get("OSSID_MERGED_FETCH", "1") == "1"
        # detection-fetch bundling: how many upcoming frames' detection
        # outputs ride ONE device_get RPC (r5, VERDICT item 3). At 2, frames
        # N+1 and N+2 are both dispatched during frame N and fetched together
        # -> 0.5 fetch RPCs/frame in steady state (the r4 floor was 1.04-1.08,
        # and at a degraded ~45 ms round trip that RPC dominated the frame).
        # Exactness is untouched: detection results are always computed under
        # the weights current when the frame is processed — a finetune bumps
        # weights_version and both speculative entries redispatch (their
        # weight-independent uploads are reused). Requires the fetch thread
        # (inline mode keeps the r4 cadence of one bundle per frame).
        self._fetch_bundle = max(1, int(os.environ.get("OSSID_FETCH_BUNDLE", "2")))
        # completion pipeline depth: how many frames a deferred completion may
        # trail its dispatch. With bundle=1, depth 2 was a measured NEGATIVE
        # on the real chip (gating 11.7 -> 9.1 fps, same tunnel): it collapses
        # the main thread's completion wait (17 -> 1 ms) but removes the
        # backpressure that keeps host and device in lockstep — the host runs
        # ahead, the bundled fetch RPCs stretch 44 -> 78 ms, and the block
        # moves wholesale to the next frame's spec wait (0 -> 41 ms). With
        # bundle=2 the natural depth IS 2 (a completion deferred at a
        # fetch-issuing frame can only ride the bundle two frames later), so
        # the default couples to the effective bundle size. Exactness at any
        # depth is preserved by _can_defer_completion counting every in-flight
        # frame against the finetune boundary (equivalence-tested).
        eff_bundle = self._fetch_bundle if self._spec_fetch_thread else 1
        self._pipeline_depth = max(1, int(os.environ.get(
            "OSSID_PIPELINE_DEPTH", str(eff_bundle))))
        self.finetune_logs: list = []
        # device-resident finetune replay: gated frames stay in HBM between
        # detection and the finetune pass (loop/replay.py)
        from ossid_code_tpu.loop.replay import DeviceReplayBuffer

        self.replay = DeviceReplayBuffer() if hasattr(
            dtoid_model, "train_step_u8_async"
        ) else None

    def _io_submit(self, fn, *fn_args):
        if self._io_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._io_pool = ThreadPoolExecutor(max_workers=1)
        return self._io_pool.submit(fn, *fn_args)

    def _fetch_submit(self, fn, *fn_args):
        if self._fetch_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._fetch_pool = ThreadPoolExecutor(max_workers=1)
        return self._fetch_pool.submit(fn, *fn_args)

    def _timed_get(self, kind, arrs):
        """jax.device_get with RPC accounting (utils/rpc_stats.py)."""
        import jax

        t0 = time.perf_counter()
        out = jax.device_get(arrs)
        STATS.rpc(kind, time.perf_counter() - t0)
        return out

    def _thread_fetch_multi(self, items, pend_devs):
        """Fetch-thread task: ONE device_get RPC for one-or-more upcoming
        frames' detection outputs (out_dev, det_batch pairs, oldest first) AND
        the deferred frames' completion outputs (scores + refined poses +
        pp_err, a tuple per frame). Host-side decode (unpackbits, IoU) happens
        here too, overlapped with the main thread's PPF/dispatch work.
        Consumers read their slice through _PartFut views: (0, j) for the j-th
        detection, (1, j) for the j-th completion."""
        outs = tuple(i[0] for i in items)
        kind = "det+complete" if pend_devs else "det_fetch"
        fetched_outs, pend_fetched = self._timed_get(kind, (outs, pend_devs))
        dets = tuple(
            self.model.fetch_detections(o, db, fetched=f)
            for (o, db), f in zip(items, fetched_outs)
        )
        return dets, pend_fetched

    def _frame_cache_get(self, fk) -> dict:
        """Snapshot of the shared uploads for frame fk (thread-safe copy)."""
        if not self._frame_share:
            return {}
        with self._frame_uploads_lock:
            entry = self._frame_uploads.get(fk)
            return dict(entry) if entry else {}

    def _frame_cache_put(self, fk, new: dict):
        if not self._frame_share:
            return
        with self._frame_uploads_lock:
            entry = self._frame_uploads.get(fk)
            if entry is None:
                self._frame_uploads[fk] = entry = {}
                self._frame_uploads_order.append(fk)
                while len(self._frame_uploads_order) > 4:
                    self._frame_uploads.pop(self._frame_uploads_order.pop(0), None)
            entry.update(new)

    def close(self):
        """Release the IO/fetch threads and any prefetched frames (run() calls
        this in its finally; safe to call repeatedly — run() can be called
        again)."""
        self._prefetched.clear()
        self._extras.clear()
        with self._frame_uploads_lock:
            self._frame_uploads.clear()
            self._frame_uploads_order.clear()
        if self._io_pool is not None:
            self._io_pool.shutdown(wait=False)
            self._io_pool = None
        if self._fetch_pool is not None:
            self._fetch_pool.shutdown(wait=False)
            self._fetch_pool = None

    # ------------------------------------------------------------ stages
    def _dtoid_mask(self, batch_np, out, depth):
        """Build the region mask from detection output
        (ref online_learning.py:381-408)."""
        args = self.args
        final_bbox = out["final_bbox"][0]
        final_score = out["final_score"][0]
        if args.use_dtoid_segmask:
            seg = out["segmentation"]
            if seg.shape != depth.shape:
                seg = cv2.resize(seg.astype(np.float32), (depth.shape[1], depth.shape[0]))
            mask = seg > 0.5
            if mask.sum() <= 25:
                mask = np.ones_like(mask)
            return mask
        mask = np.zeros_like(depth, dtype=bool)
        img_h, img_w = depth.shape
        # detection boxes are in processed-image coordinates; rescale to raw
        ph, pw = self.proc_hw
        sx, sy = img_w / pw, img_h / ph
        depth_pos = depth > 0
        has_depth_mask = False  # incremental (mask & depth>0).any()
        for bbox, score in zip(final_bbox, final_score):
            # scores are sorted descending: once below threshold with a
            # non-empty mask, every later box is skipped too (ref :393-405)
            if score < 0.5 and has_depth_mask:
                break
            x1, y1, x2, y2 = bbox
            x1, y1, x2, y2 = x1 * sx, y1 * sy, x2 * sx, y2 * sy
            x1, y1, x2, y2 = expand_box(x1, y1, x2, y2, img_h, img_w, 1.2)
            region = np.s_[int(y1) : int(y2), int(x1) : int(x2)]
            mask[region] = True
            if not has_depth_mask:
                has_depth_mask = bool(depth_pos[region].any())
        return mask

    def _generate_hypotheses(self, obj_id, img, depth, dist_mask, cam_K, scene_meta, mat_gt, times):
        """Host-side hypothesis generation (ref online_learning.py:410-449)."""
        args = self.args
        gen = self.hypo_gens[obj_id]
        scene_pc = depth2cloud(depth, np.logical_and(dist_mask, depth > 0), cam_K)
        with Timer() as t:
            poses, scores, gen_time = gen.find_surface_model(scene_pc)
        times["time_ppf"] = gen_time if gen_time else t.interval

        if args.use_sift_hypos and obj_id in self.sift_gens:
            with Timer() as t:
                try:
                    poses_sift = self.sift_gens[obj_id].match(img, depth, dist_mask, scene_meta)
                except Exception:
                    # SIFT failure falls back to identity hypotheses with a
                    # None time marker (ref online_learning.py:428-432)
                    poses_sift = np.stack([np.eye(4)] * 20)
                    sift_ok = False
                else:
                    sift_ok = True
            # Timer sets .interval at __exit__ — reading it inside the with
            # block records 0.0 (r4 fix: success frames now carry real walls)
            times["time_sift"] = t.interval if sift_ok else None
            poses = np.concatenate([poses_sift, poses], axis=0)
        else:
            times["time_sift"] = 0
        return poses

    def _save_each_ckpt(self, iteration: int):
        """--save_each: snapshot the model right after each finetune as
        <save_root>/<exp_name>/epoch_<iteration>.ckpt with the reference's
        payload schema {iteration, model_state_dict, conf}
        (ref online_learning.py:535-546)."""
        from ossid_code_tpu.core import config as C

        save_root = getattr(self.args, "save_root", None) or C.OSSID_RESULT_ROOT
        folder = os.path.join(save_root, self.args.exp_name)
        os.makedirs(folder, exist_ok=True)
        path = os.path.join(folder, f"epoch_{iteration}.ckpt")
        payload = {
            "iteration": iteration,
            "model_state_dict": self.model.state_dict(),
            "conf": self.cfg.to_dict() if hasattr(self.cfg, "to_dict") else self.cfg,
        }
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)
        print("Saved finetuned model to", path)

    def _zephyr_for(self, obj_id):
        """Scorer for this object: parity-selected pair if provided (YCB-V,
        ref online_learning.py:461-464), else the single shared scorer."""
        if self.zephyr_model_even is not None or self.zephyr_model_odd is not None:
            zm = self.zephyr_model_even if obj_id % 2 == 0 else self.zephyr_model_odd
            if zm is not None:
                return zm
        return self.zephyr_model

    def _score_hypotheses_async(self, obj_id, img_u8, depth_u16, cam_K, poses, times,
                                depth_origin=None):
        """Dispatch Zephyr scoring on device (ref online_learning.py:455-469)
        and start the async host copy of the scores; `fetch_scores` blocks.

        The reference's GaussianBlur preprocessing runs in-graph; inputs ship
        as uint8 RGB + uint16 depth (transfer-bound link). Splitting dispatch
        from fetch lets the loop overlay the fetch RPC (the dominant cost of
        this stage on a remote-attached chip) with the next frame's host work."""
        pts, cols, nrms = self.model_clouds[obj_id]
        data = {
            "img": img_u8,
            "depth": depth_u16,
            "cam_K": cam_K,
            "model_points": pts,
            "model_colors": cols,
            "model_normals": nrms,
            "pose_hypos": poses,
        }
        if depth_origin is not None:
            data["depth_origin"] = depth_origin
        with Timer() as t:
            handle = self._zephyr_for(obj_id).score_hypotheses_async(data, obj_id=obj_id)
        times["time_zephyr"] = t.interval
        return handle

    def _depth_crop_window(self, dist_mask, img_hw):
        """Fixed-size square window centered on the detection mask (clamped to
        the image). Zephyr scoring samples depth only around the detected
        object, so only this crop ships to the device — the full uint16 depth
        (614 KB at 480x640) would otherwise eat ~40% of the per-frame budget
        of the bandwidth-capped host->device link."""
        s = int(self.args.zephyr_depth_crop)
        h, w = img_hw
        ys, xs = np.nonzero(dist_mask)
        if len(ys):
            cy, cx = int(ys.mean()), int(xs.mean())
        else:
            cy, cx = h // 2, w // 2
        y0 = int(np.clip(cy - s // 2, 0, max(h - s, 0)))
        x0 = int(np.clip(cx - s // 2, 0, max(w - s, 0)))
        return y0, x0, min(s, h), min(s, w)

    def _pp_pts(self, obj_id):
        """Device-resident (full, query-subsampled) model clouds for pp_err."""
        if obj_id not in self._pp_pts_dev:
            import jax.numpy as jnp

            pts = self.model_clouds[obj_id][0]
            if len(pts) > 1000:
                pts_q = pts[np.linspace(0, len(pts) - 1, 1000).round().astype(int)]
            else:
                pts_q = pts
            self._pp_pts_dev[obj_id] = (jnp.asarray(pts), jnp.asarray(pts_q))
        return self._pp_pts_dev[obj_id]

    def _render_pred(self, obj_id, cam_K, pred_pose, img_hw):
        if obj_id not in self.renderers:
            r = Renderer(K2meta(cam_K), img_h=img_hw[0], img_w=img_hw[1])
            r.addObject(obj_id, self.bop_dataset.getObjPath(obj_id), pose=pred_pose,
                        mm2m=True, simplify=self.args.fast)
            self.renderers[obj_id] = r
        r = self.renderers[obj_id]
        r.obj_nodes[obj_id].matrix = pred_pose
        _, pred_depth = r.render(depth_only=True)
        return pred_depth

    def _prefetch_frame(self, obj_id, scene_id, im_id, ph, pw):
        """IO-thread frame preparation, queued 2 frames ahead: the PNG decode
        plus the host packs/uploads the dispatch path would otherwise do
        inline (I420 pack + frame device_put, uint16 depth quantization). cv2
        and the transfer socket release the GIL, so this overlaps the main
        thread's device waits. Byproducts land in self._extras; the values
        are bitwise identical to _build_det_batch's inline computation, which
        remains the fallback when an entry is absent."""
        bop_data = self.bop_dataset.getDataByIds(obj_id, scene_id, im_id)
        try:
            import jax

            # frame/depth uploads are object-independent: targets on the same
            # image (LM-O: 8/image, adjacent after sortTargets) share them
            fk = (scene_id, im_id)
            extras = self._frame_cache_get(fk)
            new = {}
            raw = bop_data["img"]
            if ("img_shared_dev" not in extras
                    and raw.shape[:2] == (ph, pw) and raw.dtype == np.uint8):
                if (getattr(self.args, "yuv_transfer", False)
                        and ph % 2 == 0 and pw % 2 == 0):
                    from ossid_code_tpu.ops.yuv import ship_rgb_yuv420

                    new["img_shared_dev"] = ship_rgb_yuv420(raw)[None]
                else:
                    new["img_shared_dev"] = jax.device_put(raw[None])
            if "depth_u16" not in extras:
                new["depth_u16"] = (
                    (bop_data["depth"] * 1000.0).round().clip(0, 65535)
                    .astype(np.uint16)
                )
            if (not getattr(self.args, "zephyr_depth_crop", 0)
                    and "depth_dev" not in extras):
                new["depth_dev"] = jax.device_put(
                    extras.get("depth_u16", new.get("depth_u16")))
            if new:
                self._frame_cache_put(fk, new)
                extras.update(new)
            self._extras[(obj_id, scene_id, im_id)] = extras
        except Exception:
            pass  # extras are purely an optimization; inline path still works
        return bop_data

    def _build_det_batch(self, batch, bop_data):
        """Detection input for one loader batch. When the processed image has
        the raw resolution (LM-O, YCB-V, synthetic), the raw uint8 frame is
        uploaded ONCE and shared between detection and zephyr scoring — the
        host->device link is the scarce resource."""
        import jax

        ids = (int(batch["obj_id"][0]), int(batch["scene_id"][0]),
               int(batch["im_id"][0]))
        fk = ids[1:]
        ex = self._extras.pop(ids, None)
        if ex is None:
            # no per-target prefetch ran; the frame-level uploads may still
            # exist from an earlier target on the same image
            ex = self._frame_cache_get(fk)
        raw = bop_data["img"]
        ph, pw = batch["img"].shape[1:3]
        img_shared_dev = None
        if raw.shape[:2] == (ph, pw) and raw.dtype == np.uint8:
            img_shared_dev = ex.get("img_shared_dev")
            if img_shared_dev is None:
                if getattr(self.args, "yuv_transfer", False) and ph % 2 == 0 and pw % 2 == 0:
                    # ship 1.5 B/px YUV420 and reconstruct uint8 RGB on-chip:
                    # the frame upload is the largest transfer on the
                    # bandwidth-capped link (ops/yuv.py)
                    from ossid_code_tpu.ops.yuv import ship_rgb_yuv420

                    img_shared_dev = ship_rgb_yuv420(raw)[None]
                else:
                    img_shared_dev = jax.device_put(raw[None])
                self._frame_cache_put(fk, {"img_shared_dev": img_shared_dev})
            det_img = img_shared_dev
        else:
            det_img = batch["img"][0]
        depth_u16 = ex.get("depth_u16")
        if depth_u16 is None:
            depth_u16 = (bop_data["depth"] * 1000.0).round().clip(0, 65535).astype(np.uint16)
            self._frame_cache_put(fk, {"depth_u16": depth_u16})
        if getattr(self.args, "zephyr_depth_crop", 0):
            # crop mode: only the (small) detection-region crop ships, once the
            # mask is known (_depth_crop_window); keep the host array
            depth_dev = None
        else:
            # pre-upload the full depth for zephyr scoring: it does not depend
            # on the detection result, so the transfer overlaps detection
            depth_dev = ex.get("depth_dev")
            if depth_dev is None:
                depth_dev = jax.device_put(depth_u16)
                self._frame_cache_put(fk, {"depth_dev": depth_dev})
        return {
            "img": det_img,
            "obj_id": int(batch["obj_id"][0]),
            "limg": batch["limg"][0],
            "lmask": batch["lmask"][0],
            "mask": batch["mask"][0],
            "_img_shared_dev": img_shared_dev,
            "_depth_dev": depth_dev,
            "_depth_u16": depth_u16,
        }

    def _pending_completion_dev(self, pending):
        """Device arrays a deferred frame's completion will fetch (scores,
        refined poses, pp_err), or None when there is nothing to prefetch."""
        if (
            not self._complete_prefetch
            or pending is None
            or pending.get("zhandle") is None
            or "prefetched" in pending
            or "prefetch_fut" in pending
        ):
            return None
        zh = pending["zhandle"]
        pp = pending.get("pp_handle")
        return (zh["dev"], zh.get("refined_dev"), pp[0] if pp is not None else None)

    # -------------------------------------------------------------- run
    def _can_defer_completion(self, n_pending: int = 0) -> bool:
        """A frame's completion (score fetch -> pseudo-label -> finetune gate)
        may be deferred past later frames' dispatches ONLY if it provably
        cannot change the detector weights: finetuning fires when the target
        buffer reaches `next_finetune_number`, and one frame adds at most one
        target — so with `n_pending` completions already in flight, deferring
        one more is safe iff buffer + n_pending + 1 stays below the boundary.
        This keeps the pipeline semantically exact — any frame that could
        finetune is completed synchronously (after draining the in-flight
        completions in order), so the next frame's detection/hypotheses always
        see the post-finetune weights (same sequential semantics as ref
        online_learning.py:470-546)."""
        if not self.pipeline_scoring:
            return False
        if self.args.no_finetune:
            return True
        return len(self.train_dataset) + n_pending + 1 < self.next_finetune_number

    def run(self, progress: bool = True):
        try:
            return self._run(progress)
        finally:
            self.close()

    def _run(self, progress: bool = True):
        from collections import deque

        args = self.args
        test_results = []
        # speculative upcoming-frame detections, keyed by ids, insertion-
        # ordered (dict preserves it): each entry {wv, handle, det_batch,
        # fetched}. handle is the device output dict while unfetched; after
        # the bundle fetch it becomes a future-like (_PartFut, thread mode)
        # or the decoded host dict (inline mode). Up to _fetch_bundle entries
        # are in flight; one bundle RPC fetches all unfetched entries plus
        # the deferred completions (0.5 fetch RPC/frame at bundle=2).
        specs: dict = {}
        # completions deferred past later frames' device dispatches (hides the
        # score-fetch RPC), oldest first; bounded by _pipeline_depth and the
        # finetune boundary (_can_defer_completion)
        pending: deque = deque()

        def complete_pending():
            while pending:
                self._complete_frame(pending.popleft(), test_results, progress)

        it = iter(self.test_loader)
        batch = next(it, None)
        # 2-deep loader lookahead: [0] drives next-frame speculation, [1]
        # drives the IO-thread PNG-decode prefetch
        lookahead = deque()
        iteration = -1
        while batch is not None:
            iteration += 1
            _t_iter0 = time.perf_counter()
            while len(lookahead) < 2:
                b = next(it, None)
                if b is None:
                    break
                lookahead.append(b)
            # queue IO-thread PNG decodes for upcoming frames not yet
            # dispatched: cv2 releases the GIL, so the decode (plus the host
            # packs/uploads of _prefetch_frame) overlaps this frame's
            # detection/PPF stages. Queued up front so a bundle=2 dispatch of
            # frame N+2 later this iteration finds its data (near-)ready.
            for la in lookahead:
                la_ids = (int(la["obj_id"][0]), int(la["scene_id"][0]),
                          int(la["im_id"][0]))
                if la_ids not in self._prefetched and la_ids not in specs:
                    la_ph, la_pw = la["img"].shape[1:3]
                    self._prefetched[la_ids] = self._io_submit(
                        self._prefetch_frame, *la_ids, la_ph, la_pw)
            obj_id = int(batch["obj_id"][0])
            scene_id = int(batch["scene_id"][0])
            im_id = int(batch["im_id"][0])
            ids = (obj_id, scene_id, im_id)
            zr = self.zephyr_results.get(ids)

            with Timer() as t_data:
                bop_data = self.bop_dataset.getDataByIds(obj_id, scene_id, im_id)
            img = bop_data["img"]  # uint8; converted lazily where needed
            depth = bop_data["depth"]
            mat_gt = bop_data["mat_gt"]
            cam_K = np.asarray(bop_data["scene_camera"]["cam_K"])
            model_points = self.model_clouds[obj_id][0]
            is_sym = obj_id in self.bop_dataset.sym_obj_ids
            err_func = add_err if args.fast else (adi_err if is_sym else add_err)

            self.proc_hw = batch["img"].shape[1:3]

            # full schema up front so pipelined and inline frames produce
            # result rows with identical keys (advisor r2 finding)
            times = {"time_ppf": None, "time_sift": None, "time_zephyr": None,
                     "time_icp": None, "time_finetune": 0,
                     "time_data": t_data.interval, "time_mask": 0.0,
                     "time_pperr": 0.0, "time_label": 0.0, "time_iter": 0.0,
                     "time_det_miss": 0.0, "time_det_spec": 0.0,
                     "time_det_fetch": 0.0}

            # ---- DTOID detection ------------------------------------------
            # use the speculative dispatch if it was issued under the current
            # weights (finetuning bumps weights_version and invalidates it,
            # preserving the reference's sequential semantics)
            with Timer() as t:
                if not hasattr(self.model, "detect_async"):
                    # alternative detectors without the speculative API
                    det_batch = self._build_det_batch(batch, bop_data)
                    out = self.model.forward_test_time(det_batch)
                else:
                    _t0 = time.perf_counter()
                    out = out_dev = None
                    wv = self.model.weights_version
                    entry = specs.pop(ids, None)
                    if entry is not None and entry["wv"] == wv:
                        # speculative hit. Thread mode: handle is a fetch-
                        # thread future — the device_get RPC AND the host-side
                        # decode (unpackbits, IoU) ran during an earlier
                        # frame's PPF/dispatch host work, so .result() is
                        # (near-)free. Inline mode: still the device arrays,
                        # fetched below. Bundle=2 adds a third case: the
                        # decoded host dict, fetched two frames ago.
                        STATS.count("spec_hit")
                        det_batch = entry["det_batch"]
                        h = entry["handle"]
                        if not entry["fetched"]:
                            out_dev = h
                        elif hasattr(h, "result"):
                            _tw = time.perf_counter()
                            out = h.result()
                            # time the main thread actually BLOCKED on the
                            # speculative fetch (should be ~0 on a hit; a big
                            # mean here means the fetch thread started late or
                            # the tunnel is degraded)
                            STATS.rpc("spec_wait", time.perf_counter() - _tw)
                        else:
                            out = h
                    else:
                        STATS.count("spec_stale" if entry is not None
                                    else "spec_absent")
                        # the speculative uploads (frame, depth) are weight-
                        # independent: after a finetune invalidates the
                        # speculative DETECTION, reuse its det_batch and only
                        # redispatch the program under the new weights
                        if entry is not None:
                            if hasattr(entry["handle"], "cancel"):
                                # drop the stale fetch if it hasn't started —
                                # its RPC would compete for tunnel bandwidth
                                entry["handle"].cancel()
                            det_batch = entry["det_batch"]
                        else:
                            det_batch = self._build_det_batch(batch, bop_data)
                        out_dev = self.model.detect_async(det_batch)
                    times["time_det_miss"] = time.perf_counter() - _t0

                    # speculatively dispatch upcoming frames' detections
                    # BEFORE fetching this frame's (dispatch-then-fetch keeps
                    # the device busy; the reverse order cascades fetch
                    # waits). With bundle=2 both N+1 and N+2 are kept
                    # dispatched; entries whose weights went stale (finetune)
                    # redispatch here, reusing their uploads.
                    import jax

                    bundle = self._fetch_bundle if self._spec_fetch_thread else 1
                    for la in list(lookahead)[:bundle]:
                        la_ids = (int(la["obj_id"][0]), int(la["scene_id"][0]),
                                  int(la["im_id"][0]))
                        e = specs.get(la_ids)
                        if e is not None and e["wv"] == wv:
                            continue
                        if e is not None:
                            if hasattr(e["handle"], "cancel"):
                                e["handle"].cancel()
                            n_det_batch = e["det_batch"]
                        else:
                            fut = self._prefetched.pop(la_ids, None)
                            n_bop = fut.result() if fut is not None else (
                                self.bop_dataset.getDataByIds(*la_ids))
                            n_det_batch = self._build_det_batch(la, n_bop)
                        n_out = self.model.detect_async(n_det_batch)
                        if not self._spec_fetch_thread:
                            # inline mode (shallow device queues): start the
                            # d2h copy streaming; next frame's fetch is cheap
                            jax.tree_util.tree_map(
                                lambda a: a.copy_to_host_async()
                                if hasattr(a, "copy_to_host_async") else None,
                                n_out,
                            )
                        specs[la_ids] = {"wv": wv, "handle": n_out,
                                         "det_batch": n_det_batch,
                                         "fetched": False}

                    # fetch decision (thread mode): when the NEXT frame's
                    # entry has no fetch in flight, ship ALL unfetched entries
                    # plus the deferred completions as ONE device_get on the
                    # fetch thread — the RPC and the host decode overlap this
                    # frame's PPF + scoring dispatch (+ label render). At
                    # bundle=2 this fires every other frame (0.5 RPC/frame).
                    # If finetuning invalidates the speculation the future is
                    # simply dropped — fetched bytes wasted, semantics
                    # untouched.
                    if self._spec_fetch_thread and lookahead:
                        nb = lookahead[0]
                        n_ids = (int(nb["obj_id"][0]), int(nb["scene_id"][0]),
                                 int(nb["im_id"][0]))
                        ne = specs.get(n_ids)
                        if ne is not None and not ne["fetched"]:
                            to_fetch = [e for e in specs.values()
                                        if not e["fetched"] and e["wv"] == wv]
                            pend = []
                            if self._merged_fetch:
                                for c in pending:
                                    d = self._pending_completion_dev(c)
                                    if d is not None:
                                        pend.append((c, d))
                            fut = self._fetch_submit(
                                self._thread_fetch_multi,
                                tuple((e["handle"], e["det_batch"])
                                      for e in to_fetch),
                                tuple(d for _, d in pend))
                            for j, e in enumerate(to_fetch):
                                e["handle"] = _PartFut(fut, 0, j)
                                e["fetched"] = True
                            for j, (c, _) in enumerate(pend):
                                c["prefetch_fut"] = _PartFut(fut, 1, j)

                    # diagnostic split: speculative-dispatch host cost vs the
                    # fetch wait (device-queue + tunnel time shows up here)
                    times["time_det_spec"] = time.perf_counter() - _t0 - times.get(
                        "time_det_miss", 0.0)
                    _t0 = time.perf_counter()
                    if out is None:
                        pend = [(c, d) for c in pending
                                if (d := self._pending_completion_dev(c)) is not None]
                        if pend:
                            # ONE device_get for this frame's detection AND the
                            # deferred frames' completion outputs: each
                            # separate fetch is a full RPC round trip on the
                            # remote-attached chip
                            fetched_det, pend_fetched = self._timed_get(
                                "det+complete",
                                (out_dev, tuple(d for _, d in pend)))
                            for (c, _), f in zip(pend, pend_fetched):
                                c["prefetched"] = f
                            out = self.model.fetch_detections(
                                out_dev, det_batch, fetched=fetched_det)
                        else:
                            fetched_det = self._timed_get("det_fetch", out_dev)
                            out = self.model.fetch_detections(
                                out_dev, det_batch, fetched=fetched_det)
                    times["time_det_fetch"] = time.perf_counter() - _t0
            time_dtoid = t.interval

            final_bbox = out["final_bbox"][0]
            final_score = out["final_score"][0]
            dtoid_iou = out.get("seg_IoU", 0.0)
            dtoid_pred_mask = out["segmentation"]

            dtoid_confident = bool(final_score[0] > DTOID_CONFIDENT_THRESHOLD)
            if args.ignore_dtoid_mask:
                use_dtoid_mask = False
            elif args.always_dtoid_mask:
                use_dtoid_mask = True
            else:
                use_dtoid_mask = dtoid_confident
            if iteration < args.finetune_warmup:
                use_dtoid_mask = False

            # ---- pose estimation ------------------------------------------
            ctx = {
                "iteration": iteration, "obj_id": obj_id,
                "scene_id": scene_id, "im_id": im_id,
                "depth": depth, "mat_gt": mat_gt, "cam_K": cam_K,
                "model_points": model_points, "err_func": err_func,
                "mask_gt": bop_data["mask_gt"], "mask_gt_visib": bop_data["mask_gt_visib"],
                "times": times, "time_dtoid": time_dtoid,
                "final_bbox": final_bbox, "final_score": final_score,
                "dtoid_iou": dtoid_iou, "dtoid_pred_mask": dtoid_pred_mask,
                "dtoid_confident": dtoid_confident,
                "use_dtoid_mask": use_dtoid_mask,
                "zhandle": None, "zr": zr, "poses": None,
                "pp_err": None, "n_hypos": 0,
                # detection-time device upload, kept for the finetune replay
                "img_dev": det_batch.get("_img_shared_dev"),
            }
            if not use_dtoid_mask:
                if zr is None:
                    raise RuntimeError(
                        f"no precomputed zephyr result for {(obj_id, scene_id, im_id)}"
                    )
                complete_pending()
                times["time_iter"] = time.perf_counter() - _t_iter0
                self._complete_frame(ctx, test_results, progress)
            else:
                with Timer() as t_mask:
                    dist_mask = self._dtoid_mask(batch, out, depth)
                times["time_mask"] = t_mask.interval
                # depth for scoring: detection-time upload (full frame) or a
                # mask-centered crop dispatched NOW so it streams during PPF
                depth_origin = None
                depth_u16 = det_batch.get("_depth_dev")
                host_u16 = det_batch.get("_depth_u16")
                crop_s = int(getattr(args, "zephyr_depth_crop", 0) or 0)
                if crop_s:
                    import jax

                    if host_u16 is None:
                        host_u16 = (depth * 1000.0).round().clip(0, 65535).astype(np.uint16)
                    y0, x0, sh, sw = self._depth_crop_window(dist_mask, depth.shape)
                    depth_u16 = jax.device_put(
                        np.ascontiguousarray(host_u16[y0 : y0 + sh, x0 : x0 + sw])
                    )
                    depth_origin = np.asarray([y0, x0], np.int32)
                elif depth_u16 is None:
                    depth_u16 = host_u16 if host_u16 is not None else (
                        (depth * 1000.0).round().clip(0, 65535).astype(np.uint16)
                    )
                poses = self._generate_hypotheses(
                    obj_id, img, depth, dist_mask, cam_K, bop_data["scene_meta"], mat_gt, times
                )
                if len(poses) == 0:
                    # hypothesis generation failed (e.g. zero PPF matches):
                    # fail closed — fall back to the precomputed zephyr result
                    # if one exists, otherwise report an unconfident identity
                    # so the pseudo-label gate stays shut
                    # (ref online_learning.py:367-378)
                    complete_pending()
                    times["time_iter"] = time.perf_counter() - _t_iter0
                    self._complete_frame(ctx, test_results, progress)
                    batch = lookahead.popleft() if lookahead else None
                    continue
                # reuse the detection-time image upload
                shared = det_batch.get("_img_shared_dev")
                img_u8 = shared[0] if shared is not None else bop_data["img"]
                ctx["zhandle"] = self._score_hypotheses_async(
                    obj_id, img_u8, depth_u16, cam_K, poses, times,
                    depth_origin=depth_origin,
                )
                ctx["poses"] = poses
                # per-hypothesis diagnostics (ref online_learning.py:452 pp_err;
                # n_hypos makes the >=100-hypotheses gate auditable per frame).
                # Computed now — pose-only host work that overlaps the in-flight
                # async score copy.
                ctx["n_hypos"] = len(poses)
                with Timer() as t_pp:
                    pts_dev, pts_q_dev = self._pp_pts(obj_id)
                    ctx["pp_handle"] = pp_err_batch_async(
                        poses, mat_gt, pts_dev,
                        symmetric=err_func is adi_err, pts_q_dev=pts_q_dev,
                    )
                times["time_pperr"] = t_pp.interval
                if self._can_defer_completion(n_pending=len(pending)):
                    # deferred completions run while later frames' scoring
                    # executes on device; only entries older than the pipeline
                    # depth complete now (their bundled fetch resolved frames
                    # ago, so the wait is ~0)
                    while len(pending) >= self._pipeline_depth:
                        self._complete_frame(pending.popleft(), test_results,
                                             progress)
                    pending.append(ctx)
                    if self._spec_fetch_thread and not self._merged_fetch:
                        # r3 behavior (OSSID_MERGED_FETCH=0): hand the
                        # completion fetch to the fetch thread right away as
                        # its own RPC. Default: the arrays ride a later
                        # frame's speculative detection fetch instead — see
                        # _thread_fetch_det_and_pending (one RPC per frame).
                        pend_dev = self._pending_completion_dev(ctx)
                        if pend_dev is not None:
                            ctx["prefetch_fut"] = self._fetch_submit(
                                self._timed_get, "complete_thread", pend_dev)
                else:
                    complete_pending()
                    times["time_iter"] = time.perf_counter() - _t_iter0
                    self._complete_frame(ctx, test_results, progress)
            # dispatch-half wall time of this iteration (completion may land in
            # a later iteration's wall when pipelined)
            times["time_iter"] = time.perf_counter() - _t_iter0
            batch = lookahead.popleft() if lookahead else None
        complete_pending()
        # resolve deferred finetune loss logs (one batched fetch per event;
        # the queued train steps drained behind later frames' programs)
        self.finetune_logs = [
            l.resolve() if isinstance(l, DeferredLogs) else l
            for l in self.finetune_logs
        ]
        return test_results

    def _complete_frame(self, ctx, test_results, progress):
        """Post-scoring half of one frame: score fetch, optional ICP, pseudo-
        label render, self-supervision gate + finetune, result row. Runs either
        inline or one frame late (pipelined) — see _can_defer_completion."""
        _t_complete0 = time.perf_counter()
        args = self.args
        obj_id, scene_id, im_id = ctx["obj_id"], ctx["scene_id"], ctx["im_id"]
        depth, mat_gt, cam_K = ctx["depth"], ctx["mat_gt"], ctx["cam_K"]
        model_points, err_func = ctx["model_points"], ctx["err_func"]
        times, iteration = ctx["times"], ctx["iteration"]

        hypo_scores = None
        pp_handle = ctx.get("pp_handle")
        if ctx["zhandle"] is None:
            if pp_handle is not None:
                # dispatched on device alongside scoring; by completion time
                # the async copy has landed
                ctx["pp_err"] = pp_err_fetch(pp_handle)
            zr = ctx["zr"]
            if zr is None:
                # no hypotheses AND no precomputed result: identity pose with
                # -inf score — the zephyr-confidence gate never opens, so this
                # frame can never poison the finetune buffer
                pred_pose = np.eye(4)
                pred_score = float("-inf")
            else:
                pred_pose = np.asarray(zr["pred_pose"])
                pred_score = zr["score"]
        else:
            import jax

            zh = ctx["zhandle"]
            with Timer() as t:
                # ONE device_get RPC for scores + refined poses + pp_err —
                # each separate fetch is a full ~30 ms round trip on the
                # remote-attached chip, so the completion stage batches all
                # of its pending outputs into a single call. For deferred
                # frames the arrays usually arrived already: merged into the
                # next detection fetch (inline mode) or fetched on the side
                # thread (thread mode) — see _pending_completion_dev.
                fut = ctx.pop("prefetch_fut", None)
                if fut is not None:
                    _tw = time.perf_counter()
                    pre = fut.result()
                    # main-thread block on the prefetched completion (merged
                    # into a spec fetch or fetched on the side thread)
                    STATS.rpc("complete_wait", time.perf_counter() - _tw)
                else:
                    pre = ctx.pop("prefetched", None)
                if pre is not None:
                    fz, fref, fpp = pre
                else:
                    fz, fref, fpp = self._timed_get("complete", (
                        zh["dev"], zh.get("refined_dev"),
                        pp_handle[0] if pp_handle is not None else None,
                    ))
                zout = self._zephyr_for(obj_id).fetch_scores(
                    zh, fetched=fz, refined_fetched=fref)
            times["time_zephyr"] += t.interval
            if pp_handle is not None:
                ctx["pp_err"] = pp_err_fetch(pp_handle, fetched=fpp)
            pred_idx = zout["pred_idx"]
            pred_pose = zout["pred_pose"]
            pred_score = zout["pred_score"]
            hypo_scores = zout["scores"]

            if self.use_icp:
                with Timer() as t:
                    # ICP crop box from host-projected model points under the
                    # picked pose — identical to the device uv map's row for
                    # pred_idx (ref passes uv_original[pred_idx]), but costs
                    # no device fetch RPC and works with need_uv=False scorers
                    cam = model_points @ pred_pose[:3, :3].T + pred_pose[:3, 3]
                    z = np.clip(cam[:, 2], 1e-6, None)
                    uv = np.stack(
                        [cam_K[0, 0] * cam[:, 0] / z + cam_K[0, 2],
                         cam_K[1, 1] * cam[:, 1] / z + cam_K[1, 2]], axis=1,
                    ).round().astype(int)
                    pred_pose, _ = icp_refinement(
                        depth, uv, pred_pose, cam_K, model_points, icp_max_dist=0.01
                    )
                times["time_icp"] = t.interval

        pred_err = err_func(
            pred_pose[:3, :3], pred_pose[:3, 3], mat_gt[:3, :3], mat_gt[:3, 3], model_points
        )

        # ---- pseudo-label mask ----------------------------------------
        with Timer() as t_label:
            pred_depth = self._render_pred(obj_id, cam_K, pred_pose, depth.shape)
            pred_mask = pred_depth > 0
            gt_mask = np.asarray(ctx["mask_gt"]) > 0
            gt_mask_visib = np.asarray(ctx["mask_gt_visib"]) > 0
            pred_mask_visib = estimate_visib_mask_gt(depth, pred_depth, 15 / 1000.0)
        times["time_label"] = t_label.interval

        # ---- self-supervision gate + finetune -------------------------
        z_th = getattr(args, "zephyr_confident_threshold", ZEPHYR_CONFIDENT_THRESHOLD)
        zephyr_confident = True if args.use_oracle_gt else pred_score > z_th
        finetune = False
        if not args.no_finetune and zephyr_confident:
            self.train_dataset.addTarget(obj_id, scene_id, im_id)
            label_mask = gt_mask_visib if args.use_oracle_gt else pred_mask_visib
            self.train_dataset.updateZephyrMask(obj_id, scene_id, im_id, label_mask, pred_score)
            if self.replay is not None:
                self.replay.add(
                    (obj_id, scene_id, im_id), ctx.get("img_dev"), label_mask, mat_gt
                )
            if len(self.train_dataset) == self.next_finetune_number:
                finetune = True
                if args.finetune_reset:
                    self.model.load_state_dict(self.initial_state_dict)
                    self.model.reset_optimizer()
                with Timer() as t:
                    logs = finetune_dtoid(
                        self.model, self.train_dataset,
                        epochs=args.finetune_epochs, batch_size=args.finetune_batch_size,
                        replay=self.replay, defer_fetch=True,
                    )
                times["time_finetune"] = t.interval
                self.finetune_logs.append(logs)
                if args.save_each:
                    self._save_each_ckpt(iteration)
                if args.non_cum:
                    self.train_dataset.clearTargets()
                    self.next_finetune_number = args.finetune_interval
                else:
                    self.next_finetune_number += args.finetune_interval

        iou = np.logical_and(pred_mask, gt_mask).sum() / max(np.logical_or(pred_mask, gt_mask).sum(), 1)
        iou_visib = np.logical_and(pred_mask_visib, gt_mask_visib).sum() / max(
            np.logical_or(pred_mask_visib, gt_mask_visib).sum(), 1
        )

        result = {
            "obj_id": obj_id, "scene_id": scene_id, "im_id": im_id,
            "dtoid_confident": ctx["dtoid_confident"],
            "zephyr_confident": bool(zephyr_confident),
            "use_dtoid_mask": bool(ctx["use_dtoid_mask"]),
            "finetune": finetune,
            "dtoid_iou": float(ctx["dtoid_iou"]),
            "dtoid_pred_mask": ctx["dtoid_pred_mask"],
            "dtoid_bbox": ctx["final_bbox"],
            "dtoid_score": ctx["final_score"],
            "pred_pose": pred_pose,
            "pred_score": float(pred_score),
            "pred_err": float(pred_err),
            "pred_add01d": float(pred_err < 0.1 * self.diameters[obj_id]),
            "pred_mask": pred_mask,
            "pred_mask_visib": pred_mask_visib,
            "pred_iou": float(iou),
            "pred_iou_visib": float(iou_visib),
            "n_hypos": int(ctx["n_hypos"]),
            "pp_err": ctx["pp_err"],
            "hypo_scores": hypo_scores,
            "time_dtoid": ctx["time_dtoid"],
            **times,
        }
        # completion-half wall (score fetch -> row); the untimed remainder vs
        # the named stages is host python (gate bookkeeping, mask IoUs)
        result["time_complete"] = time.perf_counter() - _t_complete0
        test_results.append(result)
        if progress and (iteration % 10 == 0):
            print(
                f"[{iteration + 1}/{len(self.test_loader)}] obj {obj_id} "
                f"score {pred_score:.2f} add01d {result['pred_add01d']:.0f} "
                f"dtoid {ctx['time_dtoid'] * 1000:.0f}ms",
                flush=True,
            )


def _maskrcnn_feed(batch, n_classes: int):
    """Adapt a DtoidBopDataset batch to the class-conditional detector's train
    feed (the reference special-cases MaskRCNN in finetuneDtoid,
    ref online_learning.py:663-666): class index = obj_id - 1, per-class masks.

    Each row annotates ONE object, but the frame may contain objects of other
    classes without labels — cls_valid marks only the labeled class per row,
    so the unlabeled classes contribute no loss (training them as background
    collapsed the pretrained detector, IoU 0.78 -> 0.11 on the hard world)."""
    b, h, w, _ = batch["mask"].shape
    masks = np.zeros((b, h, w, n_classes), np.float32)
    cls_valid = np.zeros((b, n_classes), np.float32)
    bbox = np.asarray(batch["bbox_gt"], np.float32).copy()
    for i in range(b):
        cls = int(batch["obj_id"][i]) - 1
        masks[..., cls][i] = batch["mask"][i, ..., 0]
        cls_valid[i, cls] = 1.0
        valid = bbox[i, :, 4] >= 0
        bbox[i, valid, 4] = cls
    return {"img": batch["img"], "bbox_gt": bbox, "masks": masks,
            "cls_valid": cls_valid}


def _collect_loss_logs(loss_per_epoch: list) -> list:
    """[[loss, ...], ...] (device scalars or floats) -> reference-schema logs,
    fetching ALL device scalars in one transfer (each float() of a device
    scalar is a ~30 ms RPC on a remote-attached chip)."""
    flat = [l for ep in loss_per_epoch for l in ep]
    if flat and not isinstance(flat[0], float):
        import jax
        import jax.numpy as jnp

        flat = [float(v) for v in np.asarray(jax.device_get(jnp.stack(flat)))]
    it = iter(flat)
    return [[{"train_loss": next(it)} for _ in ep] for ep in loss_per_epoch]


class DeferredLogs:
    """Finetune loss logs whose device scalars have not been fetched yet.

    The losses are observability only — the weight updates are already on
    device — so the finetune event does not need to BLOCK until every train
    step finishes; fetching here would serialize ~0.5-1 s of queued device
    steps into the event wall. The loop resolves these at the end of the run
    (one batched transfer), after the steps have long since drained behind
    subsequent frames' programs."""

    def __init__(self, loss_per_epoch):
        self._raw = loss_per_epoch
        self._resolved = None

    def resolve(self) -> list:
        if self._resolved is None:
            self._resolved = _collect_loss_logs(self._raw)
            self._raw = None
        return self._resolved


def _finetune_replay(model, train_dataset, replay, epochs: int, batch_size: int):
    """Device-feed finetune pass: frames come from the detection-time HBM
    uploads held by the replay buffer (uint8 + bit-packed pseudo-masks), only
    templates/heatmaps/bboxes ship from the host — ~1 MB/batch instead of the
    ~43 MB/batch full-res f32 feed, which is the difference between a ~6 s and
    a ~1 s finetune event over the bandwidth-capped link. Feeds are bit-exact
    vs the host path (see replay.py). Returns None when not applicable
    (uncovered targets, resolution mismatch, non-u8 frames) — the caller then
    runs the classic host-loader pass."""
    targets = train_dataset.bop_dataset.targets
    if not hasattr(model, "train_step_u8_async") or not replay.covers(targets):
        return None
    import jax
    import jax.numpy as jnp

    img_h, img_w = model.img_size
    keys = [(int(t["obj_id"]), int(t["scene_id"]), int(t["im_id"])) for t in targets]
    if any(replay.bits(k).shape[1] * 8 != img_h * img_w for k in keys):
        return None  # pseudo-labels not at the model's native resolution

    # pre-flight host frames for buffer misses (validated BEFORE any step runs
    # so a fallback never double-trains)
    host_frames: dict = {}
    for k in keys:
        if replay.frame(k) is None:
            raw = np.asarray(train_dataset.bop_dataset.getDataByIds(*k)["img"])
            if raw.shape[:2] != (img_h, img_w) or raw.dtype != np.uint8:
                return None
            host_frames[k] = raw[None]

    rng = np.random.default_rng(len(keys))
    loss_per_epoch = []
    for _ in range(epochs):
        order = rng.permutation(len(keys))
        epoch_losses = []
        for i0 in range(0, len(order), batch_size):
            sel = order[i0 : i0 + batch_size]
            if len(sel) < batch_size:  # pad by repetition to the compiled shape
                sel = np.resize(sel, batch_size)
            bkeys = [keys[j] for j in sel]
            frames = [
                replay.frame(k) if replay.frame(k) is not None else host_frames[k]
                for k in bkeys
            ]
            feed = {
                "img_u8": jnp.concatenate([jnp.asarray(f) for f in frames], axis=0),
                # bits live host-side (replay.add stays off the device); one
                # ~B*38 KB upload per batch instead of one RPC per frame
                "mask_bits": np.concatenate([replay.bits(k) for k in bkeys], axis=0),
            }
            anns = [
                train_dataset.replay_annotations(
                    k[0], replay.mat_gt(k),
                    train_dataset.zephyr_results[k]["pred_mask_visib"],
                )
                for k in bkeys
            ]
            for f in ("limg_u8", "lmask_u8", "gimg_u8", "gmask_u8", "bbox_gt", "heatmap"):
                feed[f] = np.stack([a[f] for a in anns])
            epoch_losses.append(model.train_step_u8_async(feed)["loss"])
        loss_per_epoch.append(epoch_losses)
    model.clear_cache()  # template features are stale after weight updates
    replay.n_replay_events += 1
    return DeferredLogs(loss_per_epoch)


def finetune_dtoid(model, train_dataset, epochs: int = 1, batch_size: int = 8,
                   replay=None, defer_fetch: bool = False):
    """Online finetuning pass (ref online_learning.py:650-679): iterate the
    pseudo-labeled buffer, one fused jitted train step per batch. The batch is
    padded to `batch_size` so the step never retraces. Works for both the
    DTOID model and the class-conditional alternative detector. With a
    DeviceReplayBuffer, frames train straight from their detection-time HBM
    uploads (_finetune_replay above). defer_fetch=True returns DeferredLogs
    (loss scalars still on device) so the event does not block on the queued
    train steps; the loop resolves them at run end."""
    logs = _finetune_inner(model, train_dataset, epochs, batch_size, replay)
    return logs if defer_fetch else logs.resolve()


def _finetune_inner(model, train_dataset, epochs, batch_size, replay):
    if replay is not None:
        logs = _finetune_replay(model, train_dataset, replay, epochs, batch_size)
        if logs is not None:
            return logs
    # prefetch=2: the loader thread decodes/preprocesses the next batch while
    # the compiled train step runs on device (one host core — overlap is the
    # only way to hide the per-sample host work)
    loader = NumpyLoader(train_dataset, batch_size=batch_size, shuffle=True,
                         seed=len(train_dataset), prefetch=2)
    has_async = hasattr(model, "train_step_async")
    loss_per_epoch = []
    for _ in range(epochs):
        epoch_losses = []
        for batch in loader:
            b = len(batch["img"])
            if b < batch_size:  # pad by repetition to the compiled shape
                idx = np.resize(np.arange(b), batch_size)
                batch = {
                    k: v[idx] if isinstance(v, np.ndarray) and len(v) == b else v
                    for k, v in batch.items()
                }
            if hasattr(model, "n_classes"):  # class-conditional detector path
                feed = _maskrcnn_feed(batch, model.n_classes)
            else:
                feed = {
                    "img": batch["img"], "limg": batch["limg"], "lmask": batch["lmask"],
                    "gimg": batch["gimg"], "gmask": batch["gmask"],
                    "bbox_gt": batch["bbox_gt"], "heatmap": batch["heatmap"],
                    "mask": batch["mask"],
                }
            if has_async:
                epoch_losses.append(model.train_step_async(feed)["loss"])
            else:
                epoch_losses.append(float(model.train_step(feed)["loss"]))
        loss_per_epoch.append(epoch_losses)
    model.clear_cache()  # template features are stale after weight updates
    return DeferredLogs(loss_per_epoch)


def test_dtoid_model(model, test_loader, bop_dataset=None):
    """Detection-only evaluation pass (`--raw_dtoid`, ref online_learning.py:620-648)."""
    test_results = []
    for batch in test_loader:
        obj_id = int(batch["obj_id"][0])
        det_batch = {
            "img": batch["img"][0], "obj_id": obj_id,
            "limg": batch["limg"][0], "lmask": batch["lmask"][0],
            "mask": batch["mask"][0],
        }
        out = model.forward_test_time(det_batch)
        test_results.append(
            {
                "obj_id": obj_id,
                "scene_id": int(batch["scene_id"][0]),
                "im_id": int(batch["im_id"][0]),
                "dtoid_bbox": out["final_bbox"][0],
                "dtoid_score": out["final_score"][0],
                "dtoid_iou": float(out.get("seg_IoU", 0.0)),
                "dtoid_pred_mask": out["segmentation"],
                "gt_bbox": np.asarray(batch["bbox_gt"][0, 0, :4]),
            }
        )
    return test_results
