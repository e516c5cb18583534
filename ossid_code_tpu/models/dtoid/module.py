"""DtoidModel: the host-side model wrapper (counterpart of the reference's
`DtoidNet` LightningModule, ref models/dtoid/__init__.py:23-402) built around
jit-compiled pure functions:

  * one fused train/finetune step (forward + losses + Adam-amsgrad update +
    BatchNorm running-stat update) compiled once and reused across every online
    finetune round — the reference re-enters eager torch per step;
  * an all-templates inference function with fixed shapes (T templates,
    top-1000 pre-NMS, top-500 post-NMS) compiled once per (T, H, W);
  * a per-object template feature cache that stays ON DEVICE, fixing the
    reference's CPU<->GPU cache ping-pong (ref models/dtoid/__init__.py:107-115).
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ossid_code_tpu.models.dtoid.network import DtoidNetwork, imagenet_normalize
from ossid_code_tpu.models.dtoid.anchors import generate_anchor_grid
from ossid_code_tpu.models.dtoid.losses import dtoid_losses


def make_optimizer(learning_rate: float = 1e-4, weight_decay: float = 1e-6):
    """Adam with amsgrad + coupled L2, matching torch.optim.Adam(amsgrad=True,
    weight_decay=...) as used for both offline and online finetuning
    (ref models/dtoid/__init__.py:251-257, scripts/online_learning.py:258-263)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.amsgrad(learning_rate),
    )


class DtoidModel:
    """Stateful wrapper: parameters + batch stats + optimizer state + template
    cache, with jitted compute."""

    def __init__(self, cfg, seed: int = 42):
        self.cfg = cfg
        m = cfg.model
        self.img_size = (int(m.img_h), int(m.img_w))
        self.feat_size = (int(m.img_h) // 16 - 1, int(m.img_w) // 16 - 1)
        self.template_size = int(m.get("template_size", 124))
        self.net = DtoidNetwork(
            img_size=self.img_size,
            densenet_blocks=tuple(m.get("densenet_blocks", (12, 24, 16))),
        )
        self.anchors = jnp.asarray(generate_anchor_grid(*self.feat_size))

        rng = jax.random.PRNGKey(seed)
        h, w = self.img_size
        ts = self.template_size
        # jit the init: eager init dispatches each op individually, which is
        # pathological over the remote-TPU tunnel (~1ms+ per dispatch)
        variables = jax.jit(
            lambda r, im, li, lm, gi, gm: self.net.init(r, im, li, lm, gi, gm, train=False)
        )(
            rng,
            jnp.zeros((1, h, w, 3)),
            jnp.zeros((1, ts, ts, 3)),
            jnp.zeros((1, ts, ts, 1)),
            jnp.zeros((1, ts, ts, 3)),
            jnp.zeros((1, ts, ts, 1)),
        )
        self.params = variables["params"]
        self.batch_stats = variables["batch_stats"]

        self.tx = make_optimizer(m.learning_rate, m.weight_decay)
        self.opt_state = self.tx.init(self.params)

        # per-object template feature cache, device-resident
        self.template_feature_cache: dict[Any, tuple] = {}
        # bumped on every weight change; used to invalidate speculative
        # detections issued under older weights
        self.weights_version = 0

        self._build_jits()

    # ------------------------------------------------------------------ jits
    def _build_jits(self):
        net, tx, anchors = self.net, self.tx, self.anchors
        m = self.cfg.model
        img_h, img_w = self.img_size
        import os as _os1

        # opt-in half-resolution seg supervision for the train/finetune step
        # (cfg model.seg_loss_half or OSSID_SEG_HALF=1): the decoder's two
        # full-res stages dominate the step's HBM traffic; the BCE target
        # becomes the exact 2x2 mean of the mask. Inference is unaffected.
        seg_half = bool(m.get("seg_loss_half", False)) or (
            _os1.environ.get("OSSID_SEG_HALF") == "1")

        @jax.jit
        def train_step(params, batch_stats, opt_state, batch):
            def loss_fn(p):
                out, mutated = net.apply(
                    {"params": p, "batch_stats": batch_stats},
                    batch["img"], batch["limg"], batch["lmask"],
                    batch["gimg"], batch["gmask"],
                    train=True, seg_half=seg_half,
                    mutable=["batch_stats"],
                )
                loss, metrics = dtoid_losses(
                    out, batch, anchors,
                    lam_seg=m.lam_seg, lam_center=m.lam_center,
                    lam_cls=m.lam_cls, lam_reg=m.lam_reg,
                )
                return loss, (metrics, mutated["batch_stats"])

            grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(params)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_stats, new_opt_state, metrics

        @jax.jit
        def train_step_mp(params, batch_stats, opt_state, batch):
            """Mixed-precision finetune step (opt-in: cfg model.bf16_finetune
            or OSSID_BF16_FINETUNE=1): forward/backward in bfloat16 with f32
            master weights and f32 loss/optimizer math — the standard TPU
            training recipe (bf16 keeps f32's exponent range, so no loss
            scaling). Roughly halves the step's HBM traffic and MXU time.
            Numerics differ from the f32 step at bf16 rounding level, so it is
            NOT used where reference-exact training parity is asserted."""
            def _cast_floats(t, dt):
                # leaves may include python ints (static shapes/counts in the
                # output dict) — only floating ARRAY leaves are cast
                return jax.tree_util.tree_map(
                    lambda a: a.astype(dt)
                    if (hasattr(a, "dtype")
                        and jnp.issubdtype(a.dtype, jnp.floating)) else a, t)

            def bcast(t):
                return _cast_floats(t, jnp.bfloat16)

            def fcast(t):
                return _cast_floats(t, jnp.float32)

            def loss_fn(p):
                out, mutated = net.apply(
                    {"params": bcast(p), "batch_stats": bcast(batch_stats)},
                    *(batch[k].astype(jnp.bfloat16)
                      for k in ("img", "limg", "lmask", "gimg", "gmask")),
                    train=True, seg_half=seg_half,
                    mutable=["batch_stats"],
                )
                # losses in f32: anchor matching/log-terms are precision-
                # sensitive; the cast is free next to the conv backward
                loss, metrics = dtoid_losses(
                    fcast(out), batch, anchors,
                    lam_seg=m.lam_seg, lam_center=m.lam_center,
                    lam_cls=m.lam_cls, lam_reg=m.lam_reg,
                )
                return loss, (metrics, fcast(mutated["batch_stats"]))

            grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(params)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_stats, new_opt_state, metrics

        import os as _os0

        bf16_ft = bool(m.get("bf16_finetune", False)) or (
            _os0.environ.get("OSSID_BF16_FINETUNE") == "1")
        step_impl = train_step_mp if bf16_ft else train_step

        @jax.jit
        def train_step_u8(params, batch_stats, opt_state, batch):
            """train_step over wire/HBM-compact inputs: uint8 images and a
            bit-packed segmentation mask, expanded in-graph. Feeding u8/255
            reproduces the host path's `process_data` output exactly at native
            resolution, so losses/updates match the f32 feed. Used by the
            device-resident finetune replay buffer (the f32 full-res batch is
            ~43 MB over the bandwidth-capped link; this feed is ~0.4 MB)."""
            img = batch["img_u8"].astype(jnp.float32) / 255.0
            b = img.shape[0]
            bits = batch["mask_bits"]  # (B, H*W//8) uint8, little-endian bits
            shifts = jnp.arange(8, dtype=jnp.uint8)
            mask = ((bits[..., None] >> shifts) & jnp.uint8(1)).astype(jnp.float32)
            mask = mask.reshape(b, img_h, img_w, 1)
            dense = {
                "img": img,
                "limg": batch["limg_u8"].astype(jnp.float32) / 255.0,
                "lmask": batch["lmask_u8"].astype(jnp.float32),
                "gimg": batch["gimg_u8"].astype(jnp.float32) / 255.0,
                "gmask": batch["gmask_u8"].astype(jnp.float32),
                "bbox_gt": batch["bbox_gt"],
                "heatmap": batch["heatmap"],
                "mask": mask,
            }
            return step_impl(params, batch_stats, opt_state, dense)

        @jax.jit
        def eval_forward(params, batch_stats, batch):
            out = net.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["img"], batch["limg"], batch["lmask"],
                batch["gimg"], batch["gmask"],
                train=False,
            )
            loss, metrics = dtoid_losses(
                out, batch, anchors,
                lam_seg=m.lam_seg, lam_center=m.lam_center,
                lam_cls=m.lam_cls, lam_reg=m.lam_reg,
            )
            out["metrics"] = metrics
            return out

        @jax.jit
        def template_features(params, batch_stats, limg, lmask):
            """limg (T, h, w, 3) in [0,1]; lmask (T, h, w, 1). Global feature
            comes from the first local template (ref models/dtoid/__init__.py:88)."""
            t4 = jnp.concatenate([imagenet_normalize(limg), lmask], axis=-1)
            v = {"params": params, "batch_stats": batch_stats}
            local = net.apply(v, t4, train=False, method=DtoidNetwork.compute_template_local)
            glob = net.apply(v, t4[0:1], train=False, method=DtoidNetwork.compute_template_global)
            return local, glob

        pack_seg = str(m.get("seg_transfer", "packed")) == "packed"
        # single-buffer detection transport (network.py::detect pack_all):
        # the axon tunnel charges ~2-3 ms per fetched buffer on top of the
        # round trip, so shipping the six detect outputs as ONE uint8 vector
        # cuts the per-frame bundle RPC. cfg model.packed_fetch or env
        # OSSID_PACKED_FETCH=0 reverts to the multi-buffer dict.
        pack_all = (
            _os1.environ.get(
                "OSSID_PACKED_FETCH", "1" if m.get("packed_fetch", True) else "0"
            ) == "1"
        )
        # opt-in bf16 inference: halves the trunk's HBM traffic (the usual TPU
        # bottleneck); ranking/box decode stay f32 inside detect. cfg
        # model.bf16_infer or env OSSID_BF16_INFER=1.
        import os as _os

        bf16 = bool(m.get("bf16_infer", False)) or _os.environ.get("OSSID_BF16_INFER") == "1"
        compute_dtype = jnp.bfloat16 if bf16 else jnp.float32

        def _cast(tree):
            if not bf16:
                return tree
            return jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                tree,
            )

        @functools.partial(jax.jit, static_argnames=("topk",))
        def infer(params, batch_stats, image_u8, local_feats, global_feat, topk=500):
            # params arrive ALREADY in compute dtype (_infer_vars casts once
            # per weight change, not once per frame — an in-graph cast of the
            # whole trunk measurably slowed the loop down)
            v = {"params": params, "batch_stats": batch_stats}
            return net.apply(
                v, image_u8, _cast(local_feats), _cast(global_feat), anchors,
                pre_nms_topk=int(m.get("topk_pre_nms", 1000)),
                topk=topk, nms_iou=float(m.nms_iou_thresh),
                pack_seg=pack_seg, compute_dtype=compute_dtype,
                pack_all=pack_all,
                method=DtoidNetwork.detect,
            )

        self._train_step = step_impl
        self._train_step_u8 = train_step_u8
        self._pack_seg = pack_seg
        self._eval_forward = eval_forward
        self._template_features = template_features
        self._infer = infer
        self._bf16_infer = bf16
        self._cast_tree = jax.jit(_cast) if bf16 else None
        self._bf16_cache = None  # (weights_version, params, batch_stats)

    # ------------------------------------------------------------- training
    def train_step(self, batch: dict) -> dict:
        """One fused finetune step on a device batch. Returns metric scalars."""
        return {k: float(v) for k, v in self.train_step_async(batch).items()}

    def train_step_async(self, batch: dict) -> dict:
        """train_step without the per-step metric fetch: returns DEVICE metric
        scalars. On a remote-attached chip each scalar fetch is a ~30 ms RPC,
        so the online finetune pass collects these handles and fetches once
        per event (loop/online_learning.py::finetune_dtoid)."""
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        self.params, self.batch_stats, self.opt_state, metrics = self._train_step(
            self.params, self.batch_stats, self.opt_state, batch
        )
        self.weights_version += 1
        return metrics

    def train_step_u8_async(self, batch: dict) -> dict:
        """Replay-buffer finetune step: uint8 images + bit-packed mask, all of
        which may already live on device (loop/replay.py). Returns device
        metric scalars like train_step_async."""
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        self.params, self.batch_stats, self.opt_state, metrics = self._train_step_u8(
            self.params, self.batch_stats, self.opt_state, batch
        )
        self.weights_version += 1
        return metrics

    def reset_optimizer(self):
        """Fresh optimizer state without retracing (ref online_learning.py:520-528)."""
        self.opt_state = self.tx.init(self.params)

    def state_dict(self):
        return {
            "params": jax.device_get(self.params),
            "batch_stats": jax.device_get(self.batch_stats),
        }

    def load_state_dict(self, sd):
        self.params = jax.device_put(sd["params"])
        self.batch_stats = jax.device_put(sd["batch_stats"])
        self.weights_version += 1
        self.clear_cache()

    # ------------------------------------------------------------ inference
    def clear_cache(self):
        self.template_feature_cache = {}

    def get_template_features(self, obj_id, limg: np.ndarray, lmask: np.ndarray):
        """Cache-or-compute device template features for one object.

        limg (T, h, w, 3) float [0,1]; lmask (T, h, w) or (T, h, w, 1)."""
        if obj_id not in self.template_feature_cache:
            if lmask.ndim == 3:
                lmask = lmask[..., None]
            local, glob = self._template_features(
                self.params, self.batch_stats, jnp.asarray(limg), jnp.asarray(lmask)
            )
            self.template_feature_cache[obj_id] = (local, glob)
        return self.template_feature_cache[obj_id]

    def detect_async(self, batch: dict, topk: int = 500):
        """Dispatch detection without waiting: returns the dict of device
        arrays. Dispatches are asynchronous, so the caller can overlap host
        work (hypothesis generation, IO) or speculatively start the next
        frame before fetching."""
        img = batch["img"]
        if isinstance(img, np.ndarray) or not hasattr(img, "devices"):
            img = np.asarray(img)
            if img.ndim == 3:
                img = img[None]
            assert img.shape[0] == 1
            if img.dtype != np.uint8:
                img = (np.clip(img, 0.0, 1.0) * 255.0).round().astype(np.uint8)
            img = jnp.asarray(img)
        elif img.ndim == 3:
            img = img[None]

        obj_id = batch["obj_id"]
        if hasattr(obj_id, "__len__"):
            obj_id = int(np.asarray(obj_id).reshape(-1)[0])
        local, glob = self.get_template_features(obj_id, batch["limg"], batch["lmask"])
        params, stats = self._infer_vars()
        return self._infer(params, stats, img, local, glob, topk=topk)

    def _infer_vars(self):
        """Inference-dtype weights: identity in f32 mode; in bf16 mode a
        device-resident cast refreshed only when the weights change."""
        if not self._bf16_infer:
            return self.params, self.batch_stats
        if self._bf16_cache is None or self._bf16_cache[0] != self.weights_version:
            self._bf16_cache = (
                self.weights_version,
                self._cast_tree(self.params),
                self._cast_tree(self.batch_stats),
            )
        return self._bf16_cache[1], self._bf16_cache[2]

    def _unpack_detections(self, buf: np.ndarray) -> dict:
        """Re-slice the single-buffer detect transport back into the output
        dict. The field order/dtypes come from the SAME detect_pack_layout the
        in-graph pack uses (network.py); k is recovered from the buffer length
        (25 bytes per detection). Arrays are copied out of the buffer view, so
        packed and multi-buffer modes return equally writable arrays
        (ADVICE r4)."""
        from ossid_code_tpu.models.dtoid.network import detect_pack_layout

        fh, fw = self.feat_size
        h, w = self.img_size
        fixed = 4 * fh * fw + (h * (w // 8) if self._pack_seg else h * w)
        k, rem = divmod(len(buf) - fixed, 25)
        if rem != 0 or k < 0:
            raise ValueError(
                f"packed detection buffer malformed: {len(buf)} bytes does not "
                f"fit 25*k + {fixed} (pack_seg={self._pack_seg}, "
                f"img {h}x{w}, feat {fh}x{fw})")
        raw = buf.tobytes()
        off = 0
        out = {}
        for key, dt, shape in detect_pack_layout(k, fh, fw, h, w, self._pack_seg):
            a = np.frombuffer(raw, dtype=dt, count=int(np.prod(shape)), offset=off)
            off += a.nbytes
            out[key] = a.reshape(shape).copy()
        out["valid"] = out["valid"].astype(bool)
        return out

    def fetch_detections(self, out_dev, batch: dict | None = None,
                         fetched: dict | None = None) -> dict:
        """Fetch a detect_async result (one batched host transfer) and build
        the reference-schema output dict. `fetched` injects host arrays that
        were already transferred (the loop merges this fetch with a deferred
        frame's completion fetch into ONE device_get — each separate RPC is a
        full round trip on a remote-attached chip)."""
        out = dict(fetched) if fetched is not None else jax.device_get(out_dev)
        if "packed" in out:
            out = self._unpack_detections(out["packed"])
        if "seg_packed" in out:
            packed = out.pop("seg_packed")
            bits = np.unpackbits(packed[..., None], axis=-1, bitorder="little")
            out["segmentation"] = bits.reshape(packed.shape[0], -1).astype(np.float32)
        else:
            out["segmentation"] = out.pop("seg_u8").astype(np.float32) / 255.0

        result = {
            "pred_bbox": out["pred_bbox"],
            "pred_scores": out["pred_scores"],
            "pred_template_ids": out["pred_template_ids"],
            "valid": out["valid"],
            "segmentation": out["segmentation"],
            "heat_map": out["heat_map"],
            # reference-compatible aliases (ref models/dtoid/__init__.py:152-160)
            "final_bbox": [out["pred_bbox"]],
            "final_score": [out["pred_scores"]],
        }

        if batch is not None and batch.get("mask") is not None:
            gt = np.asarray(batch["mask"]).squeeze() > 0.5
            pred = out["segmentation"] > 0.5
            union = np.logical_or(pred, gt).sum()
            iou = float(np.logical_and(pred, gt).sum() / union) if union > 0 else 1.0
            result["seg_IoU"] = iou
            result["seg_IoU_50"] = float(iou > 0.5)
        return result

    def forward_test_time(self, batch: dict, topk: int = 500) -> dict:
        """Zero-shot detection on one frame (ref models/dtoid/__init__.py:61-171).

        batch: 'img' (H, W, 3) or (1, H, W, 3) float [0,1] or uint8 (numpy or
        device array); 'obj_id'; 'limg' (T, h, w, 3); 'lmask' (T, h, w[, 1]);
        optional 'mask' (H, W[, 1]) GT for the seg_IoU metric; optional
        'template_z_values' for z-filtering.
        """
        out = self.fetch_detections(self.detect_async(batch, topk=topk), batch)
        if self.cfg.model.get("filter_z") and batch.get("template_z_values") is not None:
            out = self._filter_z(out, np.asarray(batch["template_z_values"]).reshape(-1))
        return out

    def _filter_z(self, out: dict, template_z_values: np.ndarray) -> dict:
        """Reject detections whose implied object distance is implausible
        (ref models/dtoid/__init__.py:125-146): the 124px template at distance
        |z_t| scales to the predicted box's max dimension, implying
        z = 124 / max_dim * -z_t; keep 0.4 m < z < 2 m."""
        boxes = out["pred_bbox"]
        tids = out["pred_template_ids"].astype(int)
        zt = template_z_values[tids]
        max_dim = np.maximum(boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1])
        pred_z = (124.0 / np.clip(max_dim, 1e-6, None)) * -zt
        cond = (pred_z > 0.4) & (pred_z < 2.0) & out["valid"]
        ids = np.nonzero(cond)[0]
        if len(ids) == 0:
            ids = np.asarray([0])
        for k in ("pred_bbox", "pred_scores", "pred_template_ids", "valid"):
            out[k] = out[k][ids]
        out["final_bbox"] = [out["pred_bbox"]]
        out["final_score"] = [out["pred_scores"]]
        return out
