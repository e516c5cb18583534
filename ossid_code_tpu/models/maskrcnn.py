"""Class-conditional instance detector — the `--use_maskrcnn` alternative
detector path (ref models/maskrcnn.py:4-175, which wraps an external
PyTorch-Simple-MaskRCNN checkout via a sys.path hack).

TPU-native design note: Mask R-CNN's two-stage RoIAlign pipeline is built
around dynamic per-image proposal counts — hostile to XLA's static shapes.
This replacement keeps the exact serving interface (per-class detections
filtered to a target object id, full-image mask, seg_IoU metrics) but is a
single-stage anchor-based detector: the DenseNet trunk shared with DTOID,
RetinaNet-style class/box heads over n_classes, and a per-class segmentation
decoder — one fixed-shape jitted program end-to-end.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from ossid_code_tpu.models.backbones.densenet import DenseNetStem, DenseNetEarly, DenseNetLate
from ossid_code_tpu.models.dtoid.network import (
    ClassificationHead, RegressionHead, decode_boxes, clip_boxes, imagenet_normalize,
)
from ossid_code_tpu.models.dtoid.anchors import generate_anchor_grid
from ossid_code_tpu.models.dtoid.losses import detection_loss
from ossid_code_tpu.ops.resize import upsample_nearest, resize_nearest
from ossid_code_tpu.ops.nms import nms_topk


class MaskRCNNNetwork(nn.Module):
    n_classes: int  # foreground classes; class index c in [0, n_classes)
    img_size: tuple = (480, 640)

    @nn.compact
    def __call__(self, image, train: bool = False):
        """image (B, H, W, 3) in [0,1] -> cls (B, N, C), reg (B, N, 4),
        seg logits (B, H, W, C)."""
        x = imagenet_normalize(image)
        x = DenseNetStem(name="stem")(x)
        x = DenseNetEarly(name="early")(x, train)
        feat = DenseNetLate(name="late")(x, train)  # (B, h, w, 1024)
        neck = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="neck_bn")(
            nn.elu(nn.Conv(512, (1, 1), name="neck")(feat))
        )
        cls = ClassificationHead(num_classes=self.n_classes, name="classification")(neck)
        reg = RegressionHead(name="regression")(neck)

        ra = not train
        s = upsample_nearest(nn.BatchNorm(use_running_average=ra, momentum=0.9, name="ns1")(
            nn.elu(nn.Conv(256, (3, 3), padding=1, name="s1")(neck))), 2)
        s = upsample_nearest(nn.BatchNorm(use_running_average=ra, momentum=0.9, name="ns2")(
            nn.elu(nn.Conv(128, (3, 3), padding=1, name="s2")(s))), 2)
        s = resize_nearest(nn.BatchNorm(use_running_average=ra, momentum=0.9, name="ns3")(
            nn.elu(nn.Conv(64, (3, 3), padding=1, name="s3")(s))), self.img_size)
        seg_logits = nn.Conv(
            self.n_classes, (3, 3), padding=1, name="seg_final",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.constant(-4.595),  # prior 0.01
        )(s)
        return cls, reg, seg_logits


class MaskRCNN:
    """Host wrapper with the reference MaskRCNN module's interface."""

    train_feed_keys = ("img", "bbox_gt", "masks", "cls_valid")

    def __init__(self, cfg, seed: int = 0):
        self.cfg = cfg
        self.n_classes = int(cfg.dataset.n_classes)
        self.img_size = (int(cfg.dataset.img_h), int(cfg.dataset.img_w))
        self.feat_size = (self.img_size[0] // 16 - 1, self.img_size[1] // 16 - 1)
        self.net = MaskRCNNNetwork(n_classes=self.n_classes, img_size=self.img_size)
        self.anchors = jnp.asarray(generate_anchor_grid(*self.feat_size))

        rng = jax.random.PRNGKey(seed)
        h, w = self.img_size
        variables = jax.jit(lambda r, x: self.net.init(r, x, train=False))(
            rng, jnp.zeros((1, h, w, 3))
        )
        self.params = variables["params"]
        self.batch_stats = variables["batch_stats"]
        self.tx = optax.chain(
            optax.add_decayed_weights(cfg.model.get("weight_decay", 1e-6)),
            optax.amsgrad(cfg.model.get("learning_rate", 1e-4)),
        )
        self.opt_state = self.tx.init(self.params)
        self.weights_version = 0
        self._build_jits()

    def _build_jits(self):
        net, anchors, tx = self.net, self.anchors, self.tx
        img_h, img_w = self.img_size
        n_classes = self.n_classes

        @functools.partial(jax.jit, static_argnames=("topk",))
        def infer(params, batch_stats, image_u8, target_cls, topk=100):
            """Target-class inference: scores are selected for `target_cls`
            BEFORE top-k and NMS (ADVICE r1: ranking by per-anchor max class +
            class-agnostic NMS dropped target detections whenever another class
            scored marginally higher or an overlapping other-class box
            suppressed them; the reference Mask R-CNN scores/NMSes per class).
            `target_cls` is traced, so one compile serves every object."""
            image = image_u8.astype(jnp.float32) / 255.0
            cls, reg, seg_logits = net.apply(
                {"params": params, "batch_stats": batch_stats}, image, train=False
            )
            boxes = clip_boxes(decode_boxes(anchors, reg[0]), img_h, img_w)
            target_score = jnp.take(cls[0], target_cls, axis=-1)
            k1 = min(1000, target_score.shape[0])
            top_scores, top_idx = jax.lax.top_k(target_score, k1)
            sel_scores, sel_boxes, sel_i, valid = nms_topk(
                boxes[top_idx], top_scores, 0.5, topk
            )
            seg_probs = jax.nn.sigmoid(jnp.take(seg_logits[0], target_cls, axis=-1))
            return sel_scores, sel_boxes, valid, seg_probs

        @jax.jit
        def train_step(params, batch_stats, opt_state, batch):
            def loss_fn(p):
                (cls, reg, seg_logits), mutated = net.apply(
                    {"params": p, "batch_stats": batch_stats},
                    batch["img"], train=True, mutable=["batch_stats"],
                )
                # cls_valid (B, C): partially-annotated rows (the loop's
                # per-target pseudo-label feed) mark only their labeled
                # classes — unlabeled classes, whose objects may be present,
                # contribute neither classification nor mask loss (see
                # losses.detection_loss)
                cv = batch.get("cls_valid")
                if cv is None:
                    cv = jnp.ones((batch["img"].shape[0], n_classes), jnp.float32)
                loss_cls, loss_reg = detection_loss(
                    cls, reg, anchors, batch["bbox_gt"], class_valid=cv)
                seg_probs = jnp.clip(jax.nn.sigmoid(seg_logits), 1e-7, 1 - 1e-7)
                gt = batch["masks"]  # (B, H, W, C)
                bce = -(gt * jnp.log(seg_probs) + (1 - gt) * jnp.log(1 - seg_probs))
                w = cv[:, None, None, :]
                loss_seg = (w * bce).sum() / jnp.clip(
                    (w * jnp.ones_like(bce)).sum(), 1.0)
                loss = loss_cls + loss_reg + 20.0 * loss_seg
                metrics = {
                    "loss": loss, "loss_classifier": loss_cls,
                    "loss_box_reg": loss_reg, "loss_mask": loss_seg,
                }
                return loss, (metrics, mutated["batch_stats"])

            grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_stats, new_opt, metrics

        @jax.jit
        def eval_seg(params, batch_stats, img):
            _, _, seg_logits = net.apply(
                {"params": params, "batch_stats": batch_stats}, img, train=False
            )
            return seg_logits

        self._infer = infer
        self._train_step = train_step
        self._eval_seg = eval_seg

    def eval_metric(self, batch: dict) -> list:
        """Per-sample seg IoU averaged over GT-present classes (the monitored
        metric for dataset=detect training)."""
        logits = np.asarray(
            self._eval_seg(self.params, self.batch_stats,
                           jnp.asarray(np.asarray(batch["img"], np.float32)))
        )
        gt = np.asarray(batch["masks"]) > 0.5  # (B, H, W, C)
        pred = logits > 0.0
        out = []
        for p, g in zip(pred, gt):
            present = g.any(axis=(0, 1))
            if not present.any():
                out.append(1.0)
                continue
            inter = np.logical_and(p, g)[..., present].sum(axis=(0, 1))
            union = np.logical_or(p, g)[..., present].sum(axis=(0, 1))
            out.append(float(np.mean(inter / np.clip(union, 1, None))))
        return out

    def train_step(self, batch: dict) -> dict:
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if k in self.train_feed_keys}
        self.params, self.batch_stats, self.opt_state, metrics = self._train_step(
            self.params, self.batch_stats, self.opt_state, batch
        )
        self.weights_version += 1
        return {k: float(v) for k, v in metrics.items()}

    def clear_cache(self):
        """No template cache (interface parity with DtoidModel)."""

    def reset_optimizer(self):
        self.opt_state = self.tx.init(self.params)

    def forward_test_time(self, data: dict, topk: int = 100) -> dict:
        """Reference interface (ref models/maskrcnn.py:33-76): detections of
        every class, filtered to `obj_id`; class index c = obj_id - 1."""
        img = np.asarray(data["img"])
        if img.ndim == 3:
            img = img[None]
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).round().astype(np.uint8)
        target = int(np.asarray(data["obj_id"]).reshape(-1)[0])

        scores, boxes, valid, seg_probs = jax.device_get(
            self._infer(self.params, self.batch_stats, jnp.asarray(img),
                        jnp.int32(target - 1), topk=topk)
        )
        h, w = self.img_size
        keep = np.asarray(valid, bool)
        if not keep.any():
            out = {
                "final_bbox": [np.asarray([[0, 0, w, h]], np.float32)],
                "final_score": [np.zeros(1, np.float32)],
                "segmentation": np.zeros((h, w), np.float32),
                "seg_IoU": 0.0,
                "seg_IoU_50": 0.0,
            }
            return out
        out = {
            "final_bbox": [boxes[keep]],
            "final_score": [scores[keep]],
            "segmentation": seg_probs,
        }
        if data.get("mask") is not None:
            gt = np.asarray(data["mask"]).squeeze() > 0.5
            pred = out["segmentation"] > 0.5
            union = np.logical_or(pred, gt).sum()
            iou = float(np.logical_and(pred, gt).sum() / union) if union else 1.0
            out["seg_IoU"] = iou
            out["seg_IoU_50"] = float(iou > 0.5)
        return out

    def state_dict(self):
        return {"params": jax.device_get(self.params),
                "batch_stats": jax.device_get(self.batch_stats)}

    def load_state_dict(self, sd):
        self.params = jax.device_put(sd["params"])
        self.batch_stats = jax.device_put(sd["batch_stats"])
        self.weights_version += 1
