"""DTOID: template-conditioned zero-shot instance detector (flax linen, NHWC).

Architecture reimplemented TPU-first from the reference
(/root/reference/python/ossid/models/dtoid/network.py):

  * ImageEncoder — DenseNet121 trunk whose stem output is modulated by a
    depthwise correlation with a 3x3 global-template kernel (ref :160-192),
    then projected 1024 -> 640 (ref :171-183).
  * TemplateEncoderLocal — SqueezeNet1.1 on RGB+mask, multi-scale concat
    -> (7, 7, 640) pose-specific template feature (ref :242-279).
  * TemplateEncoderGlobal — same trunk + two valid 3x3 convs -> (3, 3, 64)
    object-attention kernel (ref :195-239).
  * CorrelationHead — three correlation branches (global-avg dot, 3x3
    depthwise corr, subtract) fused to a 512ch map, with center-heatmap and
    5-stage segmentation decoder (ref :282-371).
  * ClassificationHead / RegressionHead — RetinaNet-style heads over 24
    anchors x 2 classes (ref :96-157).

Differences by design (TPU-native):
  * NHWC everywhere; anchors precomputed host-side (anchors.py).
  * The all-templates inference path batches every local template in one
    fixed-shape forward instead of the reference's chunked python loop
    (ref :505-530); post-processing (top-k + NMS) is fixed-shape XLA
    (ops/nms.py) rather than torchvision CUDA NMS.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ossid_code_tpu.models.backbones.densenet import DenseNetStem, DenseNetEarly, DenseNetLate
from ossid_code_tpu.models.backbones.squeezenet import SqueezeStem4, SqueezeEarly, SqueezeLate
from ossid_code_tpu.ops.conv import depthwise_corr, avg_pool
from ossid_code_tpu.ops.resize import resize_bilinear, upsample_nearest, resize_nearest

PRIOR = 0.01
# math.log, NOT jnp.log: a module-level jnp call would initialize the JAX
# backend at import time, before driver entries can force a CPU platform.
PRIOR_BIAS = -math.log((1.0 - PRIOR) / PRIOR)


def detect_pack_layout(k: int, fh: int, fw: int, h: int, w: int,
                       packed_seg: bool):
    """Field order of the single-buffer detect transport (`detect` with
    pack_all): the ONE place the layout is defined, used by both the in-graph
    pack below and DtoidModel._unpack_detections (they drifted risk otherwise
    — ADVICE r4). Returns ((key, dtype_str, shape), ...); total bytes =
    25*k + 4*fh*fw + seg bytes."""
    seg = (("seg_packed", "uint8", (h, w // 8)) if packed_seg
           else ("seg_u8", "uint8", (h, w)))
    return (
        ("pred_scores", "float32", (k,)),
        ("pred_bbox", "float32", (k, 4)),
        ("pred_template_ids", "int32", (k,)),
        ("valid", "uint8", (k,)),
        ("heat_map", "float32", (fh, fw)),
        seg,
    )


def _bn(train: bool, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name)


def imagenet_normalize(img: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB (..., 3) -> ImageNet-normalized (ref utils/__init__.py:33)."""
    mean = jnp.asarray([0.485, 0.456, 0.406], img.dtype)
    std = jnp.asarray([0.229, 0.224, 0.225], img.dtype)
    return (img - mean) / std


class TemplateEncoderLocal(nn.Module):
    """RGB+mask (B, 124, 124, 4) -> (B, 7, 7, 640) (ref network.py:242-279)."""

    @nn.compact
    def __call__(self, t4, train: bool = False):
        x0 = SqueezeStem4(name="stem")(t4)
        x1 = SqueezeEarly(name="early")(x0)
        x2 = SqueezeLate(name="late")(x1)
        x1n = _bn(train, "norm_1")(x1)
        x2n = _bn(train, "norm_2")(x2)
        x1d = resize_bilinear(x1n, (x2.shape[1], x2.shape[2]))
        return jnp.concatenate([x2n, x1d], axis=-1)


class TemplateEncoderGlobal(nn.Module):
    """RGB+mask (B, 124, 124, 4) -> (B, 3, 3, 64) kernel (ref network.py:195-239)."""

    @nn.compact
    def __call__(self, t4, train: bool = False):
        x0 = SqueezeStem4(name="stem")(t4)
        x1 = SqueezeEarly(name="early")(x0)
        x2 = SqueezeLate(name="late")(x1)
        x1n = _bn(train, "norm_1")(x1)
        x2n = _bn(train, "norm_2")(x2)
        x1d = resize_bilinear(x1n, (x2.shape[1], x2.shape[2]))
        xf = jnp.concatenate([x2n, x1d], axis=-1)
        xf = _bn(train, "final_norm_1")(nn.elu(nn.Conv(128, (3, 3), padding="VALID", name="final_conv_1")(xf)))
        xf = _bn(train, "final_norm_2")(nn.elu(nn.Conv(64, (3, 3), padding="VALID", name="final_conv_2")(xf)))
        return xf


class ImageEncoder(nn.Module):
    """Image (B, H, W, 3) + global kernel (B, 3, 3, 64) -> (B, H/16-1, W/16-1, 640)
    (ref network.py:160-192)."""

    densenet_blocks: Tuple[int, int, int] = (12, 24, 16)

    @nn.compact
    def __call__(self, image, global_kernel, train: bool = False):
        x0 = DenseNetStem(name="stem")(image)
        # object-attention modulation: correlate the stem features with the
        # global template kernel, residual-add (ref :177-179)
        gk = jnp.broadcast_to(global_kernel, (x0.shape[0],) + global_kernel.shape[1:])
        x0 = x0 + depthwise_corr(x0, gk, padding=1)
        x1 = DenseNetEarly(name="early")(x0, train)
        x2 = DenseNetLate(self.densenet_blocks, name="late")(x1, train)
        xf = _bn(train, "n1")(nn.elu(nn.Conv(640, (1, 1), name="c1")(x2)))
        return xf


class ClassificationHead(nn.Module):
    """(B, h, w, 512) -> per-anchor class probabilities (B, h*w*24, 2)
    (ref network.py:96-128)."""

    num_anchors: int = 24
    num_classes: int = 2
    feature_size: int = 256

    @nn.compact
    def __call__(self, x):
        for i in range(1, 5):
            x = nn.elu(nn.Conv(self.feature_size, (3, 3), padding=1, name=f"conv{i}")(x))
        out = nn.Conv(
            self.num_anchors * self.num_classes,
            (3, 3),
            padding=1,
            name="output",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.constant(PRIOR_BIAS),
        )(x)
        out = jax.nn.sigmoid(out)
        b, h, w, _ = out.shape
        return out.reshape(b, h * w * self.num_anchors, self.num_classes)


class RegressionHead(nn.Module):
    """(B, h, w, 512) -> per-anchor box deltas (B, h*w*24, 4) (ref network.py:131-157)."""

    num_anchors: int = 24
    feature_size: int = 256

    @nn.compact
    def __call__(self, x):
        for i in range(1, 5):
            x = nn.elu(nn.Conv(self.feature_size, (3, 3), padding=1, name=f"conv{i}")(x))
        out = nn.Conv(
            self.num_anchors * 4,
            (3, 3),
            padding=1,
            name="output",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(x)
        b, h, w, _ = out.shape
        return out.reshape(b, h * w * self.num_anchors, 4)


class CorrelationHead(nn.Module):
    """Image feature (B, h, w, 640) x template feature (B, 7, 7, 640)
    -> (xcors (B, h, w, 512), heatmap (B, h, w, 1), seg logits (B, H, W, 1))
    (ref network.py:282-371).

    `correlate` and `decode_seg` are separate methods so the inference path can
    run the (expensive, full-resolution) segmentation decoder on only the
    winning template instead of all T (the reference decodes every template and
    gathers afterwards, ref network.py:513,574)."""

    img_size: Tuple[int, int] = (480, 640)

    def setup(self):
        conv = lambda ch, pad, name: nn.Conv(ch, (3, 3), padding=pad, name=name)
        bn = lambda name: nn.BatchNorm(momentum=0.9, epsilon=1e-5, name=name)
        self.c1 = conv(640, "VALID", "c1")
        self.n1 = bn("n1")
        self.c2 = conv(640, "VALID", "c2")
        self.n2 = bn("n2")
        self.corr_conv_dot = conv(256, 1, "corr_conv_dot")
        self.norm_corr_dot = bn("norm_corr_dot")
        self.corr_conv_dot3x3 = conv(256, 1, "corr_conv_dot3x3")
        self.norm_corr_dot3x3 = bn("norm_corr_dot3x3")
        self.corr_conv_sub = conv(256, 1, "corr_conv_sub")
        self.norm_corr_sub = bn("norm_corr_sub")
        self.cf = conv(512, 1, "cf")
        self.nf = bn("nf")
        self.corr_conv_heatmap = nn.Conv(
            1, (1, 1), name="corr_conv_heatmap",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.constant(PRIOR_BIAS),
        )
        self.s1, self.ns1 = conv(256, 1, "s1"), bn("ns1")
        self.s2, self.ns2 = conv(128, 1, "s2"), bn("ns2")
        self.s3, self.ns3 = conv(64, 1, "s3"), bn("ns3")
        self.s4, self.ns4 = conv(32, 1, "s4"), bn("ns4")
        self.s5, self.ns5 = conv(16, 1, "s5"), bn("ns5")
        self.seg_final = nn.Conv(
            1, (3, 3), padding=1, name="seg_final",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.constant(PRIOR_BIAS),
        )

    def correlate(self, image_feat, template_feat, train: bool = False):
        ra = not train
        t1 = self.n1(nn.elu(self.c1(template_feat)), use_running_average=ra)
        t2 = self.n2(nn.elu(self.c2(t1)), use_running_average=ra)
        dot3x3 = depthwise_corr(image_feat, t2, padding=1)

        avg = avg_pool(template_feat, template_feat.shape[1])  # (B, 1, 1, 640)
        dot = image_feat * avg
        sub = image_feat - avg

        dot_c = self.norm_corr_dot(nn.elu(self.corr_conv_dot(dot)), use_running_average=ra)
        dot3_c = self.norm_corr_dot3x3(nn.elu(self.corr_conv_dot3x3(dot3x3)), use_running_average=ra)
        sub_c = self.norm_corr_sub(nn.elu(self.corr_conv_sub(sub)), use_running_average=ra)

        # concat order matters for weight porting: dot, sub, dot3x3 (ref :343)
        x = jnp.concatenate([dot_c, sub_c, dot3_c], axis=-1)
        x2 = self.nf(nn.elu(self.cf(x)), use_running_average=ra)

        heatmap = jax.nn.sigmoid(self.corr_conv_heatmap(x2))
        return x2, heatmap

    def decode_seg(self, x2, train: bool = False, half: bool = False):
        """(B, h, w, 512) -> seg logits (B, H, W, 1) (ref :354-359).

        half=True decodes to (H/2, W/2): the two highest-resolution stages
        (s5 + seg_final) carry most of the train step's HBM traffic, and the
        finetune loss can supervise at half resolution against a 2x2-pooled
        mask (opt-in cfg model.seg_loss_half; A/B'd in bench). Inference
        always decodes full resolution."""
        ra = not train
        out_hw = ((self.img_size[0] // 2, self.img_size[1] // 2)
                  if half else self.img_size)
        s = upsample_nearest(self.ns1(nn.elu(self.s1(x2)), use_running_average=ra), 2)
        s = upsample_nearest(self.ns2(nn.elu(self.s2(s)), use_running_average=ra), 2)
        s = upsample_nearest(self.ns3(nn.elu(self.s3(s)), use_running_average=ra), 2)
        s = resize_nearest(self.ns4(nn.elu(self.s4(s)), use_running_average=ra), out_hw)
        s = self.ns5(nn.elu(self.s5(s)), use_running_average=ra)
        return self.seg_final(s)

    def __call__(self, image_feat, template_feat, train: bool = False,
                 seg_half: bool = False):
        x2, heatmap = self.correlate(image_feat, template_feat, train)
        seg_logits = self.decode_seg(x2, train, half=seg_half)
        return x2, heatmap, seg_logits


# ---------------------------------------------------------------------------
# Box decoding (ref network.py:30-88)
# ---------------------------------------------------------------------------

BBOX_STD = (0.1, 0.1, 0.2, 0.2)  # plain tuple: no backend init at import


def decode_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Apply regression deltas to anchors. anchors (N, 4); deltas (..., N, 4)."""
    widths = anchors[:, 2] - anchors[:, 0]
    heights = anchors[:, 3] - anchors[:, 1]
    ctr_x = anchors[:, 0] + 0.5 * widths
    ctr_y = anchors[:, 1] + 0.5 * heights

    dx = deltas[..., 0] * BBOX_STD[0]
    dy = deltas[..., 1] * BBOX_STD[1]
    dw = deltas[..., 2] * BBOX_STD[2]
    dh = deltas[..., 3] * BBOX_STD[3]

    pred_ctr_x = ctr_x + dx * widths
    pred_ctr_y = ctr_y + dy * heights
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights

    return jnp.stack(
        [
            pred_ctr_x - 0.5 * pred_w,
            pred_ctr_y - 0.5 * pred_h,
            pred_ctr_x + 0.5 * pred_w,
            pred_ctr_y + 0.5 * pred_h,
        ],
        axis=-1,
    )


def clip_boxes(boxes: jnp.ndarray, img_h: int, img_w: int) -> jnp.ndarray:
    """Clamp x1,y1 at 0 and x2,y2 at the image size (ref network.py:74-88)."""
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0.0),
            jnp.clip(boxes[..., 1], 0.0),
            jnp.clip(boxes[..., 2], None, float(img_w)),
            jnp.clip(boxes[..., 3], None, float(img_h)),
        ],
        axis=-1,
    )


class DtoidNetwork(nn.Module):
    """Full DTOID network with train and all-templates-inference entry points."""

    img_size: Tuple[int, int] = (480, 640)
    densenet_blocks: Tuple[int, int, int] = (12, 24, 16)

    def setup(self):
        self.template_global = TemplateEncoderGlobal(name="template_feature_extractor_global")
        self.template_local = TemplateEncoderLocal(name="template_feature_extractor")
        self.image_encoder = ImageEncoder(
            densenet_blocks=self.densenet_blocks, name="image_feature_extractor")
        self.correlation = CorrelationHead(img_size=self.img_size, name="correlation_model")
        self.classification = ClassificationHead(name="classification")
        self.regression = RegressionHead(name="regression")

    # -- template featurization (test-time cache fill; ref net:431-437) ------
    def compute_template_local(self, t4, train: bool = False):
        return self.template_local(t4, train)

    def compute_template_global(self, t4, train: bool = False):
        return self.template_global(t4, train)

    # -- offline/finetune training forward (ref network.py:439-471) ----------
    def __call__(self, image, limg, lmask, gimg, gmask, train: bool = True,
                 seg_half: bool = False):
        """All images in [0, 1]; shapes: image (B, H, W, 3), limg (B, h, w, 3),
        lmask (B, h, w, 1), gimg/gmask likewise.

        Returns dict: classifications (B, N, 2), regressions (B, N, 4),
        heat_map (B, fh, fw, 1), seg_logits (B, H, W, 1) — or (B, H/2, W/2, 1)
        with seg_half (see CorrelationHead.decode_seg).
        """
        img_n = imagenet_normalize(image)
        l4 = jnp.concatenate([imagenet_normalize(limg), lmask], axis=-1)
        g4 = jnp.concatenate([imagenet_normalize(gimg), gmask], axis=-1)

        gfeat = self.template_global(g4, train)
        feat = self.image_encoder(img_n, gfeat, train)
        lfeat = self.template_local(l4, train)
        xcors, heat_map, seg_logits = self.correlation(feat, lfeat, train,
                                                       seg_half=seg_half)

        cls = self.classification(xcors)
        reg = self.regression(xcors)
        return {
            "classifications": cls,
            "regressions": reg,
            "heat_map": heat_map,
            "seg_logits": seg_logits,
            "feat_hw": (xcors.shape[1], xcors.shape[2]),
        }

    # -- fused zero-shot detection (ref network.py:473-581 + post-processing) --
    def detect(self, image_u8, local_feats, global_feat, anchors,
               pre_nms_topk: int = 1000, topk: int = 500, nms_iou: float = 0.5,
               pack_seg: bool = False, compute_dtype=jnp.float32,
               pack_all: bool = False):
        """One fixed-shape program for the whole serving path: uint8 image in,
        compact detections out. Normalization happens on device (the uint8
        transfer is 4x smaller than float32 — the host->device link is the
        bottleneck on remote-attached TPUs), every template is correlated in
        one batch, top-k + NMS run in-graph (ops/nms.py), and the
        full-resolution segmentation decoder runs only for the winning
        template.

        image_u8 (1, H, W, 3) uint8; local_feats (T, 7, 7, 640);
        global_feat (1, 3, 3, 64); anchors (N, 4).
        """
        from ossid_code_tpu.ops.nms import nms_topk as _nms_topk

        # compute_dtype=bfloat16 runs the trunk/heads in bf16 (params are cast
        # by the caller); ranking, box decode and NMS always run in f32 so box
        # coordinates keep sub-pixel precision
        image = image_u8.astype(compute_dtype) / 255.0
        img_n = imagenet_normalize(image)
        feat = self.image_encoder(img_n, global_feat, train=False)
        t = local_feats.shape[0]
        feat_t = jnp.broadcast_to(feat, (t,) + feat.shape[1:])
        xcors, heatmap = self.correlation.correlate(feat_t, local_feats, train=False)
        cls = self.classification(xcors)  # (T, N, 2)
        reg = self.regression(xcors)

        n = cls.shape[1]
        scores_all = cls[..., 1].astype(jnp.float32).reshape(-1)
        boxes_all = clip_boxes(
            decode_boxes(anchors, reg.astype(jnp.float32)),
            self.img_size[0], self.img_size[1],
        ).reshape(-1, 4)

        k1 = min(pre_nms_topk, t * n)
        top_scores, top_idx = jax.lax.top_k(scores_all, k1)
        top_boxes = boxes_all[top_idx]
        top_tids = (top_idx // n).astype(jnp.int32)

        sel_scores, sel_boxes, sel_idx, valid = _nms_topk(top_boxes, top_scores, nms_iou, topk)
        sel_tids = top_tids[sel_idx]

        best_tid = sel_tids[0]
        x2_best = jax.lax.dynamic_index_in_dim(xcors, best_tid, axis=0, keepdims=True)
        seg_logits = self.correlation.decode_seg(x2_best, train=False)
        heat_best = jax.lax.dynamic_index_in_dim(heatmap, best_tid, axis=0, keepdims=False)[..., 0]

        out = {
            "pred_scores": sel_scores.astype(jnp.float32),
            "pred_bbox": sel_boxes,
            "pred_template_ids": sel_tids,
            "valid": valid,
            "heat_map": heat_best.astype(jnp.float32),
        }
        if pack_seg:
            # threshold at 0.5 (== logit 0) and pack 8 px/byte: 8x smaller
            # host fetch over the bandwidth-bound link
            bits = (seg_logits[0, :, :, 0] > 0.0).astype(jnp.uint8)
            h, w = bits.shape
            bits = bits.reshape(h, w // 8, 8)
            weights = (2 ** jnp.arange(8, dtype=jnp.uint32)).astype(jnp.uint8)
            out["seg_packed"] = jnp.einsum(
                "hwb,b->hw", bits, weights, preferred_element_type=jnp.uint32
            ).astype(jnp.uint8)
        else:
            # graded probabilities (seg_transfer='u8'): 1 B/px, carried
            # through pack_all too so the config knob keeps its meaning
            # (ADVICE r4 — pack_all used to force the 1-bit path)
            out["seg_u8"] = (jax.nn.sigmoid(seg_logits[0, :, :, 0]) * 255.0).astype(jnp.uint8)
        if pack_all:
            # single-buffer transport: every output bitcast to bytes and
            # concatenated in the detect_pack_layout order. The
            # remote-attached fetch pays a per-buffer cost on top of the
            # round trip (measured ~2-3 ms/buffer on the axon tunnel), so one
            # 75 KB buffer beats six small ones; DtoidModel.fetch_detections
            # re-slices by the same layout (module.py::_unpack_detections).
            def as_bytes(x, dt):
                x = x.astype(jnp.dtype(dt)).reshape(-1)
                if x.dtype == jnp.uint8:
                    return x
                return jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(-1)

            layout = detect_pack_layout(
                int(out["pred_scores"].shape[0]), *out["heat_map"].shape,
                self.img_size[0], self.img_size[1], pack_seg)
            return {"packed": jnp.concatenate(
                [as_bytes(out[key], dt) for key, dt, _ in layout])}
        return out

    # -- zero-shot inference over all templates (ref network.py:473-581) -----
    def forward_all_templates(self, image, local_feats, global_feat):
        """image (1, H, W, 3) in [0,1]; local_feats (T, 7, 7, 640) precomputed;
        global_feat (1, 3, 3, 64) precomputed.

        Returns raw per-template head outputs (the fused serving path with
        in-graph post-processing is `detect` above):
          cls (T, N, 2), reg (T, N, 4), heatmap (T, fh, fw, 1),
          seg_probs (T, H, W).
        """
        img_n = imagenet_normalize(image)
        feat = self.image_encoder(img_n, global_feat, train=False)  # (1, fh, fw, 640)
        T = local_feats.shape[0]
        feat_t = jnp.broadcast_to(feat, (T,) + feat.shape[1:])
        xcors, heatmap, seg_logits = self.correlation(feat_t, local_feats, train=False)
        cls = self.classification(xcors)
        reg = self.regression(xcors)
        seg_probs = jax.nn.sigmoid(seg_logits[..., 0])
        return cls, reg, heatmap, seg_probs
