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

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ossid_code_tpu.models.backbones.densenet import DenseNetStem, DenseNetEarly, DenseNetLate
from ossid_code_tpu.models.backbones.squeezenet import SqueezeStem4, SqueezeEarly, SqueezeLate
from ossid_code_tpu.ops.conv import depthwise_corr, avg_pool
from ossid_code_tpu.ops.resize import resize_bilinear, upsample_nearest, resize_nearest

PRIOR = 0.01
PRIOR_BIAS = -float(jnp.log((1.0 - PRIOR) / PRIOR))


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

    @nn.compact
    def __call__(self, image, global_kernel, train: bool = False):
        x0 = DenseNetStem(name="stem")(image)
        # object-attention modulation: correlate the stem features with the
        # global template kernel, residual-add (ref :177-179)
        gk = jnp.broadcast_to(global_kernel, (x0.shape[0],) + global_kernel.shape[1:])
        x0 = x0 + depthwise_corr(x0, gk, padding=1)
        x1 = DenseNetEarly(name="early")(x0, train)
        x2 = DenseNetLate(name="late")(x1, train)
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
    (ref network.py:282-371)."""

    img_size: Tuple[int, int] = (480, 640)

    @nn.compact
    def __call__(self, image_feat, template_feat, train: bool = False):
        t1 = _bn(train, "n1")(nn.elu(nn.Conv(640, (3, 3), padding="VALID", name="c1")(template_feat)))
        t2 = _bn(train, "n2")(nn.elu(nn.Conv(640, (3, 3), padding="VALID", name="c2")(t1)))
        dot3x3 = depthwise_corr(image_feat, t2, padding=1)

        avg = avg_pool(template_feat, template_feat.shape[1])  # (B, 1, 1, 640)
        dot = image_feat * avg
        sub = image_feat - avg

        dot_c = _bn(train, "norm_corr_dot")(nn.elu(nn.Conv(256, (3, 3), padding=1, name="corr_conv_dot")(dot)))
        dot3_c = _bn(train, "norm_corr_dot3x3")(nn.elu(nn.Conv(256, (3, 3), padding=1, name="corr_conv_dot3x3")(dot3x3)))
        sub_c = _bn(train, "norm_corr_sub")(nn.elu(nn.Conv(256, (3, 3), padding=1, name="corr_conv_sub")(sub)))

        # concat order matters for weight porting: dot, sub, dot3x3 (ref :343)
        x = jnp.concatenate([dot_c, sub_c, dot3_c], axis=-1)
        x2 = _bn(train, "nf")(nn.elu(nn.Conv(512, (3, 3), padding=1, name="cf")(x)))

        # center heatmap (ref :326,350-351)
        heatmap = jax.nn.sigmoid(
            nn.Conv(
                1,
                (1, 1),
                name="corr_conv_heatmap",
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.constant(PRIOR_BIAS),
            )(x2)
        )

        # segmentation decoder (ref :354-359): conv+elu+bn, nearest x2 upsample
        s = upsample_nearest(_bn(train, "ns1")(nn.elu(nn.Conv(256, (3, 3), padding=1, name="s1")(x2))), 2)
        s = upsample_nearest(_bn(train, "ns2")(nn.elu(nn.Conv(128, (3, 3), padding=1, name="s2")(s))), 2)
        s = upsample_nearest(_bn(train, "ns3")(nn.elu(nn.Conv(64, (3, 3), padding=1, name="s3")(s))), 2)
        s = resize_nearest(_bn(train, "ns4")(nn.elu(nn.Conv(32, (3, 3), padding=1, name="s4")(s))), self.img_size)
        s = _bn(train, "ns5")(nn.elu(nn.Conv(16, (3, 3), padding=1, name="s5")(s)))
        seg_logits = nn.Conv(
            1,
            (3, 3),
            padding=1,
            name="seg_final",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.constant(PRIOR_BIAS),
        )(s)

        return x2, heatmap, seg_logits


# ---------------------------------------------------------------------------
# Box decoding (ref network.py:30-88)
# ---------------------------------------------------------------------------

BBOX_STD = jnp.asarray([0.1, 0.1, 0.2, 0.2], jnp.float32)


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

    def setup(self):
        self.template_global = TemplateEncoderGlobal(name="template_feature_extractor_global")
        self.template_local = TemplateEncoderLocal(name="template_feature_extractor")
        self.image_encoder = ImageEncoder(name="image_feature_extractor")
        self.correlation = CorrelationHead(img_size=self.img_size, name="correlation_model")
        self.classification = ClassificationHead(name="classification")
        self.regression = RegressionHead(name="regression")

    # -- template featurization (test-time cache fill; ref net:431-437) ------
    def compute_template_local(self, t4, train: bool = False):
        return self.template_local(t4, train)

    def compute_template_global(self, t4, train: bool = False):
        return self.template_global(t4, train)

    # -- offline/finetune training forward (ref network.py:439-471) ----------
    def __call__(self, image, limg, lmask, gimg, gmask, train: bool = True):
        """All images in [0, 1]; shapes: image (B, H, W, 3), limg (B, h, w, 3),
        lmask (B, h, w, 1), gimg/gmask likewise.

        Returns dict: classifications (B, N, 2), regressions (B, N, 4),
        heat_map (B, fh, fw, 1), seg_logits (B, H, W, 1).
        """
        img_n = imagenet_normalize(image)
        l4 = jnp.concatenate([imagenet_normalize(limg), lmask], axis=-1)
        g4 = jnp.concatenate([imagenet_normalize(gimg), gmask], axis=-1)

        gfeat = self.template_global(g4, train)
        feat = self.image_encoder(img_n, gfeat, train)
        lfeat = self.template_local(l4, train)
        xcors, heat_map, seg_logits = self.correlation(feat, lfeat, train)

        cls = self.classification(xcors)
        reg = self.regression(xcors)
        return {
            "classifications": cls,
            "regressions": reg,
            "heat_map": heat_map,
            "seg_logits": seg_logits,
            "feat_hw": (xcors.shape[1], xcors.shape[2]),
        }

    # -- zero-shot inference over all templates (ref network.py:473-581) -----
    def forward_all_templates(self, image, local_feats, global_feat):
        """image (1, H, W, 3) in [0,1]; local_feats (T, 7, 7, 640) precomputed;
        global_feat (1, 3, 3, 64) precomputed.

        Returns raw per-template head outputs (post-processing happens in
        ossid_code_tpu.models.dtoid.module.postprocess_detections):
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
