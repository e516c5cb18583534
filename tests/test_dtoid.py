import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ossid_code_tpu.core.config import default_config
from ossid_code_tpu.models.dtoid.anchors import generate_anchor_grid, base_anchors
from ossid_code_tpu.models.dtoid.network import decode_boxes, clip_boxes
from ossid_code_tpu.models.dtoid.losses import detection_loss


def np_detection_loss(cls, reg, anchors, ann, alpha=0.25, gamma=2.0):
    """Oracle: direct numpy port of the reference loss math (loss.py:46-175)."""
    B = cls.shape[0]
    cls = np.clip(cls, 1e-4, 1 - 1e-4)
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = anchors[:, 0] + 0.5 * aw
    acy = anchors[:, 1] + 0.5 * ah
    cls_losses, reg_losses = [], []
    for j in range(B):
        c, r = cls[j], reg[j]
        bb = ann[j][ann[j][:, 4] != -1]
        if len(bb) == 0:
            af = 1 - alpha
            fw = af * c**gamma
            bce = -np.log(1 - c)
            cls_losses.append((fw * bce).sum())
            reg_losses.append(0.0)
            continue
        # IoU
        iou = np.zeros((len(anchors), len(bb)))
        for gi, g in enumerate(bb):
            iw = np.minimum(anchors[:, 2], g[2]) - np.maximum(anchors[:, 0], g[0])
            ih = np.minimum(anchors[:, 3], g[3]) - np.maximum(anchors[:, 1], g[1])
            inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
            ua = np.clip(aw * ah + (g[2] - g[0]) * (g[3] - g[1]) - inter, 1e-8, None)
            iou[:, gi] = inter / ua
        iou_max = iou.max(1)
        iou_arg = iou.argmax(1)
        targets = -np.ones_like(c)
        targets[iou_max < 0.4] = 0
        pos = iou_max >= 0.5
        assigned = bb[iou_arg]
        targets[pos] = 0
        targets[pos, assigned[pos, 4].astype(int)] = 1
        af = np.where(targets == 1, alpha, 1 - alpha)
        fw = np.where(targets == 1, 1 - c, c)
        fw = af * fw**gamma
        bce = -(targets * np.log(c) + (1 - targets) * np.log(1 - c))
        cl = np.where(targets != -1, fw * bce, 0)
        cls_losses.append(cl.sum() / max(pos.sum(), 1))
        if pos.sum() > 0:
            a2 = assigned[pos]
            gw = np.clip(a2[:, 2] - a2[:, 0], 1, None)
            gh = np.clip(a2[:, 3] - a2[:, 1], 1, None)
            gcx = a2[:, 0] + 0.5 * (a2[:, 2] - a2[:, 0])
            gcy = a2[:, 1] + 0.5 * (a2[:, 3] - a2[:, 1])
            t = np.stack(
                [(gcx - acx[pos]) / aw[pos], (gcy - acy[pos]) / ah[pos],
                 np.log(gw / aw[pos]), np.log(gh / ah[pos])], 1)
            t = t / np.array([0.1, 0.1, 0.2, 0.2])
            d = np.abs(t - r[pos])
            sl = np.where(d <= 1 / 9, 0.5 * 9 * d**2, d - 0.5 / 9)
            reg_losses.append(sl.mean())
        else:
            reg_losses.append(0.0)
    return np.mean(cls_losses), np.mean(reg_losses)


def test_base_anchors():
    a = base_anchors()
    assert a.shape == (24, 4)
    # ratio=1 scale=1: 30x30 box centered at origin
    i = np.where(np.isclose(a[:, 2] - a[:, 0], 30) & np.isclose(a[:, 3] - a[:, 1], 30))[0]
    assert len(i) == 1
    # all areas = (30*scale)^2
    areas = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    scales = np.tile([1, 2, 3, 4, 5, 6, 7, 8], 3)
    np.testing.assert_allclose(areas, (30.0 * scales) ** 2, rtol=1e-6)


def test_anchor_grid():
    g = generate_anchor_grid(29, 39)
    assert g.shape == (29 * 39 * 24, 4)
    # first cell center at (8, 8)
    c0 = g[:24]
    np.testing.assert_allclose((c0[:, 0] + c0[:, 2]) / 2, 8.0, atol=1e-4)
    np.testing.assert_allclose((c0[:, 1] + c0[:, 3]) / 2, 8.0, atol=1e-4)
    # ordering is row-major over (h, w): anchor block 1 shifts x by stride
    c1 = g[24:48]
    np.testing.assert_allclose(c1[:, 0] - c0[:, 0], 16.0, atol=1e-4)


def test_decode_clip_boxes(rng):
    anchors = jnp.asarray(generate_anchor_grid(4, 4))
    deltas = jnp.asarray(rng.normal(0, 1, (1, len(anchors), 4)).astype(np.float32))
    boxes = decode_boxes(anchors, deltas)
    a = np.asarray(anchors)
    d = np.asarray(deltas)[0] * np.array([0.1, 0.1, 0.2, 0.2])
    w = a[:, 2] - a[:, 0]
    h = a[:, 3] - a[:, 1]
    cx = a[:, 0] + w / 2 + d[:, 0] * w
    cy = a[:, 1] + h / 2 + d[:, 1] * h
    nw = np.exp(d[:, 2]) * w
    np.testing.assert_allclose(np.asarray(boxes)[0, :, 0], cx - nw / 2, rtol=1e-4, atol=1e-3)
    clipped = np.asarray(clip_boxes(boxes, 64, 64))
    assert clipped[..., 0].min() >= 0 and clipped[..., 2].max() <= 64


@pytest.mark.parametrize("with_gt", [True, False])
def test_detection_loss_matches_oracle(rng, with_gt):
    anchors = generate_anchor_grid(7, 9).astype(np.float32)
    n = len(anchors)
    cls = rng.uniform(0.01, 0.5, (2, n, 2)).astype(np.float32)
    reg = rng.normal(0, 0.1, (2, n, 4)).astype(np.float32)
    if with_gt:
        ann = np.asarray(
            [
                [[20, 20, 80, 90, 1], [60, 50, 110, 100, 1]],
                [[10, 30, 70, 70, 1], [-1, -1, -1, -1, -1]],
            ],
            np.float32,
        )
    else:
        ann = -np.ones((2, 2, 5), np.float32)

    got_cls, got_reg = detection_loss(jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(anchors), jnp.asarray(ann))
    want_cls, want_reg = np_detection_loss(cls, reg, anchors, ann)
    np.testing.assert_allclose(float(got_cls), want_cls, rtol=1e-4)
    np.testing.assert_allclose(float(got_reg), want_reg, rtol=1e-4, atol=1e-6)


@pytest.fixture(scope="module")
def small_model():
    cfg = default_config()
    cfg.model.img_h, cfg.model.img_w = 128, 160
    cfg.model.heatmap_h, cfg.model.heatmap_w = 7, 9
    cfg.dataset.img_h, cfg.dataset.img_w = 128, 160
    from ossid_code_tpu.models.dtoid.module import DtoidModel

    return DtoidModel(cfg, seed=0)


def _small_batch(rng, b=1):
    h, w, ts = 128, 160, 124
    return {
        "img": rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32),
        "limg": rng.uniform(0, 1, (b, ts, ts, 3)).astype(np.float32),
        "lmask": (rng.uniform(0, 1, (b, ts, ts, 1)) > 0.5).astype(np.float32),
        "gimg": rng.uniform(0, 1, (b, ts, ts, 3)).astype(np.float32),
        "gmask": (rng.uniform(0, 1, (b, ts, ts, 1)) > 0.5).astype(np.float32),
        "bbox_gt": np.asarray([[[30, 40, 90, 100, 1]]] * b, np.float32),
        "heatmap": rng.uniform(0, 1, (b, 7, 9, 1)).astype(np.float32),
        "mask": (rng.uniform(0, 1, (b, h, w, 1)) > 0.8).astype(np.float32),
    }


def test_dtoid_forward_shapes(small_model, rng):
    m = small_model
    out = m._eval_forward(m.params, m.batch_stats, {k: jnp.asarray(v) for k, v in _small_batch(rng).items()})
    n_anchors = 7 * 9 * 24
    assert out["classifications"].shape == (1, n_anchors, 2)
    assert out["regressions"].shape == (1, n_anchors, 4)
    assert out["heat_map"].shape == (1, 7, 9, 1)
    assert out["seg_logits"].shape == (1, 128, 160, 1)
    # zero-init heads + prior bias -> cls prob ~= 0.01 everywhere at init
    np.testing.assert_allclose(np.asarray(out["classifications"]), 0.01, atol=1e-3)


def test_dtoid_train_step_reduces_loss(small_model, rng):
    m = small_model
    batch = _small_batch(rng)
    losses = [m.train_step(batch)["loss"] for _ in range(4)]
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_dtoid_infer_and_cache(small_model, rng):
    m = small_model
    t = 4
    batch = {
        "img": rng.uniform(0, 1, (128, 160, 3)).astype(np.float32),
        "obj_id": 7,
        "limg": rng.uniform(0, 1, (t, 124, 124, 3)).astype(np.float32),
        "lmask": (rng.uniform(0, 1, (t, 124, 124)) > 0.5).astype(np.float32),
        "mask": (rng.uniform(0, 1, (128, 160)) > 0.8).astype(np.float32),
    }
    out = m.forward_test_time(batch, topk=50)
    assert out["pred_bbox"].shape == (50, 4)
    assert out["pred_scores"].shape == (50,)
    assert out["segmentation"].shape == (128, 160)
    assert out["pred_template_ids"].max() < t
    assert 0.0 <= out["seg_IoU"] <= 1.0
    assert 7 in m.template_feature_cache
    # cached second call gives identical results
    out2 = m.forward_test_time(batch, topk=50)
    np.testing.assert_allclose(out["pred_scores"], out2["pred_scores"], rtol=1e-5)
    m.clear_cache()
    assert not m.template_feature_cache


def test_bf16_infer_close_to_f32(small_model, rng):
    """Opt-in bf16 inference (model.bf16_infer): same weights, same inputs —
    boxes within ~2 px and top scores within a few % of the f32 path (ranking/
    decode/NMS stay f32 inside detect)."""
    from ossid_code_tpu.core.config import default_config
    from ossid_code_tpu.models.dtoid.module import DtoidModel

    m32 = small_model
    cfg = default_config()
    cfg.model.img_h, cfg.model.img_w = 128, 160
    cfg.model.heatmap_h, cfg.model.heatmap_w = 7, 9
    cfg.dataset.img_h, cfg.dataset.img_w = 128, 160
    cfg.model.bf16_infer = True
    m16 = DtoidModel(cfg, seed=0)
    m16.load_state_dict(m32.state_dict())

    t = 4
    batch = {
        "img": rng.uniform(0, 1, (128, 160, 3)).astype(np.float32),
        "obj_id": 3,
        "limg": rng.uniform(0, 1, (t, 124, 124, 3)).astype(np.float32),
        "lmask": (rng.uniform(0, 1, (t, 124, 124)) > 0.5).astype(np.float32),
    }
    o32 = m32.forward_test_time(dict(batch), topk=20)
    o16 = m16.forward_test_time(dict(batch), topk=20)
    assert o16["pred_bbox"].dtype == np.float32
    # sorted score vectors agree (individual box identity can flip on ties)
    np.testing.assert_allclose(
        o16["pred_scores"][:10], o32["pred_scores"][:10], atol=0.05
    )
    # segmentation maps mostly agree at the 0.5 threshold
    agree = np.mean((o16["segmentation"] > 0.5) == (o32["segmentation"] > 0.5))
    assert agree > 0.98


def test_template_features_shapes(small_model, rng):
    m = small_model
    local, glob = m._template_features(
        m.params, m.batch_stats,
        jnp.asarray(rng.uniform(0, 1, (3, 124, 124, 3)).astype(np.float32)),
        jnp.asarray((rng.uniform(0, 1, (3, 124, 124, 1)) > 0.5).astype(np.float32)),
    )
    assert local.shape == (3, 7, 7, 640)
    assert glob.shape == (1, 3, 3, 64)


def test_bf16_finetune_close_to_f32(small_model, rng):
    """Opt-in mixed-precision finetune (model.bf16_finetune): bf16
    forward/backward, f32 master weights/optimizer. From identical weights,
    one step must move in the same direction as the f32 step (loss scale
    agrees to a few %), the returned params/stats must stay f32, and repeated
    steps must keep reducing the loss."""
    from ossid_code_tpu.core.config import default_config
    from ossid_code_tpu.models.dtoid.module import DtoidModel

    m32 = small_model
    cfg = default_config()
    cfg.model.img_h, cfg.model.img_w = 128, 160
    cfg.model.heatmap_h, cfg.model.heatmap_w = 7, 9
    cfg.dataset.img_h, cfg.dataset.img_w = 128, 160
    cfg.model.bf16_finetune = True
    m16 = DtoidModel(cfg, seed=0)
    m16.load_state_dict(m32.state_dict())
    sd0 = m32.state_dict()

    batch = _small_batch(rng)
    l32 = [m32.train_step(batch)["loss"] for _ in range(3)]
    # restore so the module-scoped f32 fixture is unchanged for later tests
    m32.load_state_dict(sd0)
    m32.reset_optimizer()
    l16 = [m16.train_step(batch)["loss"] for _ in range(3)]

    assert np.isfinite(l16).all()
    assert l16[-1] < l16[0]  # it trains
    # step-1 losses computed from IDENTICAL weights: bf16 rounding only
    np.testing.assert_allclose(l16[0], l32[0], rtol=0.05)
    # master state stays f32
    leaves = jax.tree_util.tree_leaves((m16.params, m16.batch_stats))
    assert all(l.dtype == jnp.float32 for l in leaves if jnp.issubdtype(l.dtype, jnp.floating))


def test_seg_half_finetune_step(small_model, rng):
    """Opt-in half-resolution seg supervision (model.seg_loss_half): the
    decoder emits (H/2, W/2) logits and the BCE target is the exact 2x2 mean
    of the mask. The step must train, and the non-seg loss terms must match
    the full-res step exactly from identical weights (only loss_seg changes
    supervision resolution)."""
    from ossid_code_tpu.core.config import default_config
    from ossid_code_tpu.models.dtoid.module import DtoidModel

    m_full = small_model
    cfg = default_config()
    cfg.model.img_h, cfg.model.img_w = 128, 160
    cfg.model.heatmap_h, cfg.model.heatmap_w = 7, 9
    cfg.dataset.img_h, cfg.dataset.img_w = 128, 160
    cfg.model.seg_loss_half = True
    m_half = DtoidModel(cfg, seed=0)
    m_half.load_state_dict(m_full.state_dict())
    sd0 = m_full.state_dict()

    batch = _small_batch(rng)
    full0 = m_full.train_step(batch)
    m_full.load_state_dict(sd0)
    m_full.reset_optimizer()
    half = [m_half.train_step(batch) for _ in range(3)]

    assert np.isfinite([h["loss"] for h in half]).all()
    assert half[-1]["loss"] < half[0]["loss"]  # it trains
    # identical weights: heatmap/cls/reg terms are untouched by the seg path
    for k in ("loss_center", "loss_cls", "loss_reg"):
        np.testing.assert_allclose(half[0][k], full0[k], rtol=1e-4, err_msg=k)
    # seg term close (the mask is piecewise-flat, so 2x2 pooling is mild)
    np.testing.assert_allclose(half[0]["loss_seg"], full0["loss_seg"], rtol=0.2)
    # inference decodes FULL resolution regardless of the train-time flag
    out = m_half.forward_test_time({
        "img": batch["img"][0], "obj_id": 77,
        "limg": batch["limg"], "lmask": batch["lmask"],
    })
    assert int(np.prod(out["segmentation"].shape)) == 128 * 160


def test_packed_fetch_equivalence(small_model, rng, monkeypatch):
    """Single-buffer detection transport (OSSID_PACKED_FETCH / network.detect
    pack_all) must be bit-identical to the multi-buffer dict: same scores,
    boxes, template ids, valid mask, heat map, and segmentation bits."""
    from ossid_code_tpu.core.config import default_config
    from ossid_code_tpu.models.dtoid.module import DtoidModel

    t = 4
    batch = {
        "img": rng.uniform(0, 1, (128, 160, 3)).astype(np.float32),
        "obj_id": 5,
        "limg": rng.uniform(0, 1, (t, 124, 124, 3)).astype(np.float32),
        "lmask": (rng.uniform(0, 1, (t, 124, 124)) > 0.5).astype(np.float32),
    }

    def build(packed):
        monkeypatch.setenv("OSSID_PACKED_FETCH", "1" if packed else "0")
        cfg = default_config()
        cfg.model.img_h, cfg.model.img_w = 128, 160
        cfg.model.heatmap_h, cfg.model.heatmap_w = 7, 9
        cfg.dataset.img_h, cfg.dataset.img_w = 128, 160
        m = DtoidModel(cfg, seed=0)
        m.load_state_dict(small_model.state_dict())
        return m

    mp = build(True)
    mu = build(False)
    dev = mp.detect_async(dict(batch), topk=50)
    assert set(dev.keys()) == {"packed"}, "packed mode must ship ONE buffer"
    assert dev["packed"].dtype == jnp.uint8
    op = mp.forward_test_time(dict(batch), topk=50)
    ou = mu.forward_test_time(dict(batch), topk=50)
    np.testing.assert_array_equal(op["pred_scores"], ou["pred_scores"])
    np.testing.assert_array_equal(op["pred_bbox"], ou["pred_bbox"])
    np.testing.assert_array_equal(op["pred_template_ids"], ou["pred_template_ids"])
    np.testing.assert_array_equal(op["valid"], ou["valid"])
    np.testing.assert_array_equal(op["heat_map"], ou["heat_map"])
    np.testing.assert_array_equal(op["segmentation"], ou["segmentation"])
