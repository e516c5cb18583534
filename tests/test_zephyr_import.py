"""Zephyr PointNet2SSG torch-checkpoint import/export roundtrip
(ref scripts/online_learning.py:212-227 loads such ckpts; VERDICT r1 item 3)."""

import os
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_model():
    from ossid_code_tpu.models.zephyr.module import ZephyrModel

    return ZephyrModel(num_points=64, seed=3)


def _tree_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_allclose(a[k], b[k], err_msg=f"{path}/{k}")


def test_export_import_roundtrip(small_model):
    from ossid_code_tpu.models.zephyr.torch_import import (
        convert_pointnet2_state_dict, export_pointnet2_state_dict,
    )
    import jax

    params = jax.device_get(small_model.params)
    bstats = jax.device_get(small_model.batch_stats)
    sd = export_pointnet2_state_dict(params, bstats)

    # torch-side key layout sanity (erikwijmans SharedMLP / etw FC naming)
    assert "SA_modules.0.mlps.0.layer0.conv.weight" in sd
    assert "SA_modules.2.mlps.0.layer2.bn.bn.running_var" in sd
    assert "FC_layer.0.fc.weight" in sd and "FC_layer.4.fc.bias" in sd
    assert sd["SA_modules.0.mlps.0.layer0.conv.weight"].shape[2:] == (1, 1)
    assert sd["FC_layer.0.fc.weight"].shape == (512, 1024)

    back = convert_pointnet2_state_dict(sd)
    _tree_equal(back["params"], params)
    _tree_equal(back["batch_stats"], bstats)


def test_import_accepts_lightning_prefix_and_flat_bn(small_model):
    from ossid_code_tpu.models.zephyr.torch_import import (
        convert_pointnet2_state_dict, export_pointnet2_state_dict,
    )
    import jax

    sd = export_pointnet2_state_dict(
        jax.device_get(small_model.params), jax.device_get(small_model.batch_stats)
    )
    # Lightning 'model.' prefix + single-.bn. nesting variant
    sd2 = {("model." + k).replace(".bn.bn.", ".bn."): v for k, v in sd.items()}
    back = convert_pointnet2_state_dict(sd2)
    _tree_equal(back["params"], jax.device_get(small_model.params))


def test_load_checkpoint_dispatches_zephyr_torch_file(tmp_path, small_model):
    torch = pytest.importorskip("torch")
    from ossid_code_tpu.core.checkpoint import load_checkpoint
    from ossid_code_tpu.models.zephyr.torch_import import export_pointnet2_state_dict
    import jax

    sd = export_pointnet2_state_dict(
        jax.device_get(small_model.params), jax.device_get(small_model.batch_stats)
    )
    path = str(tmp_path / "final_lmo.ckpt")
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}}, path)

    state = load_checkpoint(path)
    _tree_equal(state["params"], jax.device_get(small_model.params))
    _tree_equal(state["batch_stats"], jax.device_get(small_model.batch_stats))


def test_save_checkpoint_torch_format_roundtrip(tmp_path):
    """save_checkpoint(torch_format=True) writes a file torch.load reads with
    the exact reference names, and load_checkpoint reads it back bit-exact —
    including a scorer WITH the calibrated align head (VERDICT r4 item 6):
    the TPU-only head is stripped on export (no reference analogue) and
    re-injected as zeros on align_feats import, everything else round-trips."""
    torch = pytest.importorskip("torch")
    import jax
    from ossid_code_tpu.core.checkpoint import save_checkpoint, load_checkpoint
    from ossid_code_tpu.models.zephyr.module import ZephyrModel

    m = ZephyrModel(num_points=64, seed=7, align_feats=True)
    state = {"params": jax.device_get(m.params),
             "batch_stats": jax.device_get(m.batch_stats)}
    # give the align head non-zero calibration so stripping is actually tested
    state["params"]["align_head"] = {
        k: np.full_like(np.asarray(v), 0.5)
        for k, v in state["params"]["align_head"].items()
    }
    path = str(tmp_path / "exported.ckpt")
    save_checkpoint(path, state, extra={"iteration": 3}, torch_format=True)

    raw = torch.load(path, map_location="cpu", weights_only=False)
    assert raw["iteration"] == 3
    assert "SA_modules.0.mlps.0.layer0.conv.weight" in raw["state_dict"]
    assert not any("align" in k for k in raw["state_dict"])  # stripped

    back = load_checkpoint(path, align_feats=True)
    ref = {k: v for k, v in state["params"].items() if k != "align_head"}
    got = {k: v for k, v in back["params"].items() if k != "align_head"}
    _tree_equal(got, ref)
    _tree_equal(back["batch_stats"], state["batch_stats"])
    assert not np.any(back["params"]["align_head"]["kernel"])  # zero-injected


def test_imported_weights_reproduce_scores(tmp_path, small_model):
    """A scorer loaded from an exported ckpt scores identically."""
    torch = pytest.importorskip("torch")
    from ossid_code_tpu.core.checkpoint import load_checkpoint
    from ossid_code_tpu.models.zephyr.module import ZephyrModel
    from ossid_code_tpu.models.zephyr.torch_import import export_pointnet2_state_dict
    import jax

    sd = export_pointnet2_state_dict(
        jax.device_get(small_model.params), jax.device_get(small_model.batch_stats)
    )
    path = str(tmp_path / "z.ckpt")
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}}, path)

    rng = np.random.default_rng(0)
    pts = rng.normal(0, 0.03, (256, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (256, 3)).astype(np.float32)
    nrms = np.tile(np.asarray([[0, 0, -1.0]], np.float32), (256, 1))
    poses = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    poses[:, 2, 3] = 0.5
    data = {
        "img": (rng.uniform(0, 1, (48, 64, 3)) * 255).astype(np.uint8),
        "depth": np.full((48, 64), 500, np.uint16),
        "cam_K": np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32),
        "model_points": pts, "model_colors": cols, "model_normals": nrms,
        "pose_hypos": poses,
    }
    ref_scores = small_model.score_hypotheses(dict(data), obj_id=1)["scores"]

    fresh = ZephyrModel(num_points=64, seed=99)
    fresh.load_state_dict(load_checkpoint(path))
    got = fresh.score_hypotheses(dict(data), obj_id=1)["scores"]
    np.testing.assert_allclose(got, ref_scores, rtol=1e-5, atol=1e-5)


def test_align_feats_import_pads_fc1_and_preserves_scores():
    """Reference checkpoints predate the residual alignment head:
    convert(..., align_feats=True) injects a zero align_head kernel, so an
    align_feats scorer loaded from a reference ckpt reproduces the reference
    scores exactly (the head only contributes after finetuning)."""
    import jax
    import numpy as np
    from ossid_code_tpu.models.zephyr.module import ZephyrModel
    from ossid_code_tpu.models.zephyr.torch_import import (
        convert_pointnet2_state_dict, export_pointnet2_state_dict,
    )

    base = ZephyrModel(num_points=64, seed=5, need_uv=False)
    sd = export_pointnet2_state_dict(
        jax.device_get(base.params), jax.device_get(base.batch_stats))

    am = ZephyrModel(num_points=64, seed=11, need_uv=False, align_feats=True)
    from ossid_code_tpu.models.zephyr.pointnet2 import ALIGN_TAU_D, ALIGN_TAU_H

    conv = convert_pointnet2_state_dict(sd, align_feats=True)
    # the residual alignment head gets a zero kernel injected
    n_stats = len(ALIGN_TAU_D) * len(ALIGN_TAU_H)
    assert conv["params"]["align_head"]["kernel"].shape == (n_stats, 1)
    assert not conv["params"]["align_head"]["kernel"].any()
    am.load_state_dict(conv)

    rng = np.random.default_rng(0)
    data = {
        "img": rng.integers(0, 255, (32, 40, 3), dtype=np.uint8),
        "depth": rng.uniform(0.3, 1.0, (32, 40)).astype(np.float32),
        "cam_K": np.array([[40.0, 0, 20], [0, 40.0, 16], [0, 0, 1]]),
        "model_points": rng.normal(0, 0.03, (64, 3)).astype(np.float32),
        "model_colors": rng.random((64, 3)).astype(np.float32),
        "model_normals": np.tile([0, 0, 1.0], (64, 1)).astype(np.float32),
        "pose_hypos": np.tile(np.eye(4, dtype=np.float32), (5, 1, 1)),
    }
    data["pose_hypos"][:, 2, 3] = np.linspace(0.4, 0.8, 5)
    s_base = base.score_hypotheses(dict(data), obj_id=1)["scores"]
    s_align = am.score_hypotheses(dict(data), obj_id=1)["scores"]
    np.testing.assert_allclose(s_align, s_base, rtol=1e-5, atol=1e-5)


def test_alignment_fractions_match_numpy():
    import numpy as np
    import jax.numpy as jnp
    from ossid_code_tpu.models.zephyr.pointnet2 import (
        alignment_fractions, ALIGN_TAU_D, ALIGN_TAU_H,
    )

    rng = np.random.default_rng(3)
    px = rng.normal(0, 0.05, (6, 50, 11)).astype(np.float32)
    px[..., 3] = rng.uniform(0, 0.5, (6, 50))     # hue diff
    px[..., 6] = rng.uniform(-0.1, 0.1, (6, 50))  # depth diff
    px[..., 10] = (rng.random((6, 50)) > 0.3).astype(np.float32)

    got = np.asarray(alignment_fractions(jnp.asarray(px)))
    assert got.shape == (6, len(ALIGN_TAU_D) * len(ALIGN_TAU_H))
    k = 0
    for td in ALIGN_TAU_D:
        for th in ALIGN_TAU_H:
            ok = px[..., 10]
            want = (ok * (np.abs(px[..., 6]) < td) * (px[..., 3] < th)).sum(-1)
            want = want / np.maximum(ok.sum(-1), 1.0)
            np.testing.assert_allclose(got[:, k], want, rtol=1e-5, atol=1e-6)
            k += 1
