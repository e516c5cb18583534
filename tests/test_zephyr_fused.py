"""Parity tests for the fused (BN-folded) scorer inference path.

The fused forward (ops/sa_fused.py) must reproduce the flax PointNet2SSG
inference forward exactly (modulo float re-association): same logits from
the same weights, on realistic non-init batch statistics. The pallas kernel
itself is pinned to the jnp reference chain in interpreter mode (no TPU in
CI; the on-chip path shares all the math with the interpreted one).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ossid_code_tpu.models.zephyr.pointnet2 import PointNet2SSG
from ossid_code_tpu.models.zephyr.module import ZephyrModel, _fps_np, _ball_np
from ossid_code_tpu.ops.sa_fused import (
    pointnet2_fused_apply, mlp_max, _mlp_max_ref,
)


def _randomize_stats(variables, rng):
    """Init batch_stats are mean=0/var=1, which would hide BN-fold bugs;
    perturb them (and scales/biases) to exercise the fold."""

    def perturb(tree, lo, hi):
        return jax.tree_util.tree_map(
            lambda a: jnp.asarray(rng.uniform(lo, hi, a.shape), a.dtype), tree)

    params = dict(variables["params"])
    stats = jax.tree_util.tree_map(lambda a: a, variables["batch_stats"])
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(0, 0.5, a.shape) ** 2 + 0.3, a.dtype)
        if a.shape else a, stats)
    for k in list(params):
        if k.startswith("bn"):
            params[k] = perturb(params[k], 0.5, 1.5)
    for sa in ("sa1", "sa2", "sa3"):
        sub = dict(params[sa])
        for k in list(sub):
            if k.startswith("bn"):
                sub[k] = perturb(sub[k], 0.5, 1.5)
        params[sa] = sub
    return {"params": params, "batch_stats": stats}


def _static_idx(rng, n):
    pts = rng.normal(0, 0.3, (n, 3)).astype(np.float32)
    sa1_n, sa2_n = min(512, n), min(128, n)
    sa1c = np.arange(sa1_n, dtype=np.int32) if sa1_n == n else _fps_np(pts, sa1_n)
    c1 = pts[sa1c]
    sa1g = _ball_np(c1, pts, 0.4, min(64, n)).astype(np.int32)
    sa2c = _fps_np(c1, sa2_n).astype(np.int32)
    sa2g = _ball_np(c1[sa2c], c1, 0.8, 64).astype(np.int32)
    return {"sa1": (jnp.asarray(sa1c.astype(np.int32)), jnp.asarray(sa1g)),
            "sa2": (jnp.asarray(sa2c), jnp.asarray(sa2g))}


def test_fused_matches_flax_inference():
    rng = np.random.default_rng(0)
    n = 256
    net = PointNet2SSG(num_class=1, dim_point=11)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((2, n, 11)),
                         train=False)
    variables = _randomize_stats(variables, rng)
    static_idx = _static_idx(rng, n)

    point_x = jnp.asarray(rng.normal(0, 0.5, (4, n, 11)).astype(np.float32))
    ref = np.asarray(net.apply(variables, point_x, train=False,
                               static_idx=static_idx))
    fused = np.asarray(pointnet2_fused_apply(
        variables["params"], variables["batch_stats"], point_x, static_idx,
        use_pallas=False))
    np.testing.assert_allclose(fused, ref, rtol=2e-4, atol=2e-4)


def test_mlp_max_pallas_interpret_matches_ref():
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(1)
    grouped = jnp.asarray(rng.normal(0, 1, (2, 64, 8, 11)).astype(np.float32))
    Ws = tuple(jnp.asarray(rng.normal(0, 0.3, s).astype(np.float32))
               for s in ((11, 64), (64, 64), (64, 128)))
    bs = tuple(jnp.asarray(rng.normal(0, 0.3, (c,)).astype(np.float32))
               for c in (64, 64, 128))
    ref = np.asarray(_mlp_max_ref(grouped, Ws, bs))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(mlp_max(grouped, Ws, bs, use_pallas=True,
                                 block_groups=32))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_fused_scorer_model_parity(monkeypatch):
    """ZephyrModel with OSSID_FUSED_SCORER=1 (jnp fallback on CPU) returns
    the same scores and winner as the flax path from identical weights."""
    rng = np.random.default_rng(2)
    h, w = 48, 64
    data = {
        "img": (rng.uniform(0, 1, (h, w, 3)) * 255).astype(np.uint8),
        "depth": (rng.uniform(0.5, 2.0, (h, w)) * 1000).astype(np.uint16),
        "cam_K": np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]],
                          np.float32),
        "model_points": rng.normal(0, 0.1, (300, 3)).astype(np.float32),
        "model_colors": rng.uniform(0, 1, (300, 3)).astype(np.float32),
        "model_normals": np.tile(np.array([[0, 0, -1.0]], np.float32),
                                 (300, 1)),
        "pose_hypos": np.stack([np.eye(4, dtype=np.float32)] * 5),
    }
    for i in range(5):
        data["pose_hypos"][i, 2, 3] = 1.0 + 0.1 * i

    base = ZephyrModel(num_points=128, seed=0, need_uv=False)
    out_ref = base.score_hypotheses(data, obj_id=7)

    monkeypatch.setenv("OSSID_FUSED_SCORER", "1")
    fused = ZephyrModel(num_points=128, seed=0, need_uv=False)
    fused.load_state_dict(base.state_dict())
    out_fused = fused.score_hypotheses(data, obj_id=7)

    np.testing.assert_allclose(out_fused["scores"], out_ref["scores"],
                               rtol=2e-4, atol=2e-4)
    assert out_fused["pred_idx"] == out_ref["pred_idx"]
