"""Fused PointNet++ SetAbstraction inference for the Zephyr scorer.

The scorer's hot path (score program, ref call site scripts/
online_learning.py:461-464 via zephyr's PointNet2SSG) is two SetAbstraction
stages: gather the grouped point tensor (M, S, k, C), run a 3-layer 1x1-conv
MLP with BatchNorm+ReLU, and max-reduce over the k group members. In the
plain XLA lowering every MLP layer materializes its (M, S, k, C) activation
in HBM — at M=512 that is ~9 GB of round-trip traffic for ~1.1 TFLOP of
arithmetic, i.e. the stage is bandwidth-bound an order of magnitude below
the MXU roofline.

This module provides the inference-only fused path:

  * BatchNorm folds into the preceding (bias-free) conv at trace time —
    y = s*(Wx) + b with s = scale/sqrt(var+eps), b = bias - mean*s — so the
    chain becomes matmul+bias+relu x3;
  * a pallas kernel runs the whole folded chain + k-max per block of groups
    entirely in VMEM: HBM traffic drops to one read of the grouped input and
    one write of the (M, S, C_out) output;
  * `pointnet2_fused_apply` re-implements PointNet2SSG.__call__ (inference,
    static precomputed grouping — see models/zephyr/pointnet2.py) on top of
    it; SA3 + the FC head are plain dense chains over (M, 128) points and
    stay in XLA.

The pallas path needs a real TPU; on CPU (the test mesh) `mlp_max` falls
back to an equivalent jnp chain, and a golden test pins the fused forward to
flax `net.apply` (tests/test_zephyr_fused.py).

MEASURED NEGATIVE (real v5e chip, scripts/ab_scorer.py): the fused path is
0.62-0.88x of plain XLA across M in {128, 512} x {f32, bf16} — XLA's own
fusion of the conv+BN+ReLU chain plus its gather lowering beats this kernel's
block schedule (the grouped gather has to happen OUTSIDE the kernel, so the
kernel only saves the inter-layer activations, and its k-padded VMEM tiles
waste MXU cycles that XLA's tighter tiling does not). Kept opt-in
(OSSID_FUSED_SCORER=1) as the documented experiment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-5  # flax nn.BatchNorm default


def fold_bn(kernel2d, scale, bias, mean, var, dtype):
    """Fold an inference BatchNorm into the preceding bias-free matmul.

    kernel2d (Cin, Cout); returns (W (Cin, Cout) in `dtype`, b (Cout,) f32).
    """
    s = scale.astype(jnp.float32) / jnp.sqrt(var.astype(jnp.float32) + _EPS)
    w = kernel2d.astype(jnp.float32) * s[None, :]
    b = bias.astype(jnp.float32) - mean.astype(jnp.float32) * s
    return w.astype(dtype), b


def _mlp_max_ref(grouped, Ws, bs):
    """jnp reference: relu(x@W+b) chain over (..., k, Cin), max over k."""
    x = grouped
    for w, b in zip(Ws, bs):
        x = jnp.maximum(
            jnp.einsum("bskc,cd->bskd", x, w,
                       preferred_element_type=jnp.float32) + b, 0.0
        ).astype(grouped.dtype)
    return jnp.max(x, axis=2)


def _mlp_max_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                    o_ref):
    g, k, cin = x_ref.shape
    dt = x_ref.dtype
    x = x_ref[:].reshape(g * k, cin)
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:], 0.0).astype(dt)
    h = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b2_ref[:], 0.0).astype(dt)
    h = jnp.dot(h, w3_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b3_ref[:], 0.0)
    o_ref[:] = jnp.max(h.reshape(g, k, -1), axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("use_pallas", "block_groups"))
def mlp_max(grouped, Ws, bs, use_pallas: bool = False, block_groups: int = 64):
    """(B, S, k, Cin) -> (B, S, Cout): folded MLP chain + max over k.

    Ws: 3 matrices (Cin_i, Cout_i); bs: 3 f32 biases (Cout_i,).
    use_pallas=True runs the VMEM-fused kernel (TPU only); otherwise an
    equivalent XLA chain.
    """
    B, S, k, cin = grouped.shape
    n = B * S
    if not use_pallas or n % block_groups != 0:
        return _mlp_max_ref(grouped, Ws, bs)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cout = Ws[2].shape[1]
    x = grouped.reshape(n, k, cin)
    g = block_groups
    wb_specs, wb_args = [], []
    for w, b in zip(Ws, bs):
        wb_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b.shape[0]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        wb_args += [w, b.reshape(1, -1)]
    out = pl.pallas_call(
        _mlp_max_kernel,
        grid=(n // g,),
        in_specs=[pl.BlockSpec((g, k, cin), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] + wb_specs,
        out_specs=pl.BlockSpec((g, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, cout), grouped.dtype),
    )(x, *wb_args)
    return out.reshape(B, S, cout)


def _fold_stage(params, batch_stats, stage: str, dtype):
    Ws, bs = [], []
    for i in range(3):
        w, b = fold_bn(
            params[stage][f"mlp{i}"]["kernel"][0, 0],
            params[stage][f"bn{i}"]["scale"], params[stage][f"bn{i}"]["bias"],
            batch_stats[stage][f"bn{i}"]["mean"],
            batch_stats[stage][f"bn{i}"]["var"], dtype)
        Ws.append(w)
        bs.append(b)
    return tuple(Ws), tuple(bs)


def pointnet2_fused_apply(params, batch_stats, point_x, static_idx,
                          use_pallas: bool = False):
    """Inference-equivalent of PointNet2SSG.apply with static grouping.

    point_x (M, N, 11) (first 3 channels xyz); static_idx as built by
    ZephyrModel.prepare_object: {'sa1': (cidx, gidx), 'sa2': (cidx, gidx)}.
    Returns per-hypothesis logits (M,). BatchNorms fold into the matmuls
    (inference statistics), so use only with train=False semantics.
    """
    dt = point_x.dtype
    xyz = point_x[..., :3]
    feats = point_x[..., 3:]
    sa1c, sa1g = static_idx["sa1"]
    sa2c, sa2g = static_idx["sa2"]

    # SA1: group raw points around the sa1 centers
    new_xyz = xyz[:, sa1c]  # (M, S1, 3)
    grouped = jnp.concatenate(
        [xyz[:, sa1g] - new_xyz[:, :, None, :], feats[:, sa1g]], axis=-1)
    Ws, bs = _fold_stage(params, batch_stats, "sa1", dt)
    f1 = mlp_max(grouped, Ws, bs, use_pallas=use_pallas)  # (M, S1, 128)

    # SA2: group the SA1 centers
    xyz2 = new_xyz[:, sa2c]  # (M, S2, 3)
    grouped2 = jnp.concatenate(
        [new_xyz[:, sa2g] - xyz2[:, :, None, :], f1[:, sa2g]], axis=-1)
    Ws, bs = _fold_stage(params, batch_stats, "sa2", dt)
    f2 = mlp_max(grouped2, Ws, bs, use_pallas=use_pallas)  # (M, S2, 256)

    # SA3 (global) + FC head: small dense chains, plain XLA
    x = jnp.concatenate([xyz2, f2], axis=-1)  # (M, S2, 259)
    Ws, bs = _fold_stage(params, batch_stats, "sa3", dt)
    for w, b in zip(Ws, bs):
        x = jnp.maximum(
            jnp.einsum("msc,cd->msd", x, w,
                       preferred_element_type=jnp.float32) + b, 0.0
        ).astype(dt)
    g = jnp.max(x, axis=1)  # (M, 1024)

    for name in ("fc1", "fc2"):
        w, b = fold_bn(
            params[name]["kernel"], params[f"bn_{name}"]["scale"],
            params[f"bn_{name}"]["bias"], batch_stats[f"bn_{name}"]["mean"],
            batch_stats[f"bn_{name}"]["var"], dt)
        g = jnp.maximum(
            jnp.dot(g, w, preferred_element_type=jnp.float32) + b, 0.0
        ).astype(dt)
    out = (jnp.dot(g, params["fc3"]["kernel"].astype(dt),
                   preferred_element_type=jnp.float32)
           + params["fc3"]["bias"].astype(jnp.float32))
    return out[..., 0]
