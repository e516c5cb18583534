"""Device mesh + sharding helpers.

The reference's only multi-device strategy is NCCL data-parallel training
(SURVEY.md §2.4: Lightning DDP, ref train.py:95-96, plus torch.distributed
helpers at ref datasets/detect_dataset/utils.py:288-310). The TPU-native
equivalent is a 1-D `jax.sharding.Mesh` over ICI with batch-sharded inputs and
replicated parameters — XLA inserts the psum for gradient reduction
automatically when the loss is averaged over the global batch.

The same mesh carries the inference-side axes: hypothesis-parallel zephyr
scoring and template-parallel detection shard their leading batch dimension
the same way (`shard_batch`).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis_name,))


def shard_batch(mesh: Mesh, tree, axis_name: str = "dp"):
    """Place a pytree of arrays with the leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (parameters/optimizer state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_pspec(axis_name: str = "dp") -> P:
    return P(axis_name)


# ---------------------------------------------------------------------------
# Inference-side parallel axes (SURVEY.md §2.4: the framework's scalable axes
# are data-parallel finetuning, template-parallel detection, and
# hypothesis-parallel scoring — all leading-batch shardings on one mesh)
# ---------------------------------------------------------------------------

def make_template_parallel_forward(dtoid_model, mesh, axis_name: str = "dp"):
    """Template-parallel DTOID forward: the T local templates shard over the
    mesh (each device correlates its slice against the replicated image
    features). Returns fn(image, local_feats, global_feat) -> per-template
    head outputs."""
    import jax
    from ossid_code_tpu.models.dtoid.network import DtoidNetwork

    repl = NamedSharding(mesh, P())
    tshard = NamedSharding(mesh, P(axis_name))
    net = dtoid_model.net
    params, batch_stats = dtoid_model.params, dtoid_model.batch_stats

    def fwd(image, local_feats, global_feat):
        return net.apply(
            {"params": params, "batch_stats": batch_stats},
            image, local_feats, global_feat,
            method=DtoidNetwork.forward_all_templates,
        )

    return jax.jit(fwd, in_shardings=(repl, tshard, repl))


def make_hypothesis_parallel_scorer(zephyr_model, mesh, axis_name: str = "dp"):
    """Hypothesis-parallel Zephyr scoring: the M pose hypotheses shard over
    the mesh; frame data and model cloud are replicated. Returns
    fn(img, depth_u16, depth_origin, cam_K, pts, cols, nrms, sa1c, sa1g, sa2c,
    sa2g, ricp_pts, ricp_nrms, poses, valid) ->
    (scores, raw_scores, uv, inconst, align_stat, refined) with sharded
    outputs."""
    import jax

    repl = NamedSharding(mesh, P())
    hshard = NamedSharding(mesh, P(axis_name))
    score = zephyr_model._score

    # re-jit the underlying pure function with shardings
    fn = getattr(score, "__wrapped__", score)
    return jax.jit(
        fn,
        in_shardings=(
            repl, repl,  # params, batch_stats (pytrees -> replicated)
            repl, repl, repl, repl,  # img, depth, depth_origin, K
            repl, repl, repl,  # model points/colors/normals
            repl, repl, repl, repl,  # grouping indices
            repl, repl,  # refinement cloud points/normals
            hshard, hshard,  # poses, valid
        ),
    )


# ---------------------------------------------------------------------------
# 2-D mesh: multi-camera serving farm (frames x templates)
# ---------------------------------------------------------------------------

def make_mesh_2d(dp: int, tp: int, axis_names=("dp", "tp")) -> Mesh:
    """2-D device mesh: `dp` frame-parallel groups x `tp` template-parallel
    chips per group. Lay dp on the outer mesh dim so template-parallel
    collectives (the argmax over template shards inside a group) ride the
    faster inner ICI links."""
    devs = jax.devices()
    if dp * tp > len(devs):
        raise ValueError(f"requested {dp}x{tp} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[: dp * tp]).reshape(dp, tp), axis_names)


def make_serving_farm_forward(dtoid_model, mesh, axes=("dp", "tp")):
    """Production serving on a 2-D mesh: a batch of F camera frames shards
    over `axes[0]` while the T templates shard over `axes[1]` — every chip
    correlates its template slice against its frame slice; XLA broadcasts
    the (replicated-within-group) image features and keeps all head outputs
    sharded on both axes. No reference analog (the reference serves one
    frame on one GPU, SURVEY §2.4); this is the scale-out shape of the
    zero-shot detector for multi-camera deployments.

    Returns fn(images (F, H, W, 3) float [0,1], local_feats (T, 7, 7, 640),
    global_feat (1, 3, 3, 64)) -> per-frame-per-template head outputs
    (cls (F, T, N, 2), reg (F, T, N, 4), heatmap (F, T, fh, fw, 1),
    seg_probs (F, T, H, W))."""
    from ossid_code_tpu.models.dtoid.network import DtoidNetwork

    net = dtoid_model.net
    params, batch_stats = dtoid_model.params, dtoid_model.batch_stats
    fshard = NamedSharding(mesh, P(axes[0]))
    tshard = NamedSharding(mesh, P(axes[1]))
    repl = NamedSharding(mesh, P())

    def fwd(images, local_feats, global_feat):
        def one_frame(img):
            return net.apply(
                {"params": params, "batch_stats": batch_stats},
                img[None], local_feats, global_feat,
                method=DtoidNetwork.forward_all_templates,
            )

        return jax.vmap(one_frame)(images)

    return jax.jit(fwd, in_shardings=(fshard, tshard, repl))
