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
    sa2g, poses, valid) -> (scores, raw_scores, uv, inconst) with sharded
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
            hshard, hshard,  # poses, valid
        ),
    )
