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
