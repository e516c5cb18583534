"""Mesh-program tests on the conftest's 8-device virtual CPU mesh.

The driver's multichip dryrun exercises these too; having them in the suite
means a sharding regression fails `pytest` locally instead of only at the
round gate. Covers the 2-D frames x templates serving farm (parallel/mesh.py)
against a single-device reference forward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def small_model():
    from ossid_code_tpu.core.config import default_config
    from ossid_code_tpu.models.dtoid.module import DtoidModel

    cfg = default_config()
    cfg.model.img_h, cfg.model.img_w = 64, 64
    cfg.model.heatmap_h, cfg.model.heatmap_w = 3, 3
    return DtoidModel(cfg, seed=0)


def test_serving_farm_matches_single_device(small_model):
    from ossid_code_tpu.models.dtoid.network import DtoidNetwork
    from ossid_code_tpu.parallel.mesh import make_mesh_2d, make_serving_farm_forward

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh from conftest")

    rng = np.random.default_rng(0)
    mesh = make_mesh_2d(2, 4)
    farm = make_serving_farm_forward(small_model, mesh)

    frames = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    local_feats = rng.normal(0, 0.1, (4, 7, 7, 640)).astype(np.float32)
    gfeat = rng.normal(0, 0.1, (1, 3, 3, 64)).astype(np.float32)

    fshard = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("dp"))
    tshard = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("tp"))
    cls, reg, hm, seg = farm(
        jax.device_put(frames, fshard), jax.device_put(local_feats, tshard),
        jnp.asarray(gfeat),
    )
    assert cls.shape[:2] == (4, 4) and reg.shape[:2] == (4, 4)
    assert np.isfinite(np.asarray(cls)).all()

    # single-device reference: same per-frame forward, no sharding
    net = small_model.net
    v = {"params": small_model.params, "batch_stats": small_model.batch_stats}
    ref_cls, ref_reg, _, _ = net.apply(
        v, jnp.asarray(frames[2:3]), jnp.asarray(local_feats), jnp.asarray(gfeat),
        method=DtoidNetwork.forward_all_templates,
    )
    np.testing.assert_allclose(np.asarray(cls)[2], np.asarray(ref_cls), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(reg)[2], np.asarray(ref_reg), rtol=2e-4, atol=2e-5)
