"""Activation/grad probing (utils/probe.py) — the NetworkBase debug-surface
analog (ref models/dtoid/network_base.py:7-67)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from ossid_code_tpu.utils.probe import capture_activations, capture_activation_gradients


class Tiny(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.Dense(4, name="d1")(x)
        h = nn.relu(h)
        return nn.Dense(2, name="d2")(h)


def test_capture_activations():
    net = Tiny()
    x = jnp.ones((3, 5))
    variables = net.init(jax.random.PRNGKey(0), x)
    out, acts = capture_activations(net, variables, x)
    assert out.shape == (3, 2)
    names = list(acts)
    assert any("d1" in n for n in names)
    assert any("d2" in n for n in names)
    d1 = acts[[n for n in names if "d1" in n][0]]
    assert d1.shape == (3, 4)
    # the captured d2 output IS the module output
    d2 = acts[[n for n in names if "d2" in n][0]]
    np.testing.assert_allclose(d2, np.asarray(out), rtol=1e-6)


def test_capture_activation_gradients_analytic():
    """loss = sum(W2 @ relu(a1)): d loss / d a1 must equal
    relu'(a1) * column-sums of W2 — checked against the analytic value."""
    net = Tiny()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 5)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(1), x)

    loss, grads = capture_activation_gradients(net, variables, lambda o: o.sum(), x)
    gkeys = {k.rsplit("/", 1)[0] if "/" in k else k: k for k in grads}
    # gradient w.r.t. the final layer's output is all-ones
    gd2 = grads[[k for k in grads if "d2" in k][0]]
    np.testing.assert_allclose(gd2, np.ones((3, 2)), rtol=1e-6)

    # analytic gradient w.r.t. d1's (pre-relu) output
    _, acts = capture_activations(net, variables, x)
    a1 = acts[[k for k in acts if "d1" in k][0]]
    w2 = np.asarray(variables["params"]["d2"]["kernel"])  # (4, 2)
    expected = (a1 > 0).astype(np.float32) * w2.sum(1)[None, :]
    gd1 = grads[[k for k in grads if "d1" in k][0]]
    np.testing.assert_allclose(gd1, expected, rtol=1e-5, atol=1e-6)
    assert np.isfinite(loss)


def test_probe_on_dtoid_backbone():
    """Probing works on a real framework module (DenseNet stem)."""
    from ossid_code_tpu.models.backbones.densenet import DenseNetStem

    net = DenseNetStem()
    x = jnp.ones((1, 32, 32, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    out, acts = capture_activations(net, variables, x)
    assert len(acts) >= 1
    loss, grads = capture_activation_gradients(
        net, variables, lambda o: (o ** 2).mean(), x
    )
    assert len(grads) >= 1
    assert all(np.isfinite(g).all() for g in grads.values())
