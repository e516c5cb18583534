"""Activation/gradient probing — the JAX analog of the reference's
NetworkBase debug surface (ref models/dtoid/network_base.py:7-67: the
`probe_activation` dict filled by forward hooks and `hook_generator`'s
gradient hooks).

Functional models have no hooks; the equivalents here are:
  * `capture_activations` — flax's capture_intermediates: every submodule's
    __call__ output, flattened to an OrderedDict of numpy arrays
    (NetworkBase.load_activations());
  * `capture_activation_gradients` — d loss / d activation for every
    submodule output (NetworkBase.hook_generator()): each intermediate gets
    an additive zero-valued perturbation injected through a method
    interceptor, and `jax.grad` w.r.t. the perturbations IS the gradient
    that a torch tensor hook would observe. If a submodule is called more
    than once, its perturbation is shared across calls, so the reported
    gradient is the SUM over calls.

Both run the unmodified module — no model-code changes, any flax model.
"""

from __future__ import annotations

import collections

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def _flatten_intermediates(tree, prefix=()):
    out = collections.OrderedDict()
    for k in sorted(tree.keys()):
        v = tree[k]
        if isinstance(v, dict):
            out.update(_flatten_intermediates(v, prefix + (k,)))
        else:
            vals = v if isinstance(v, (tuple, list)) else (v,)
            for i, a in enumerate(vals):
                name = "/".join(prefix + (k,)) + ("" if len(vals) == 1 else f"_{i}")
                out[name] = np.asarray(a)
    return out


def capture_activations(module, variables, *args, method=None, **kwargs):
    """Run `module.apply` capturing every submodule's __call__ output.

    Returns (outputs, OrderedDict name -> numpy activation). Names are flax
    module paths ('early/block1/.../__call__')."""
    out, state = module.apply(
        variables, *args,
        capture_intermediates=True, mutable=["intermediates"],
        method=method, **kwargs,
    )
    return out, _flatten_intermediates(state["intermediates"])


def capture_activation_gradients(module, variables, scalar_loss, *args, **kwargs):
    """Gradient of `scalar_loss(module outputs)` w.r.t. every submodule's
    output activation.

    Returns (loss_value, OrderedDict name -> numpy gradient with the
    activation's shape). `scalar_loss` maps the module's outputs to a scalar
    (e.g. `lambda o: o.sum()` or a real loss closed over labels)."""
    shapes: dict = {}

    def record(next_fun, iargs, ikwargs, context):
        out = next_fun(*iargs, **ikwargs)
        if context.method_name == "__call__" and isinstance(out, jnp.ndarray):
            key = "/".join(context.module.path) or "__root__"
            shapes.setdefault(key, jax.ShapeDtypeStruct(out.shape, out.dtype))
        return out

    with nn.intercept_methods(record):
        module.apply(variables, *args, **kwargs)

    eps0 = {
        k: jnp.zeros(s.shape, s.dtype)
        for k, s in shapes.items()
        if jnp.issubdtype(s.dtype, jnp.floating)
    }

    def perturbed_loss(eps):
        def add(next_fun, iargs, ikwargs, context):
            out = next_fun(*iargs, **ikwargs)
            if context.method_name == "__call__" and isinstance(out, jnp.ndarray):
                key = "/".join(context.module.path) or "__root__"
                e = eps.get(key)
                if e is not None and e.shape == out.shape:
                    out = out + e.astype(out.dtype)
            return out

        with nn.intercept_methods(add):
            o = module.apply(variables, *args, **kwargs)
        return scalar_loss(o)

    loss, grads = jax.value_and_grad(perturbed_loss)(eps0)
    ordered = collections.OrderedDict(
        (k, np.asarray(grads[k])) for k in sorted(grads.keys())
    )
    return float(loss), ordered
