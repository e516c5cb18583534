"""Pallas kernels validated against the XLA reference path (interpreter mode
on CPU; the real TPU runs the compiled kernel via ops.conv.depthwise_corr)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_dw_corr3x3_pallas_interpret_matches_xla(rng):
    from jax.experimental import pallas as pl
    from ossid_code_tpu.ops import pallas_kernels as pk
    from ossid_code_tpu.ops.conv import depthwise_corr
    import functools

    b, h, w, c = 3, 8, 16, 128
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, 3, 3, c)).astype(np.float32))

    # interpreter-mode pallas call (CPU)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = pl.pallas_call(
        functools.partial(pk._dw_corr_kernel, h, w),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + 2, w + 2, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 3, 3, c), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=True,
    )(xp, k)

    want = depthwise_corr(x, k, padding=1)  # XLA path on CPU
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_vmem_budget_gate():
    from ossid_code_tpu.ops.pallas_kernels import dw_corr_fits_vmem

    assert dw_corr_fits_vmem(29, 39, 640)      # detect-path correlation
    assert not dw_corr_fits_vmem(240, 320, 64)  # stem correlation at 480x640
