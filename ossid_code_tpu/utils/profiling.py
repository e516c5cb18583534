"""Device profiling helpers (aux subsystem, SURVEY.md §5.1).

The reference instruments stages with CUDA-event timers (ref
utils/__init__.py:186-218) and records per-frame wall times into result rows.
The TPU equivalents here: `trace` wraps a region with a jax.profiler trace
(viewable in TensorBoard/Perfetto), and `device_timer` measures a jitted
callable by forcing a host fetch (on the remote-attached TPU,
block_until_ready alone does not synchronize)."""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for everything inside the block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_timer(fn, *args, iters: int = 10, warmup: int = 2, **kwargs) -> float:
    """Median seconds per call of a jitted callable, synchronized by fetching
    one element of the first output to the host."""

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf))

    for _ in range(warmup):
        sync(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def annotate(name: str):
    """Named region inside jitted code shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)
