"""Persistent XLA compilation cache (repo-local).

The driver's `dryrun_multichip(8)` compiles four sharded programs on a
virtual 8-device CPU mesh; the train step alone took 2m24s (r3) to 4m+ (r4,
timed out). With a persistent cache warmed by the test suite / a prior run on
the same machine, a rerun is seconds. Also cuts bench.py's ~4-5 min of TPU
warmup compiles on reruns and the flax CPU compiles that dominate the test
suite.

The cache lives in `<repo>/.jax_cache` (gitignored): keyed by HLO module +
compile options + backend, so CPU-mesh entries and TPU entries coexist.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point jax at the repo-local persistent compilation cache.

    Safe to call before or after backend init; idempotent. Returns the dir.
    Set OSSID_COMPILE_CACHE=0 to disable (e.g. to measure cold compiles).
    """
    if os.environ.get("OSSID_COMPILE_CACHE", "1") == "0":
        return ""
    cache_dir = cache_dir or os.environ.get("OSSID_COMPILE_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that took >=1s to compile (default is 1s; pin it so a
    # jax default bump can't silently stop caching the mid-size programs)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:  # older jax: knob absent, default is fine
        pass
    return cache_dir
