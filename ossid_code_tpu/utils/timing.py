"""Wall-clock stage timing, feeding the per-frame `time_*` result fields that the
reference records (ref scripts/online_learning.py:345-347,584-589).

On TPU the analogue of the reference's CUDA-event timer (ref utils/__init__.py:186)
is to block on the output with `jax.block_until_ready` inside the timed region —
callers must do that themselves for accurate device timing.
"""

from __future__ import annotations

import time


class Timer:
    """Context-manager wall-clock timer; `.interval` holds elapsed seconds."""

    def __init__(self, heading: str = "", agg_list=None, verbose: bool = False):
        self.heading = heading
        self.agg_list = agg_list
        self.verbose = verbose
        self.interval = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *args):
        self.interval = time.perf_counter() - self.start
        if self.agg_list is not None:
            self.agg_list.append((self.heading, self.interval))
        if self.verbose:
            print(f"{self.heading} {self.interval:.4f}s")


class StageTimes:
    """Accumulates named stage durations for one frame of the online loop."""

    def __init__(self):
        self.times: dict[str, float | None] = {}

    def timer(self, name: str) -> Timer:
        t = Timer(heading=name)
        orig_exit = t.__exit__

        def _exit(*args):
            orig_exit(*args)
            self.times[name] = self.times.get(name) or 0.0
            self.times[name] += t.interval

        t.__exit__ = _exit
        return t

    def get(self, name: str, default=None):
        return self.times.get(name, default)
