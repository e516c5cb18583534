"""Per-run accounting of host<->device RPCs and speculation outcomes.

The online loop's throughput on a remote-attached chip is bounded by tunnel
round trips (~25-40 ms each, serialized on one connection), so a degraded
bench number must be diagnosable from the artifact alone: how many fetch RPCs
per frame, how long each took, and whether next-frame speculation actually
hit (VERDICT r3 weak #1 — the driver's 33 ms det_miss mean was unexplainable
without these). The loop records into a RunStats instance; bench.py resets it
per pass and emits a summary line plus JSON fields.

Counters are thread-safe: the fetch/IO side threads record too.
"""

from __future__ import annotations

import threading


class RunStats:
    def __init__(self):
        self._lock = threading.Lock()
        self.reset()

    def reset(self):
        with self._lock:
            # event counters (speculation outcomes, completions, ...)
            self.counts: dict[str, int] = {}
            # RPC timings: kind -> [n_calls, total_seconds]
            self.rpcs: dict[str, list] = {}

    def count(self, kind: str, n: int = 1):
        with self._lock:
            self.counts[kind] = self.counts.get(kind, 0) + n

    def rpc(self, kind: str, seconds: float):
        """kinds ending in '_wait' are main-thread BLOCK times on side-thread
        futures, not tunnel round trips — reported, but excluded from the
        per-frame RPC count."""
        with self._lock:
            e = self.rpcs.setdefault(kind, [0, 0.0])
            e[0] += 1
            e[1] += seconds

    # ------------------------------------------------------------- reporting
    def snapshot(self) -> dict:
        with self._lock:
            return {
                "counts": dict(self.counts),
                "rpcs": {k: (v[0], v[1]) for k, v in self.rpcs.items()},
            }

    def summary(self, n_frames: int | None = None) -> str:
        s = self.snapshot()
        parts = []
        c = s["counts"]
        hits = c.get("spec_hit", 0)
        misses = c.get("spec_stale", 0) + c.get("spec_absent", 0)
        if hits + misses:
            parts.append(
                f"spec hit {hits}/{hits + misses}"
                + (f" (stale {c['spec_stale']})" if c.get("spec_stale") else "")
            )
        total_rpcs = 0
        for k in sorted(s["rpcs"]):
            n, t = s["rpcs"][k]
            if not k.endswith("_wait"):
                total_rpcs += n
            parts.append(f"{k} n={n} mean={t / max(n, 1) * 1e3:.1f}ms")
        if n_frames:
            parts.append(f"fetch_rpc/frame={total_rpcs / n_frames:.2f}")
        return "; ".join(parts) if parts else "(no rpc stats)"

    def fetch_rpcs_per_frame(self, n_frames: int) -> float:
        s = self.snapshot()
        return sum(n for k, (n, _) in s["rpcs"].items()
                   if not k.endswith("_wait")) / max(n_frames, 1)

    def spec_hit_rate(self) -> float | None:
        c = self.snapshot()["counts"]
        hits = c.get("spec_hit", 0)
        total = hits + c.get("spec_stale", 0) + c.get("spec_absent", 0)
        return hits / total if total else None


# module-level instance shared by the loop and bench
STATS = RunStats()
