"""Structured per-frame metrics + stage timers (SURVEY §5 tracing).

The reference's observability is `TicToc` wall timers printed via
ROS_INFO/printf (`src/tic_toc.h`, `intensity_feature_tracker.cpp:384-385,
590-592,711`) — and the ROS macros are compiled out in release builds
(`-DROSCONSOLE_MIN_SEVERITY=5`, CMakeLists.txt:6), leaving printf only.

Here: (1) `StageTimer` — a TicToc equivalent that also keeps running
statistics; (2) `FrameMetrics` — a host-side accumulator for the scalar
fields of each frame's SlamOutput (match counts, residual counts, skip /
keyframe flags, solver costs), with a summary table; (3) a
`jax.profiler`-based trace context for kernel-level timing.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


class StageTimer:
    """Wall-clock stage timer with running stats (TicToc + aggregation)."""

    def __init__(self):
        self._acc = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name].append(time.perf_counter() - t0)

    def summary(self) -> dict:
        return {
            name: {
                "count": len(v),
                "mean_ms": float(np.mean(v) * 1e3),
                "p50_ms": float(np.percentile(v, 50) * 1e3),
                "p95_ms": float(np.percentile(v, 95) * 1e3),
                "total_s": float(np.sum(v)),
            }
            for name, v in self._acc.items()
        }

    def report(self) -> str:
        rows = ["%-24s %6s %9s %9s %9s" % ("stage", "n", "mean ms", "p50 ms", "p95 ms")]
        for name, s in sorted(self.summary().items()):
            rows.append("%-24s %6d %9.2f %9.2f %9.2f" % (
                name, s["count"], s["mean_ms"], s["p50_ms"], s["p95_ms"]))
        return "\n".join(rows)


class FrameMetrics:
    """Accumulates scalar per-frame signals; everything stays on host."""

    SCALARS = ("skip", "is_keyframe", "num_good", "num_plane_residuals",
               "ground_ok", "map_points")

    def __init__(self):
        self._rows = defaultdict(list)

    def add(self, out) -> None:
        for k in self.SCALARS:
            v = getattr(out, k, None)
            if v is not None:
                self._rows[k].append(float(np.asarray(v)))

    def summary(self) -> dict:
        out = {}
        for k, v in self._rows.items():
            a = np.asarray(v)
            out[k] = {
                "mean": float(a.mean()),
                "min": float(a.min()),
                "max": float(a.max()),
                "last": float(a[-1]),
            }
        out["frames"] = len(next(iter(self._rows.values()), []))
        return out


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context — open with TensorBoard/xprof."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
