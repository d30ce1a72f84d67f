"""LogSpiller: unbounded trajectory export over a bounded device ring.

The device FrameLog holds `cfg.log_capacity` frames (~13.6 min at 10 Hz with
the default 8192); the reference's keyframe/pose deques are unbounded
(`intensity_feature_tracker.h:242-248`) and its demo bag alone is 5269
clouds.  Before a ring slot is overwritten, the spiller exports the oldest
resident chunk — corrected with its governing keyframe's era->PGO
correction as of spill time (`fused.export_window`, updatePoses semantics,
`intensity_feature_tracker.cpp:110-145`) — and hands the device handles to
a background thread that blocks on the device->host copy OFF the dispatch
thread (the same two-stream discipline as the async pose writer).

Device cost: one tiny gather dispatch per `chunk` frames.  Host cost: a
(chunk, 7)-float copy on the spill thread.  The dispatch thread never
syncs.
"""

from __future__ import annotations

import queue
import threading

import jax
import numpy as np

from ..config import SlamConfig
from ..pipeline import fused


class LogSpiller:
    def __init__(self, cfg: SlamConfig, chunk: int | None = None):
        cap = cfg.log_capacity
        self.chunk = int(chunk) if chunk else max(1, cap // 4)
        if cap < 2 * self.chunk:
            raise ValueError(
                f"log_capacity {cap} must be >= 2x spill chunk {self.chunk}")
        self.cfg = cfg
        self._fn = jax.jit(
            lambda st, s: fused.export_window(st, s, self.chunk, cfg))
        self.segments: list[tuple[np.ndarray, np.ndarray]] = []  # (q, t)
        self.spilled = 0          # frames exported to host so far
        self._q: queue.Queue = queue.Queue()
        self._th: threading.Thread | None = None

    # ---- background drain --------------------------------------------------
    def _drain_loop(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            q_dev, t_dev = item
            # blocks until the export's program ran; off the dispatch thread
            self.segments.append((np.asarray(q_dev), np.asarray(t_dev)))

    def start(self) -> None:
        if self._th is None or not self._th.is_alive():
            self._th = threading.Thread(target=self._drain_loop,
                                        name="islam-log-spiller", daemon=True)
            self._th.start()

    def stop(self) -> None:
        if self._th is not None and self._th.is_alive():
            self._q.put(None)
            self._th.join()
            self._th = None

    # ---- dispatch-side hook ------------------------------------------------
    def maybe_spill(self, state: fused.FusedState, num_frames: int) -> None:
        """Call after each dispatched frame with the post-step state and the
        total frames processed.  Exports chunks that would otherwise be
        overwritten within the next `chunk` frames.  Single-device program
        order guarantees the export reads the ring before later steps
        write over it."""
        cap = self.cfg.log_capacity
        while num_frames - self.spilled >= cap - self.chunk:
            q_dev, t_dev = self._fn(state, self.spilled)
            if self._th is None or not self._th.is_alive():
                self.start()
            self._q.put((q_dev, t_dev))
            self.spilled += self.chunk

    # ---- combined export ---------------------------------------------------
    def full_trajectory(self, state: fused.FusedState, num_frames: int,
                        traj_fn) -> tuple[np.ndarray, np.ndarray]:
        """(N, 4), (N, 3) for ALL N frames of the session: spilled segments
        (corrected as of spill time) + the live ring window (corrected
        now).  `traj_fn(state) -> (q, t, n)` is the jitted
        `fused.trajectory`."""
        self.stop()  # join pending copies; restartable via start()
        q, t, n = traj_fn(state)
        n = int(n)
        live_q = np.asarray(q)[:n]
        live_t = np.asarray(t)[:n]
        S = self.spilled
        # live window covers [num_frames - n, num_frames); drop the part
        # already spilled
        skip = S - (num_frames - n)
        parts_q = [s[0] for s in self.segments] + [live_q[skip:]]
        parts_t = [s[1] for s in self.segments] + [live_t[skip:]]
        out_q = np.concatenate(parts_q) if parts_q else live_q
        out_t = np.concatenate(parts_t) if parts_t else live_t
        # segments spilled by a previous process are gone after a
        # checkpoint restore (host state): the export then covers the
        # retained suffix only
        have = sum(s[1].shape[0] for s in self.segments)
        assert out_t.shape[0] == num_frames - (S - have), (
            f"spill accounting: {out_t.shape[0]} != "
            f"{num_frames} - ({S} - {have})")
        return out_q, out_t

    def resync(self, num_frames: int) -> None:
        """Re-align counters to a restored device state whose host-side
        segments are unavailable (checkpoint restore into a new process):
        marks everything not resident in the ring as already spilled so no
        stale export is attempted."""
        cap = self.cfg.log_capacity
        self.segments.clear()
        self.spilled = max(0, num_frames - (cap - self.chunk))
        self.spilled -= self.spilled % self.chunk
