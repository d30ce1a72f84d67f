"""StreamingRunner: the native two-stream executor over a scan log.

Maps the reference's process/thread architecture (SURVEY.md §2 P1-P6) onto
the TPU host runtime:

  reference                               here
  ---------------------------------------------------------------------
  TCPROS subscriber + spinner decode      C++ Prefetcher thread (scanlog)
  ascanRegistration front-end (10 Hz)     caller thread: jitted front step
  loop/factor threads + mutexed deques    back-end thread + native Channel
  frame-drop realtime policy              Channel(drop_oldest=True)
  blocking debug ofstream                 C++ async TrajectoryWriter

The front-end thread owns the latency-critical odometry/mapping step; the
back-end thread owns loop closure + pose-graph work at keyframe rate.  The
native channel carries only O(1) keyframe records; bulk keyframe tensors
pass through a Python-side slot table keyed by keyframe id (the analogue of
the reference's shared_ptr clouds inside its queues).  JAX dispatch releases
the GIL during device execution, so host prep for stream B overlaps device
work for stream A.
"""

from __future__ import annotations

import threading
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..ops import projection
from ..pipeline import loop as loop_mod
from ..pipeline import slam
from ..utils.se3 import Pose
from .channel import Channel
from .scanlog import ScanLog
from .traj import TrajectoryWriter

_KF_DTYPE = np.dtype([
    ("kf_slot", np.int64),
    ("timestamp", np.float64),
])
_END = np.array((-1, 0.0), _KF_DTYPE)


class StreamingRunner:
    def __init__(self, cfg: SlamConfig, traj_path: str | None = None,
                 queue_capacity: int = 8, drop_policy: bool = False):
        self.cfg = cfg
        self.mask = projection.detection_mask(cfg.sensor)
        self.state = slam.init_state(cfg)
        self.bstate = loop_mod.init_state(cfg)
        self._front = jax.jit(
            lambda st, x, i, t: slam.slam_step(st, x, i, t, self.mask, cfg))
        self._backend = jax.jit(
            lambda bst, x, m, d, dv, q, tt, ts: loop_mod.backend_step(
                bst, x, m, d, dv, Pose(q, tt), ts, cfg))
        self._chan = Channel(queue_capacity, _KF_DTYPE)
        self._drop = drop_policy
        self._slots: dict[int, tuple] = {}
        self._slots_mu = threading.Lock()
        self._traj = TrajectoryWriter(traj_path) if traj_path else None
        self.loops: list[tuple[int, int, float]] = []
        self.num_frames = 0
        self.num_keyframes = 0
        self.num_skips = 0
        self.frame_poses: list[tuple[np.ndarray, np.ndarray]] = []

    # ---- back-end stream (loop closure + PGO) ------------------------------
    def _backend_loop(self) -> None:
        while True:
            rec = self._chan.pop(timeout_ms=-1)
            if rec is None or int(rec["kf_slot"]) < 0:
                return
            slot = int(rec["kf_slot"])
            with self._slots_mu:
                xyz, valid, desc, dvalid, q, t = self._slots.pop(slot)
            self.bstate, bout = self._backend(
                self.bstate, xyz, valid, desc, dvalid, q, t,
                jnp.asarray(rec["timestamp"], jnp.float32))
            if bool(bout.loop_found):
                self.loops.append(
                    (slot, int(bout.loop_idx), float(bout.icp_fitness)))

    # ---- front-end stream ----------------------------------------------------
    def run(self, log: ScanLog, start: int = 0, end: int | None = None,
            depth: int = 4,
            on_frame: Callable[[int, slam.SlamOutput], None] | None = None,
            ) -> dict:
        backend_th = threading.Thread(target=self._backend_loop,
                                      name="islam-backend")
        backend_th.start()
        try:
            for fr in log.stream(start, end, depth):
                xyz = jnp.asarray(fr.xyz)
                inten = jnp.asarray(fr.intensity)
                self.state, out = self._front(
                    self.state, xyz, inten,
                    jnp.asarray(fr.timestamp, jnp.float32))
                self.num_frames += 1
                self.num_skips += bool(out.skip)
                if bool(out.is_keyframe):
                    kf = self.num_keyframes
                    self.num_keyframes += 1
                    scan_valid = (jnp.linalg.norm(xyz, axis=-1)
                                  >= self.cfg.sensor.min_range)
                    with self._slots_mu:
                        self._slots[kf] = (xyz, scan_valid, out.desc,
                                           out.desc_valid, out.pose.q,
                                           out.pose.t)
                    rec = np.array((kf, fr.timestamp), _KF_DTYPE)
                    if not self._chan.push(rec, drop_oldest=self._drop):
                        # bounded-latency mode off: wait for the back-end
                        while not self._chan.push(rec):
                            pass
                q = np.asarray(out.pose.q)
                t = np.asarray(out.pose.t)
                self.frame_poses.append((q, t))
                if self._traj:
                    self._traj.append(fr.timestamp, t, q)
                if on_frame is not None:
                    on_frame(fr.index, out)
        finally:
            self._chan.push(_END)
            backend_th.join()
            self._chan.close()
            if self._traj:
                self._traj.close()
        return {
            "frames": self.num_frames,
            "keyframes": self.num_keyframes,
            "skips": self.num_skips,
            "loops": self.loops,
            "dropped_keyframes": self._chan.dropped,
        }
