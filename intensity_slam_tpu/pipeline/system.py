"""SlamSystem: host driver of the fused per-frame program.

The reference runs its back-end as threads inside `ascanRegistration`
(factor-graph thread at 100 Hz, loop thread at 10 Hz,
`scanRegistration.cpp:734-735`) communicating through mutex-guarded deques.
Round 2 mirrored that on the host and paid a device->host sync per frame —
250x slower end-to-end than its own kernels on a remote-TPU transport.

Round 3 moves the orchestration INTO the program: `pipeline.fused`
runs the front-end every frame and the whole back-end under an in-graph
`lax.cond` on the keyframe flag, appending everything the host might want
to a device-resident log.  This class is now a thin driver:

- `process` dispatches one fused step per frame and returns the device
  FrameInfo WITHOUT reading it (no sync; JAX async dispatch pipelines the
  transfers and compute).  Read any field if you want to block.
- trajectory/loops/keyframe accessors fetch device state on demand —
  typically once, at the end of a sequence.
- `refine` hands the live BackendState to the distributed back-end
  (`parallel.dist_backend.refine`, optionally over a mesh) and adopts the
  refined poses through the same feedback path a loop closure takes
  (`fused.adopt_graph`).  With `cfg.parallel.refine_every_kf > 0`,
  `process` triggers it automatically every N keyframes (the keyframe count
  is polled every 32 frames — one scalar fetch).

Trajectory export follows `updatePoses` semantics
(`intensity_feature_tracker.cpp:110-145`): keyframe poses come from the
optimized graph; intermediate frames are corrected rigidly with their
governing keyframe's era->PGO correction (`fused.trajectory`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..ops import projection
from . import fused


class SlamSystem:
    def __init__(self, cfg: SlamConfig, seed: int = 0, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        self.mask = projection.detection_mask(cfg.sensor)
        self.state = fused.init_state(cfg, seed)
        # donate the state: it is ~100 MB of keyframe store + maps and must
        # not be copied every frame
        self._step = jax.jit(
            lambda st, x, i, t: fused.fused_step(st, x, i, t, self.mask, cfg),
            donate_argnums=(0,),
        )
        self._traj = jax.jit(lambda st: fused.trajectory(st, cfg))
        self._adopt = jax.jit(
            lambda st, poses: fused.adopt_graph(st, poses, cfg),
            donate_argnums=(0,),
        )
        self._frames = 0
        self._last_refine_kf = 0
        # unbounded trajectory export: corrected segments spill to the host
        # before the device ring wraps (runtime.spill.LogSpiller)
        from ..runtime.spill import LogSpiller

        self._spiller = LogSpiller(cfg)

    # ---- hot path ----------------------------------------------------------
    def process(self, xyz, inten, timestamp) -> fused.FrameInfo:
        """Dispatch one frame.  Returns device scalars; does NOT sync."""
        self.state, info = self._step(
            self.state, xyz, inten, jnp.asarray(timestamp, jnp.float32)
        )
        self._frames += 1
        self._spiller.maybe_spill(self.state, self._frames)
        every = self.cfg.parallel.refine_every_kf
        if every > 0 and self._frames % 32 == 0:
            n_kf = int(info.num_kf)          # one scalar fetch / 32 frames
            if n_kf - self._last_refine_kf >= every:
                self.refine()
                self._last_refine_kf = n_kf
        return info

    # ---- distributed refinement -------------------------------------------
    def refine(self) -> None:
        """Run the (optionally mesh-sharded) global BA+PGO refinement on the
        live keyframe store and feed the refined poses back."""
        from ..parallel import dist_backend

        bstate = self.state.backend
        if self.mesh is not None:
            bstate = dist_backend.shard_backend_state(bstate, self.mesh)
        res = dist_backend.refine(bstate, self.cfg, mesh=self.mesh)
        poses = jax.device_put(
            res.state.graph.poses, jax.devices()[0]
        ) if self.mesh is not None else res.state.graph.poses
        self.state = self._adopt(self.state, poses)

    # ---- state accessors (each fetch syncs; use after the hot loop) --------
    @property
    def bstate(self):
        return self.state.backend

    @property
    def num_keyframes(self) -> int:
        return int(self.state.backend.num_kf)

    @property
    def num_skips(self) -> int:
        return int(self.state.log.num_skips)

    @property
    def kf_map_pose(self) -> list[tuple[np.ndarray, np.ndarray]]:
        """Raw (era-frame) map pose per keyframe, as the old host mirror."""
        n = self.num_keyframes
        q = np.asarray(self.state.backend.kf_raw.q[:n])
        t = np.asarray(self.state.backend.kf_raw.t[:n])
        return [(q[i], t[i]) for i in range(n)]

    @property
    def loops(self) -> list[tuple[int, int, float]]:
        """Accepted loop edges as (cur_kf, loop_kf, icp_fitness)."""
        g = self.state.backend.graph
        n = int(g.num_loops)
        L = g.loop_valid.shape[0]
        out = []
        order = range(n) if n <= L else range(n - L, n)
        li = np.asarray(g.loop_i)
        lj = np.asarray(g.loop_j)
        si = np.asarray(g.loop_sqrt_info)
        valid = np.asarray(g.loop_valid)
        for e in order:
            s = e % L
            if not valid[s]:
                continue
            fit = float(1.0 / max(si[s, 0], 1e-12) ** 2)
            out.append((int(li[s]), int(lj[s]), fit))
        return out

    @property
    def frame_poses(self) -> list[tuple[np.ndarray, np.ndarray]]:
        """Era-frame pose per frame from the device log (pre-export)."""
        log = self.state.log
        n = min(int(log.count), self.cfg.log_capacity)
        q = np.asarray(log.q[:n])
        t = np.asarray(log.t[:n])
        return [(q[i], t[i]) for i in range(n)]

    def trajectory(self) -> np.ndarray:
        """(N, 3) PGO-corrected positions (updatePoses semantics) for the
        FULL session: host-spilled segments + live ring window — unbounded
        in session length even though the device ring is fixed."""
        _, t = self._spiller.full_trajectory(self.state, self._frames,
                                             self._traj)
        return t

    def odom_trajectory(self) -> np.ndarray:
        """(T, 3) merged-odometry positions (pre-mapping, pre-PGO) — the
        per-stage drift diagnostic."""
        log = self.state.log
        n = min(int(log.count), self.cfg.log_capacity)
        return np.asarray(log.ot[:n])

    # ---- checkpoint/resume -------------------------------------------------
    def save(self, prefix: str) -> None:
        """Checkpoint the full fused state for crash-resume / multi-session
        mapping."""
        from ..utils import checkpoint

        checkpoint.save(prefix + ".fused.npz", self.state)

    def load(self, prefix: str) -> None:
        from ..utils import checkpoint

        self.state = checkpoint.restore(prefix + ".fused.npz", self.state)
        # re-align host counters with the restored device log; segments
        # spilled by the previous process are host state and are gone —
        # the export covers the ring-resident suffix until new spills
        self._frames = int(self.state.log.count)
        self._spiller.resync(self._frames)
