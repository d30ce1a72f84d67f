"""SlamSystem: host orchestration of the front-end and loop back-end.

The reference runs the back-end as threads inside `ascanRegistration`
(factor-graph thread at 100 Hz, loop thread at 10 Hz,
`scanRegistration.cpp:734-735`) communicating through mutex-guarded deques.
Here the host loop plays that role: the jitted front-end step runs every
frame; the jitted back-end step runs on keyframes.  Device state stays
resident; the host only moves O(1) scalars per frame (the is-keyframe flag
and pose readbacks) — SURVEY §7's two-stream design.

Trajectory export follows `updatePoses` semantics
(`intensity_feature_tracker.cpp:110-145`): keyframe poses come from the
optimized graph; intermediate frames are corrected rigidly with their
preceding keyframe's correction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..ops import projection
from ..utils import se3
from ..utils.se3 import Pose
from . import loop as loop_mod
from . import slam


class SlamSystem:
    def __init__(self, cfg: SlamConfig, seed: int = 0):
        self.cfg = cfg
        self.mask = projection.detection_mask(cfg.sensor)
        self.state = slam.init_state(cfg, seed)
        self.bstate = loop_mod.init_state(cfg)

        self._front = jax.jit(
            lambda st, x, i, t: slam.slam_step(st, x, i, t, self.mask, cfg)
        )
        self._backend = jax.jit(
            lambda bst, x, m, d, dv, q, tt, ts, fx: loop_mod.backend_step(
                bst, x, m, d, dv, Pose(q, tt), ts, cfg, feat_xyz=fx)
        )
        # host-side logs
        self.frame_poses: list[np.ndarray] = []   # map poses (q, t) per frame
        self.frame_kf_id: list[int] = []          # preceding keyframe id
        self.kf_map_pose: list[tuple[np.ndarray, np.ndarray]] = []
        self.loops: list[tuple[int, int, float]] = []
        self.num_skips = 0

    def process(self, xyz, inten, timestamp) -> dict:
        import time

        t0 = time.perf_counter()
        self.state, out = self._front(self.state, xyz, inten,
                                      jnp.asarray(timestamp, jnp.float32))
        is_kf = bool(out.is_keyframe)   # forces device sync of the front step
        t1 = time.perf_counter()
        info = {
            "skip": bool(out.skip),
            "is_keyframe": is_kf,
            "num_good": int(out.num_good),
            "t_front": t1 - t0,
        }
        self.num_skips += info["skip"]
        if is_kf:
            scan_valid = jnp.linalg.norm(xyz, axis=-1) >= self.cfg.sensor.min_range
            self.bstate, bout = self._backend(
                self.bstate, xyz, scan_valid, out.desc, out.desc_valid,
                out.pose.q, out.pose.t,
                jnp.asarray(timestamp, jnp.float32),
                out.feat_xyz,
            )
            if bool(bout.compacted):
                # device store was full and decimated by 2 BEFORE ingesting
                # this keyframe — mirror on the host logs
                import warnings

                warnings.warn(
                    f"keyframe store full ({self.cfg.loop.max_keyframes}); "
                    "decimated by 2 (even-indexed keyframes kept)",
                    stacklevel=2,
                )
                self.kf_map_pose = self.kf_map_pose[0::2]
                self.loops = [(a // 2, b // 2, f) for a, b, f in self.loops]
                self.frame_kf_id = [i // 2 if i >= 0 else i
                                    for i in self.frame_kf_id]
                info["compacted"] = True
            self.kf_map_pose.append(
                (np.asarray(out.pose.q), np.asarray(out.pose.t))
            )
            info["t_backend"] = time.perf_counter() - t1
            info["sc_found"] = bool(bout.sc_found)
            info["sc_dist"] = float(bout.sc_dist)
            info["icp_fitness"] = float(bout.icp_fitness)
            info["icp_inlier_frac"] = float(bout.icp_inlier_frac)
            if bool(bout.loop_found):
                self.loops.append(
                    (len(self.kf_map_pose) - 1, int(bout.loop_idx),
                     float(bout.icp_fitness))
                )
                info["loop"] = self.loops[-1]
        self.frame_poses.append(
            (np.asarray(out.pose.q), np.asarray(out.pose.t))
        )
        self.frame_kf_id.append(len(self.kf_map_pose) - 1)
        return info

    def save(self, prefix: str) -> None:
        """Checkpoint device state for crash-resume / multi-session mapping."""
        from ..utils import checkpoint

        checkpoint.save(prefix + ".front.npz", self.state)
        checkpoint.save(prefix + ".backend.npz", self.bstate)

    def load(self, prefix: str) -> None:
        from ..utils import checkpoint

        self.state = checkpoint.restore(prefix + ".front.npz", self.state)
        self.bstate = checkpoint.restore(prefix + ".backend.npz", self.bstate)

    def trajectory(self) -> np.ndarray:
        """(T, 3) PGO-corrected positions (updatePoses semantics)."""
        n_kf = len(self.kf_map_pose)
        if n_kf == 0:
            return np.stack([t for _, t in self.frame_poses])
        g = self.bstate.graph
        opt_q = np.asarray(g.poses.q[:n_kf])
        opt_t = np.asarray(g.poses.t[:n_kf])
        out = []
        for (fq, ft), kf in zip(self.frame_poses, self.frame_kf_id):
            kf = max(kf, 0)
            # correction of the governing keyframe: T_opt o T_map^-1
            mq, mt = self.kf_map_pose[kf]
            T_opt = Pose(jnp.asarray(opt_q[kf]), jnp.asarray(opt_t[kf]))
            T_map = Pose(jnp.asarray(mq), jnp.asarray(mt))
            corr = se3.compose(T_opt, se3.inverse(T_map))
            p = se3.compose(corr, Pose(jnp.asarray(fq), jnp.asarray(ft)))
            out.append(np.asarray(p.t))
        return np.stack(out)
