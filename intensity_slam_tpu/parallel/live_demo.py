"""Deterministic LIVE system bootstrap for distributed-back-end demos.

Builds a small but real `SlamSystem` run — corridor world, straight
trajectory, keyframes + pose graph + keyframe store populated by the
actual fused pipeline — used by `__graft_entry__.dryrun_multichip` and by
the multi-process dryrun workers (`tools/multiproc_dryrun.py`).  Every
process that calls this with the same arguments computes bit-identical
state (same program, same inputs, XLA:CPU), which is what lets a
multi-controller solve treat the per-process copies as one replicated
global state.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .. import config
from ..io import synthetic
from ..pipeline.system import SlamSystem
from ..utils import se3
from ..utils.se3 import Pose


def live_config(n_scale: int = 8) -> config.SlamConfig:
    """The dryrun's live config: small sensor, keyframe capacity scaled to
    the mesh size, online refine enabled."""
    live_cfg = config.small_test_config()
    return live_cfg.replace(
        loop=dataclasses.replace(
            live_cfg.loop, max_keyframes=8 * n_scale,
            keyframe_cloud_size=256, sc_num_exclude_recent=4,
            min_loop_search_gap=4,
        ),
        odometry=dataclasses.replace(
            live_cfg.odometry, keyframe_time_interval=0.15),
        parallel=dataclasses.replace(
            live_cfg.parallel, refine_every_kf=4, ba_gn_iters=2,
            ba_cg_iters=8),
        log_capacity=128,
    )


def build_live_system(cfg: config.SlamConfig, frames: int = 12,
                      mesh=None) -> SlamSystem:
    """Run `frames` corridor frames through the fused pipeline on the
    process-local default device; returns the live system."""
    world = synthetic.corridor_world()
    qs, ts_ = [], []
    pose = Pose(jnp.array([1.0, 0, 0, 0]), jnp.array([0.0, 0.0, 0.8]))
    for _ in range(frames):
        qs.append(pose.q)
        ts_.append(pose.t)
        pose = se3.compose(pose, Pose(jnp.array([1.0, 0, 0, 0]),
                                      jnp.array([0.4, 0.0, 0.0])))
    traj = Pose(jnp.stack(qs), jnp.stack(ts_))
    sxyz, sint = jax.jit(lambda q, t: synthetic.render_sequence(
        Pose(q, t), world, cfg.sensor))(traj.q, traj.t)
    sys_ = SlamSystem(cfg, mesh=mesh)
    for k in range(frames):
        sys_.process(sxyz[k], sint[k], 0.1 * k)
    return sys_
