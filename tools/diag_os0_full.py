#!/usr/bin/env python
"""Full-system OS0-64 diagnostic: decompose the 17 m ATE into odometry
drift vs mapping refinement vs loop corrections (VERDICT r5 item 1)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from intensity_slam_tpu.utils.platform import honor_env_platform

honor_env_platform()

from intensity_slam_tpu import config
from intensity_slam_tpu.io import synthetic
from intensity_slam_tpu.pipeline.system import SlamSystem
from intensity_slam_tpu.utils import se3

FRAMES = int(os.environ.get("FRAMES", "420"))


def run(cfg, name):
    wname = os.environ.get("WORLD", "circuit")
    if wname == "circuit":
        world = synthetic.circuit_world()
        poses = synthetic.circuit_trajectory(FRAMES, speed=0.4)
    elif wname == "figure8":
        world = synthetic.figure_eight_world()
        poses = synthetic.figure_eight_trajectory(FRAMES, speed=0.4)
    else:
        world = synthetic.aliased_corridor_world()
        poses = synthetic.aliased_corridor_trajectory(FRAMES, speed=0.4)
    name = f"{name} [{wname}]"
    noise = synthetic.DEFAULT_NOISE if os.environ.get("NOISE") else None
    key = jax.random.PRNGKey(int(os.environ.get("SEED", "0")))
    render = jax.jit(lambda q, t, k: synthetic.render_sequence(
        se3.Pose(q, t), world, cfg.sensor, noise=noise, key=k))
    chunks = []
    for s in range(0, FRAMES, 32):
        key, sub = jax.random.split(key)
        cx, ci = render(poses.q[s:s + 32], poses.t[s:s + 32], sub)
        chunks.append((np.asarray(cx), np.asarray(ci)))
    xyz = jnp.asarray(np.concatenate([c[0] for c in chunks]))
    inten = jnp.asarray(np.concatenate([c[1] for c in chunks]))
    p0 = se3.Pose(poses.q[0], poses.t[0])
    gt_t = np.asarray(jax.vmap(
        lambda q, t: se3.compose(se3.inverse(p0), se3.Pose(q, t)).t
    )(poses.q, poses.t))

    sys_ = SlamSystem(cfg)
    skips = 0
    for k in range(FRAMES):
        info = sys_.process(xyz[k], inten[k], 0.1 * k)
    traj = sys_.trajectory()
    odo = sys_.odom_trajectory()
    # live (pre-PGO-correction) mapping poses from the log
    log = sys_.state.log
    n = min(int(log.count), cfg.log_capacity)
    live = np.asarray(log.t[:n])

    err_c = np.linalg.norm(traj - gt_t[: len(traj)], axis=-1)
    err_l = np.linalg.norm(live - gt_t[: len(live)], axis=-1)
    err_o = np.linalg.norm(odo - gt_t[: len(odo)], axis=-1)
    print(f"== {name}: frames={FRAMES} kf={int(sys_.bstate.num_kf)} "
          f"loops={len(sys_.loops)} skips={sys_.num_skips}")
    print(f"  odometry-only ATE {np.sqrt((err_o**2).mean()):.2f} m  "
          f"end {err_o[-1]:.2f}  max {err_o.max():.2f}")
    print(f"  live mapping  ATE {np.sqrt((err_l**2).mean()):.2f} m  "
          f"end {err_l[-1]:.2f}  max {err_l.max():.2f}")
    print(f"  corrected     ATE {np.sqrt((err_c**2).mean()):.2f} m  "
          f"end {err_c[-1]:.2f}  max {err_c.max():.2f}")
    print(f"  loops: {sys_.loops}")
    print("  live err curve (every 30f):", np.round(err_l[::30], 2))
    print("  corr err curve (every 30f):", np.round(err_c[::30], 2))
    print("  odo  err curve (every 30f):", np.round(err_o[::30], 2))


if __name__ == "__main__":
    which = os.environ.get("TABLE", "os0")
    if os.environ.get("NOLOOP"):
        import dataclasses
        def noloop(c):
            return c.replace(loop=dataclasses.replace(
                c.loop, use_bow_loop=False, use_scancontext=False))
    else:
        noloop = lambda c: c
    if which in ("os0", "both"):
        run(noloop(config.os0_64_config()), "OS0-64 +-45")
    if which in ("legacy", "both"):
        run(noloop(config.SlamConfig()), "legacy +-16.6")
