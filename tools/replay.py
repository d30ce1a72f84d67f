#!/usr/bin/env python
"""Replay CLI: run the SLAM pipeline over a synthetic or recorded sequence.

Usage:
  python tools/replay.py --frames 40 [--check-ate] [--speed 0.35]
                         [--yaw-rate 0.005] [--small] [--npz path.npz]

With --npz, loads a recorded log: arrays `xyz` (T, H*W, 3), `intensity`
(T, H*W), `times` (T,), optional `gt_q`/`gt_t` for ATE.  Otherwise renders a
synthetic corridor sequence with known ground truth.
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from intensity_slam_tpu.utils.platform import honor_env_platform

honor_env_platform()

from intensity_slam_tpu import config
from intensity_slam_tpu.io import synthetic
from intensity_slam_tpu.pipeline import odometry, slam
from intensity_slam_tpu.utils import se3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--speed", type=float, default=0.35)
    ap.add_argument("--yaw-rate", type=float, default=0.005)
    ap.add_argument("--check-ate", action="store_true")
    # pure scan-to-scan odometry drifts ~2-4% of distance; the scan-to-map
    # back-end tightens this (reference behavior is the same, CS-3)
    ap.add_argument("--ate-bound", type=float, default=0.6)
    ap.add_argument("--small", action="store_true", help="small test shapes")
    ap.add_argument("--npz", type=str, default=None)
    ap.add_argument("--pipeline", choices=["system", "slam", "odometry"],
                    default="slam",
                    help="system = full SLAM + loop closure + PGO (host-"
                         "driven); slam/odometry = lax.scan replay")
    args = ap.parse_args()

    cfg = config.small_test_config() if args.small else config.SlamConfig()

    if args.npz:
        data = np.load(args.npz)
        xyz = jnp.asarray(data["xyz"])
        inten = jnp.asarray(data["intensity"])
        times = jnp.asarray(data["times"])
        gt_t = jnp.asarray(data["gt_t"]) if "gt_t" in data else None
    else:
        world = synthetic.corridor_world()
        poses = synthetic.corridor_trajectory(
            args.frames, speed=args.speed, yaw_rate=args.yaw_rate)
        xyz, inten = jax.jit(
            lambda q, t: synthetic.render_sequence(se3.Pose(q, t), world, cfg.sensor)
        )(poses.q, poses.t)
        times = jnp.arange(args.frames, dtype=jnp.float32) * cfg.sensor.scan_period
        p0 = se3.Pose(poses.q[0], poses.t[0])
        gt_t = jax.vmap(
            lambda q, t: se3.compose(se3.inverse(p0), se3.Pose(q, t)).t
        )(poses.q, poses.t)

    T = xyz.shape[0]
    if args.pipeline == "system":
        from intensity_slam_tpu.pipeline.system import SlamSystem
        sys_ = SlamSystem(cfg)
        t0 = time.perf_counter()
        for k in range(T):
            sys_.process(xyz[k], inten[k], float(times[k]))
        dt = time.perf_counter() - t0
        traj = jnp.asarray(sys_.trajectory())
        print(f"frames: {T}  time: {dt:.2f}s ({T/dt:.1f} scans/s incl. compile)")
        print(f"skips: {sys_.num_skips}  keyframes: {len(sys_.kf_map_pose)}"
              f"  loops: {sys_.loops}")
        print(f"final pose t: {np.asarray(traj[-1]).round(3).tolist()}")
        est_t = traj
    else:
        runner = slam.run_sequence if args.pipeline == "slam" else odometry.run_sequence
        t0 = time.perf_counter()
        outs = jax.jit(lambda x, i, t: runner(x, i, t, cfg))(xyz, inten, times)
        jax.block_until_ready(outs.pose.t)
        dt = time.perf_counter() - t0
        skips = np.asarray(outs.skip).astype(int)
        print(f"frames: {T}  time: {dt:.2f}s ({T/dt:.1f} scans/s incl. compile)")
        print(f"skips: {skips.sum()} ({skips.tolist()[:20]}...)")
        print(f"keyframes: {int(np.asarray(outs.is_keyframe).sum())}")
        print(f"matches/frame (median): {int(np.median(np.asarray(outs.num_good)[1:]))}")
        print(f"final pose t: {np.asarray(outs.pose.t[-1]).round(3).tolist()}")
        est_t = outs.pose.t

    if gt_t is not None:
        ate = float(odometry.ate_rmse(est_t, gt_t))
        end = float(jnp.linalg.norm(est_t[-1] - gt_t[-1]))
        print(f"ATE RMSE: {ate:.4f} m   end error: {end:.4f} m")
        if args.check_ate and ate > args.ate_bound:
            print(f"FAIL: ATE {ate:.4f} > bound {args.ate_bound}")
            return 1
        if args.check_ate:
            print(f"PASS: ATE within bound {args.ate_bound}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
