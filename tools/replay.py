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
    ap.add_argument("--benchmark", action="store_true",
                    help="hard benchmark: multi-loop circuit world (~140 m/"
                         "lap, rooms, clutter, a 12 m textureless span), "
                         "full SlamSystem, JSON results via --out")
    ap.add_argument("--out", type=str, default=None,
                    help="write benchmark results JSON to this path")
    ap.add_argument("--no-textureless", action="store_true",
                    help="benchmark world without the degenerate span")
    ap.add_argument("--noise", action="store_true",
                    help="stochastic sensor model: range sigma, intensity "
                         "speckle, beam dropout (io.synthetic.SensorNoise)")
    ap.add_argument("--dynamic", action="store_true",
                    help="add moving objects to the benchmark world")
    ap.add_argument("--distort", action="store_true",
                    help="render per-column firing poses (true motion "
                         "distortion); pair with sensor.undistort")
    ap.add_argument("--undistort", action="store_true",
                    help="enable the constant-velocity undistortion path "
                         "(sensor.undistort=True)")
    ap.add_argument("--pipeline", choices=["system", "slam", "odometry"],
                    default="slam",
                    help="system = full SLAM + loop closure + PGO (host-"
                         "driven); slam/odometry = lax.scan replay")
    args = ap.parse_args()

    cfg = config.small_test_config() if args.small else config.SlamConfig()
    if args.undistort:
        import dataclasses

        cfg = cfg.replace(
            sensor=dataclasses.replace(cfg.sensor, undistort=True))

    if args.npz:
        data = np.load(args.npz)
        xyz = jnp.asarray(data["xyz"])
        inten = jnp.asarray(data["intensity"])
        times = jnp.asarray(data["times"])
        gt_t = jnp.asarray(data["gt_t"]) if "gt_t" in data else None
    elif args.benchmark:
        if args.frames == 40:   # default too short for the circuit
            args.frames = 420
        args.pipeline = "system"
        world = synthetic.circuit_world(
            textureless=not args.no_textureless, dynamic=args.dynamic)
        poses = synthetic.circuit_trajectory(args.frames, speed=0.4)
        noise = synthetic.DEFAULT_NOISE if args.noise else None
        render = jax.jit(lambda q, t, s, key: synthetic.render_sequence(
            se3.Pose(q, t), world, cfg.sensor,
            distort=args.distort, noise=noise, key=key,
            times=s * cfg.sensor.scan_period + cfg.sensor.scan_period
            * jnp.arange(q.shape[0], dtype=jnp.float32)))
        chunks = []
        CH = 32   # render in chunks: the (F, H, W, B) slab tensors are large
        for s in range(0, args.frames, CH):
            key = jax.random.PRNGKey(1000 + s)
            cx, ci = render(poses.q[s:s + CH], poses.t[s:s + CH],
                            jnp.float32(s), key)
            chunks.append((np.asarray(cx), np.asarray(ci)))
        xyz = jnp.asarray(np.concatenate([c[0] for c in chunks]))
        inten = jnp.asarray(np.concatenate([c[1] for c in chunks]))
        times = jnp.arange(args.frames, dtype=jnp.float32) * cfg.sensor.scan_period
        p0 = se3.Pose(poses.q[0], poses.t[0])
        gt_t = jax.vmap(
            lambda q, t: se3.compose(se3.inverse(p0), se3.Pose(q, t)).t
        )(poses.q, poses.t)
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
        # timestamps must be HOST scalars: float(times[k]) on a device
        # array is a device->host pull per frame — on a remote-TPU
        # transport that is an RPC round trip (~25 ms) that throttled the
        # whole benchmark to 28 scans/s while the fused program ran at 120
        times_host = np.asarray(times)
        # warmup/compile on frame 0 so steady-state timing is honest; the
        # fused step compiles BOTH cond branches up front (no mid-run cliff)
        t_c0 = time.perf_counter()
        info = sys_.process(xyz[0], inten[0], float(times_host[0]))
        jax.block_until_ready(info.num_kf)
        compile_s = time.perf_counter() - t_c0
        # timed run: pure async dispatch, block once per chunk — the per-
        # frame host syncs the old driver paid tripled its front-end cost
        CHUNK = 64
        chunk_times = []
        t0 = time.perf_counter()
        tc = t0
        for k in range(1, T):
            info = sys_.process(xyz[k], inten[k], float(times_host[k]))
            if k % CHUNK == 0:
                jax.block_until_ready(info.num_kf)
                now = time.perf_counter()
                chunk_times.append((k, now - tc))
                tc = now
        jax.block_until_ready(info.num_kf)
        dt = time.perf_counter() - t0
        traj = jnp.asarray(sys_.trajectory())
        loops = sys_.loops
        print(f"frames: {T}  time: {dt:.2f}s ({(T-1)/dt:.1f} scans/s; "
              f"compile+first {compile_s:.1f}s)")
        print(f"skips: {sys_.num_skips}  keyframes: {sys_.num_keyframes}"
              f"  loops: {loops}")
        print(f"final pose t: {np.asarray(traj[-1]).round(3).tolist()}")
        est_t = traj
        if args.out or args.benchmark:
            import json

            # steady state = all chunks after the first quarter
            steady = chunk_times[len(chunk_times) // 4:]
            steady_sps = (sum(CHUNK for _ in steady)
                          / max(sum(t for _, t in steady), 1e-9))
            gt_np = np.asarray(gt_t) if gt_t is not None else None
            est_np = np.asarray(est_t)
            odo_np = sys_.odom_trajectory()
            era_np = np.asarray([t for _, t in sys_.frame_poses])

            def _ate(est):
                if gt_np is None:
                    return None
                n = min(len(est), len(gt_np))
                d = est[:n] - gt_np[:n]
                return float(np.sqrt(np.mean(np.sum(d * d, -1))))

            results = {
                "sequence": ("circuit" if args.benchmark else
                             (args.npz or "corridor")),
                "sensor_model": {
                    "noise": bool(args.noise),
                    "dynamic_objects": bool(args.dynamic),
                    "motion_distortion": bool(args.distort),
                    "undistort_enabled": bool(args.undistort),
                },
                "frames": T,
                "path_length_m": (float(np.linalg.norm(
                    np.diff(gt_np, axis=0), axis=-1).sum())
                    if gt_np is not None else None),
                # per-stage error diagnostic: raw merged odometry vs the
                # live mapped/corrected frame poses vs the final PGO export
                "ate_odometry_m": _ate(odo_np),
                "ate_mapped_live_m": _ate(era_np),
                "ate_rmse_m": _ate(est_np),
                "end_error_m": (float(np.linalg.norm(est_np[-1] - gt_np[-1]))
                                if gt_np is not None else None),
                "skip_frames": sys_.num_skips,
                "skip_rate": sys_.num_skips / T,
                "keyframes": sys_.num_keyframes,
                "loop_closures": len(loops),
                "loops": [[int(a), int(b), float(f)] for a, b, f in loops],
                "compile_plus_first_frame_s": compile_s,
                "scans_per_sec_post_compile": (T - 1) / dt,
                "scans_per_sec_steady": steady_sps,
                "chunk_scans_per_sec": [
                    [k, CHUNK / t] for k, t in chunk_times],
                "platform": jax.devices()[0].platform,
            }
            out_path = args.out or "RESULTS_benchmark.json"
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1)
            print(f"results -> {out_path}")
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
