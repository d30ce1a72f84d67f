#!/usr/bin/env python
"""Full-config long-run soak on chip (VERDICT r3 item 5).

Drives the FULL default config past BOTH capacity limits in one session:
> 2x max_keyframes (1024) keyframes and > log_capacity (8192) frames, so
keyframe-store decimation, loop-edge ring wrap, map eviction, frame-log
wrap AND the host spill all fire mid-run — then asserts frame time stays
bounded (no compile cliffs, no drift) and the exported FULL trajectory is
correct across every wrap.

The workload is the circuit world replayed lap after lap: one lap is
rendered once (the trajectory is closed, so lap N's frames equal lap 1's)
and the same frames stream in with continuing timestamps — 9000 frames =
~23 laps, ~3.2 km.  Ground truth tiles the lap.  Writes RESULTS_soak.json.
"""

import json
import os
import sys
import time

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

SCAN_DT = 0.1


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=9000)
    ap.add_argument("--out", type=str, default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "RESULTS_soak.json"))
    args = ap.parse_args()

    cfg = config.os0_64_config()   # OS0-64-exact default (r5)
    # one closed lap: 4 x 35 m legs at 0.4 m/frame + 4 smooth quarter turns
    LAP = 390
    world = synthetic.circuit_world()
    poses = synthetic.circuit_trajectory(LAP + 1, speed=0.4)
    # closure check: the lap must end where it starts for frame reuse
    gap = float(jnp.linalg.norm(poses.t[LAP] - poses.t[0]))
    print(f"lap closure gap: {gap:.2f} m (frame reuse valid below ~2 m)")
    render = jax.jit(lambda q, t: synthetic.render_sequence(
        se3.Pose(q, t), world, cfg.sensor))
    chunks = []
    for s in range(0, LAP, 32):
        cx, ci = render(poses.q[s:s + 32], poses.t[s:s + 32])
        chunks.append((np.asarray(cx), np.asarray(ci)))
    xyz = jnp.asarray(np.concatenate([c[0] for c in chunks]))
    inten = jnp.asarray(np.concatenate([c[1] for c in chunks]))
    del chunks
    p0 = se3.Pose(poses.q[0], poses.t[0])
    lap_gt = np.asarray(jax.vmap(
        lambda q, t: se3.compose(se3.inverse(p0), se3.Pose(q, t)).t
    )(poses.q[:LAP], poses.t[:LAP]))
    gt_t = np.tile(lap_gt, (args.frames // LAP + 1, 1))[: args.frames]

    sys_ = SlamSystem(cfg)
    t0 = time.perf_counter()
    info = sys_.process(xyz[0], inten[0], 0.0)
    jax.block_until_ready(info.num_kf)
    compile_s = time.perf_counter() - t0

    CHUNK = 500
    chunk_stats = []
    t0 = time.perf_counter()
    tc = t0
    for k in range(1, args.frames):
        info = sys_.process(xyz[k % LAP], inten[k % LAP], SCAN_DT * k)
        if k % CHUNK == 0:
            n_kf = int(info.num_kf)          # sync once per chunk
            now = time.perf_counter()
            chunk_stats.append({
                "frame": k,
                "scans_per_sec": round(CHUNK / (now - tc), 1),
                "keyframes": n_kf,
            })
            print(f"frame {k:5d}: {chunk_stats[-1]['scans_per_sec']:7.1f} "
                  f"scans/s  kf={n_kf}", flush=True)
            tc = now
    jax.block_until_ready(info.num_kf)
    total_s = time.perf_counter() - t0

    traj = sys_.trajectory()                 # spill + live window
    n = len(traj)
    bad = ~np.isfinite(traj).all(axis=-1)
    if bad.any():
        idx = np.where(bad)[0]
        print(f"NONFINITE trajectory rows: {int(bad.sum())} "
              f"(first {idx[0]}, last {idx[-1]}; spilled frames "
              f"cover [0, {sys_._spiller.spilled}))")
    err = np.linalg.norm(traj - gt_t[:n], axis=-1)
    rates = [c["scans_per_sec"] for c in chunk_stats]
    res = {
        "frames": args.frames,
        "laps": round(args.frames / LAP, 1),
        "distance_m": round(args.frames * 0.4, 0),
        "compile_s": round(compile_s, 1),
        "total_s": round(total_s, 1),
        "scans_per_sec_overall": round((args.frames - 1) / total_s, 1),
        "scans_per_sec_chunks_min": min(rates),
        "scans_per_sec_chunks_max": max(rates),
        "keyframes_final": int(sys_.bstate.num_kf),
        "max_keyframes": cfg.loop.max_keyframes,
        "log_capacity": cfg.log_capacity,
        "log_count": int(sys_.state.log.count),
        "loops_accepted": len(sys_.loops),
        "trajectory_frames_exported": n,
        "spilled_frames": sys_._spiller.spilled,
        "ate_m": round(float(np.sqrt(np.mean(err ** 2))), 3),
        "max_err_m": round(float(err.max()), 3),
        "end_err_m": round(float(err[-1]), 3),
        "chunks": chunk_stats,
    }
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items() if k != "chunks"},
                     indent=1))
    print(f"results -> {args.out}")
    # bounded-rate assertion: no chunk slower than 40% of the median
    med = float(np.median(rates))
    assert min(rates) > 0.4 * med, (
        f"frame rate collapsed: min {min(rates)} vs median {med}")
    assert n == args.frames, "full-session export lost frames"
    return 0


if __name__ == "__main__":
    sys.exit(main())
