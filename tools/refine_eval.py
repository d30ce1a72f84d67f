#!/usr/bin/env python
"""Quantify the distributed refine's effect on the PRODUCT trajectory
(VERDICT r3 weak 6 / item 7): run the circuit benchmark with the online
refine off / on (single-device and mesh) and with BA pose write-back
off / on, and report the corrected-export + live ATE deltas.

Writes RESULTS_refine.json; the PARITY.md defaults discussion cites it.
"""

import dataclasses
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


def run(cfg, xyz, inten, gt_t, frames) -> dict:
    sys_ = SlamSystem(cfg)
    t0 = time.perf_counter()
    for k in range(frames):
        sys_.process(xyz[k], inten[k], SCAN_DT * k)
    # one final refine at session end when enabled (batch counterpart of
    # updatePoses; the online trigger already ran every refine_every_kf)
    if cfg.parallel.refine_every_kf > 0:
        sys_.refine()
    traj = sys_.trajectory()
    dt = time.perf_counter() - t0
    err = np.linalg.norm(traj - gt_t[: len(traj)], axis=-1)
    return {
        "ate_m": round(float(np.sqrt(np.mean(err ** 2))), 4),
        "end_err_m": round(float(err[-1]), 4),
        "loops": len(sys_.loops),
        "keyframes": int(sys_.bstate.num_kf),
        "wall_s": round(dt, 1),
    }


def main() -> int:
    frames = 420
    base = config.SlamConfig()
    world = synthetic.circuit_world()
    poses = synthetic.circuit_trajectory(frames, speed=0.4)
    render = jax.jit(lambda q, t: synthetic.render_sequence(
        se3.Pose(q, t), world, base.sensor))
    chunks = []
    for s in range(0, frames, 32):
        cx, ci = render(poses.q[s:s + 32], poses.t[s:s + 32])
        chunks.append((np.asarray(cx), np.asarray(ci)))
    xyz = jnp.asarray(np.concatenate([c[0] for c in chunks]))
    inten = jnp.asarray(np.concatenate([c[1] for c in chunks]))
    del chunks
    p0 = se3.Pose(poses.q[0], poses.t[0])
    gt_t = np.asarray(jax.vmap(
        lambda q, t: se3.compose(se3.inverse(p0), se3.Pose(q, t)).t
    )(poses.q, poses.t))

    variants = {
        "baseline_no_refine": base,
        "refine_every_8kf": base.replace(parallel=dataclasses.replace(
            base.parallel, refine_every_kf=8)),
        "refine_every_8kf_ba_writeback": base.replace(
            parallel=dataclasses.replace(
                base.parallel, refine_every_kf=8, ba_pose_writeback=True)),
    }
    results = {"frames": frames, "world": "circuit", "variants": {}}
    for name, cfg in variants.items():
        r = run(cfg, xyz, inten, gt_t, frames)
        results["variants"][name] = r
        print(f"{name:32s} ate={r['ate_m']:.4f} end={r['end_err_m']:.4f} "
              f"loops={r['loops']} ({r['wall_s']}s)", flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "RESULTS_refine.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"results -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
