#!/usr/bin/env python
"""Benchmark: intensity-odometry throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the reference system's real-time claim: the full C++ pipeline
keeps up with the 10 Hz Ouster OS0-64 stream (64x1024 scans) on a 16-thread
CPU (README.md:2,13-20, config/spot.yaml:18-19).  vs_baseline is therefore
(scans/sec) / 10.

Methodology: a synthetic corridor sequence is pre-rendered on device, then
the streaming full-pipeline step (project -> detect/describe -> match ->
robust GN odometry solve -> ground RANSAC -> scan-to-map 5-NN + plane-fit
GN refine -> map insert) is timed frame by frame — the sequential path a
live sensor would exercise, excluding rendering.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from intensity_slam_tpu import config
from intensity_slam_tpu.io import synthetic
from intensity_slam_tpu.ops import projection
from intensity_slam_tpu.pipeline import slam
from intensity_slam_tpu.utils import se3


def main() -> None:
    cfg = config.SlamConfig()
    world = synthetic.corridor_world()
    frames = 64
    poses = synthetic.corridor_trajectory(frames, speed=0.35, yaw_rate=0.005)
    render = jax.jit(
        lambda q, t: synthetic.render_sequence(se3.Pose(q, t), world, cfg.sensor)
    )
    xyz, inten = render(poses.q, poses.t)
    jax.block_until_ready(xyz)

    mask = projection.detection_mask(cfg.sensor)

    @jax.jit
    def step(state, x, i, t):
        return slam.slam_step(state, x, i, t, mask, cfg)

    times = jnp.arange(frames, dtype=jnp.float32) * cfg.sensor.scan_period
    state = slam.init_state(cfg)
    # warmup/compile
    state, out = step(state, xyz[0], inten[0], times[0])
    jax.block_until_ready(out.pose.t)

    t0 = time.perf_counter()
    for k in range(1, frames):
        state, out = step(state, xyz[k], inten[k], times[k])
    jax.block_until_ready(out.pose.t)
    dt = time.perf_counter() - t0
    sps = (frames - 1) / dt

    print(json.dumps({
        "metric": "slam_scans_per_sec",
        "value": round(sps, 2),
        "unit": "scans/s (full pipeline: odometry+ground+scan-to-map, 64x1024)",
        "vs_baseline": round(sps / 10.0, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
