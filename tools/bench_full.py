#!/usr/bin/env python
"""Full-system benchmark: front-end, back-end, and streaming runner on chip.

`bench.py` reports the headline front-end+mapping throughput; this sibling
covers the rest of the system so perf work targets the real hotspot
(VERDICT r1 #6):

  * front-end `slam_step` steady-state (project -> features -> match ->
    robust GN -> ground -> scan-to-map)                     [scans/s]
  * back-end `backend_step` steady-state (ScanContext + BoW + radius loop
    channels -> ICP verify -> PGO solve)                    [keyframes/s]
  * `StreamingRunner` end-to-end over a native scan log (prefetcher +
    fused in-graph front+back step + async pose writer)      [scans/s]

Writes RESULTS_full_bench.json and prints a human table.  Not the driver's
bench entry point — `bench.py` stays the single-JSON-line headline.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from intensity_slam_tpu.utils.platform import honor_env_platform

honor_env_platform()

from intensity_slam_tpu import config
from intensity_slam_tpu.io import synthetic
from intensity_slam_tpu.ops import projection
from intensity_slam_tpu.pipeline import loop as loop_mod
from intensity_slam_tpu.pipeline import slam
from intensity_slam_tpu.runtime.scanlog import ScanLog, ScanLogWriter
from intensity_slam_tpu.runtime.stream import StreamingRunner
from intensity_slam_tpu.utils import se3
from intensity_slam_tpu.utils.se3 import Pose


def main() -> None:
    cfg = config.os0_64_config()   # OS0-64-exact default (r5)
    frames = 64
    world = synthetic.corridor_world()
    poses = synthetic.corridor_trajectory(frames, speed=0.35, yaw_rate=0.005)
    render = jax.jit(
        lambda q, t: synthetic.render_sequence(se3.Pose(q, t), world, cfg.sensor))
    xyz, inten = render(poses.q, poses.t)
    jax.block_until_ready(xyz)
    times = jnp.arange(frames, dtype=jnp.float32) * cfg.sensor.scan_period
    mask = projection.detection_mask(cfg.sensor)
    results = {"platform": jax.devices()[0].platform, "frames": frames}

    # ---- 1. front-end steady-state ----------------------------------------
    @jax.jit
    def front(state, x, i, t):
        return slam.slam_step(state, x, i, t, mask, cfg)

    state = slam.init_state(cfg)
    state, out = front(state, xyz[0], inten[0], times[0])
    jax.block_until_ready(out.pose.t)
    outs = []
    t0 = time.perf_counter()
    for k in range(1, frames):
        state, out = front(state, xyz[k], inten[k], times[k])
        outs.append(out)
    jax.block_until_ready(out.pose.t)
    dt = time.perf_counter() - t0
    results["frontend_scans_per_sec"] = (frames - 1) / dt
    print(f"front-end          {(frames - 1) / dt:9.1f} scans/s")

    # ---- 2. back-end steady-state (keyframe rate) -------------------------
    @jax.jit
    def backend(bst, x, m, d, dv, q, t, ts):
        return loop_mod.backend_step(bst, x, m, d, dv, Pose(q, t), ts, cfg)

    bstate = loop_mod.init_state(cfg)
    kf_outs = outs[:: max(1, len(outs) // 32)]  # keyframe-rate subsample
    scan_masks = [
        jnp.linalg.norm(xyz[k], axis=-1) >= cfg.sensor.min_range
        for k in range(1, frames, max(1, len(outs) // 32))
    ]
    # warm up (compile both the loop-found and no-loop branches run lazily
    # inside lax.cond, so one call compiles everything)
    o = kf_outs[0]
    bstate, bout = backend(bstate, xyz[1], scan_masks[0], o.desc, o.desc_valid,
                           o.pose.q, o.pose.t, times[1])
    jax.block_until_ready(bout.icp_fitness)
    n_kf = len(kf_outs) - 1
    t0 = time.perf_counter()
    for j, o in enumerate(kf_outs[1:], start=1):
        bstate, bout = backend(
            bstate, xyz[min(j * 2 + 1, frames - 1)], scan_masks[min(j, len(scan_masks) - 1)],
            o.desc, o.desc_valid, o.pose.q, o.pose.t, times[min(j * 2 + 1, frames - 1)])
    jax.block_until_ready(bout.icp_fitness)
    dt = time.perf_counter() - t0
    results["backend_keyframes_per_sec"] = n_kf / dt
    results["backend_ms_per_keyframe"] = 1e3 * dt / n_kf
    print(f"back-end           {n_kf / dt:9.1f} keyframes/s "
          f"({1e3 * dt / n_kf:.1f} ms/kf)")

    # ---- 3. StreamingRunner end-to-end over a native scan log -------------
    xyz_np = np.asarray(xyz)
    inten_np = np.asarray(inten)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "bench.islog")
        w = ScanLogWriter(path, cfg.sensor.image_height, cfg.sensor.image_width)
        for k in range(frames):
            w.append(float(times[k]), xyz_np[k], inten_np[k])
        w.close()

        # one runner reused for both passes: `StreamingRunner` jit-wraps its
        # steps per instance, so the first pass compiles and the second pass
        # (same runner, same log) measures the steady state
        runner = StreamingRunner(cfg, traj_path=os.path.join(td, "t.tum"))

        def run_once():
            with ScanLog(path) as log:
                t0 = time.perf_counter()
                stats = runner.run(log)
                dt = time.perf_counter() - t0
            return stats, dt

        run_once()                      # compile the fused step
        runner.reset()                  # measure from pristine state
        stats, dt = run_once()          # steady-state
        results["streaming_scans_per_sec"] = frames / dt
        results["streaming_keyframes"] = stats["keyframes"]
        results["streaming_loops"] = stats["loops"]
        # wire cost accounting: bytes/frame each transport mode ships
        n_pts = cfg.sensor.image_height * cfg.sensor.image_width
        results["wire_bytes_per_frame"] = (n_pts + 1) * 2 * 2   # uint16 pairs
        results["float_bytes_per_frame"] = (n_pts + 1) * 4 * 4  # f32 quads
        print(f"streaming e2e      {frames / dt:9.1f} scans/s "
              f"({stats['keyframes']} kf, {stats['loops']} loops, "
              f"{results['wire_bytes_per_frame'] / 1e3:.0f} kB/frame wire)")

        # ---- 4. transport-independent streaming (VERDICT r3 weak #1) ------
        # Same StreamingRunner, same jitted wire step, same async pose
        # writer — but the packed log is uploaded to the DEVICE once and
        # frames are sliced from it, so the host->device tunnel is off the
        # per-frame path.  run() minus run_preloaded() is the wire cost; on
        # local TPU hosts the two should be near-identical.
        # both passes start from pristine state: the wire pass above and
        # this preloaded pass see identical keyframe/loop work, so the
        # subtraction isolates transport (ADVICE r4: the old version
        # measured pass 2/3 against cumulative state)
        with ScanLog(path) as log:
            runner.run_preloaded(log)   # compile path is shared; warm anyway
            runner.reset()
            t0 = time.perf_counter()
            pstats = runner.run_preloaded(log)
            dtp = time.perf_counter() - t0
        rate_wire = frames / dt
        rate_pre = frames / dtp
        results["streaming_preloaded_scans_per_sec"] = rate_pre
        # fraction of the preloaded rate lost to the host->device transport
        results["streaming_transport_overhead_pct"] = round(
            100.0 * (rate_pre - rate_wire) / rate_pre, 1)
        print(f"streaming preload  {frames / dtp:9.1f} scans/s "
              f"(transport-free; {pstats['keyframes']} kf)")

    # vs the reference's 10 Hz real-time claim (README.md:2,13-20)
    results["vs_baseline_frontend"] = results["frontend_scans_per_sec"] / 10.0
    results["vs_baseline_streaming"] = results["streaming_scans_per_sec"] / 10.0
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "RESULTS_full_bench.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"results -> {out_path}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
