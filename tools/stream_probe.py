#!/usr/bin/env python
"""Find the real streaming bottleneck (VERDICT r4 item 5).

r4's decisive experiment exonerated the host->device transport
(preloaded 25.6 < socket 29.6 scans/s), so the ~4x gap to the fused rate
lives in the streaming stack itself.  Chief suspect on this rig: the
async pose writer performs ONE DEVICE FETCH PER FRAME on its writer
thread (np.asarray(pose_t)); on the remote-TPU tunnel each fetch is an
RPC, and the per-frame fetches contend with the per-frame uploads on the
same transport.

This probe measures run_preloaded() over the same log in three modes:
  writer-on    the shipped path (per-frame pose handle -> writer thread)
  writer-off   traj_path=None (no per-frame device fetches)
  bare-loop    plain fused_step dispatch over the device log (the
               theoretical ceiling of the streaming stack)
Writes RESULTS_stream_probe.json.
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
from intensity_slam_tpu.runtime.scanlog import ScanLog, ScanLogWriter
from intensity_slam_tpu.runtime.stream import StreamingRunner
from intensity_slam_tpu.utils import se3

FRAMES = int(os.environ.get("FRAMES", "256"))


def main() -> int:
    cfg = config.os0_64_config()
    world = synthetic.circuit_world()
    poses = synthetic.circuit_trajectory(FRAMES, speed=0.4)
    render = jax.jit(lambda q, t: synthetic.render_sequence(
        se3.Pose(q, t), world, cfg.sensor))
    chunks = []
    for s in range(0, FRAMES, 32):
        cx, ci = render(poses.q[s:s + 32], poses.t[s:s + 32])
        chunks.append((np.asarray(cx), np.asarray(ci)))
    xyz = np.concatenate([c[0] for c in chunks])
    inten = np.concatenate([c[1] for c in chunks])
    del chunks
    res = {"frames": FRAMES}

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "probe.islog")
        w = ScanLogWriter(path, cfg.sensor.image_height, cfg.sensor.image_width)
        for k in range(FRAMES):
            w.append(0.1 * k, xyz[k], inten[k])
        w.close()

        # --- writer ON (shipped path)
        r_on = StreamingRunner(cfg, traj_path=os.path.join(td, "t.tum"))
        with ScanLog(path) as log:
            r_on.run_preloaded(log)          # compile
            r_on.reset()
            t0 = time.perf_counter()
            r_on.run_preloaded(log)
            dt_on = time.perf_counter() - t0
        res["preloaded_writer_on_sps"] = round(FRAMES / dt_on, 1)

        # --- writer OFF
        r_off = StreamingRunner(cfg, traj_path=None)
        with ScanLog(path) as log:
            r_off.run_preloaded(log)
            r_off.reset()
            t0 = time.perf_counter()
            r_off.run_preloaded(log)
            dt_off = time.perf_counter() - t0
        res["preloaded_writer_off_sps"] = round(FRAMES / dt_off, 1)

        # --- bare dispatch loop over the device log (ceiling)
        from intensity_slam_tpu.runtime.stream import (_build_dir_lut,
                                                       _WIRE_MAX_RANGE)
        from intensity_slam_tpu.ops import projection
        from intensity_slam_tpu.pipeline import fused

        with ScanLog(path) as log:
            dirs = jnp.asarray(_build_dir_lut(log))
            packed = [wf.packed for wf in
                      log.stream_wire(0, FRAMES, 4, _WIRE_MAX_RANGE)]
        dev_log = jnp.asarray(np.stack(packed))
        mask = projection.detection_mask(cfg.sensor)

        def wire_step(st, pk, dd):
            ts = (pk[0, 0].astype(jnp.float32) * 65536.0
                  + pk[0, 1].astype(jnp.float32)) * 1e-3
            rng = pk[1:, 0].astype(jnp.float32) * (_WIRE_MAX_RANGE / 65535.0)
            return fused.fused_step(st, rng[:, None] * dd,
                                    pk[1:, 1].astype(jnp.float32), ts,
                                    mask, cfg)

        stepc = jax.jit(wire_step, donate_argnums=(0,))
        st = fused.init_state(cfg)
        st, info = stepc(st, dev_log[0], dirs)
        jax.block_until_ready(info.num_kf)
        st = fused.init_state(cfg)
        t0 = time.perf_counter()
        for j in range(FRAMES):
            st, info = stepc(st, dev_log[j], dirs)
        jax.block_until_ready(info.num_kf)
        dt_bare = time.perf_counter() - t0
        res["bare_dispatch_sps"] = round(FRAMES / dt_bare, 1)

    res["writer_cost_pct"] = round(
        100.0 * (res["preloaded_writer_off_sps"]
                 - res["preloaded_writer_on_sps"])
        / res["preloaded_writer_off_sps"], 1)
    res["stack_overhead_vs_bare_pct"] = round(
        100.0 * (res["bare_dispatch_sps"]
                 - res["preloaded_writer_off_sps"])
        / res["bare_dispatch_sps"], 1)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "RESULTS_stream_probe.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
