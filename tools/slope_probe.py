#!/usr/bin/env python
"""Decompose the keyframe-count throughput slope (VERDICT r4 weak #6/item 8).

The r4 soak settled at 23-26 scans/s at full store vs the 113 scans/s
small-store headline.  All back-end array shapes are static (K=1024), so
the slope cannot come from array growth; the suspects are per-frame CLASS
frequencies — keyframe ingest, candidate ICP verifies, accepted-loop dense
PGO solves + map rebuilds — whose rates rise with revisit density.

This probe times EVERY dispatch synchronously (block_until_ready) over a
multi-lap circuit run and buckets frames:
  plain     — no keyframe work (front-end + mapping only)
  kf        — keyframe ingest, no loop candidate verified
  verify    — candidate verified (ICP + gates) and rejected
  accept    — loop accepted (ICP + PCM + dense PGO + map rebuild)
Writes RESULTS_slope.json with per-class mean/percentile times and each
class's share of total wall time, per 600-frame chunk.
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

FRAMES = int(os.environ.get("FRAMES", "2400"))


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
    xyz = jnp.asarray(np.concatenate([c[0] for c in chunks]))
    inten = jnp.asarray(np.concatenate([c[1] for c in chunks]))
    del chunks

    sys_ = SlamSystem(cfg)
    # compile
    info = sys_.process(xyz[0], inten[0], 0.0)
    jax.block_until_ready(info.num_kf)

    rows = []   # (class, ms)
    t_run0 = time.perf_counter()
    for k in range(1, FRAMES):
        t0 = time.perf_counter()
        info = sys_.process(xyz[k], inten[k], 0.1 * k)
        jax.block_until_ready(info.num_kf)
        ms = 1e3 * (time.perf_counter() - t0)
        is_kf = bool(info.is_keyframe)
        verified = np.isfinite(float(info.icp_fitness))
        accepted = bool(info.loop_found)
        cls = ("accept" if accepted else
               "verify" if verified else
               "kf" if is_kf else "plain")
        rows.append((cls, ms, int(info.num_kf)))
    wall = time.perf_counter() - t_run0

    res = {"frames": FRAMES, "wall_s_sync": round(wall, 1),
           "note": "per-frame block_until_ready: wall here is an UPPER "
                   "bound (async pipelining is disabled by the probe)",
           "classes": {}, "chunks": []}
    for cls in ("plain", "kf", "verify", "accept"):
        ts = np.array([m for c, m, _ in rows if c == cls])
        if len(ts) == 0:
            continue
        res["classes"][cls] = {
            "count": int(len(ts)),
            "mean_ms": round(float(ts.mean()), 2),
            "p50_ms": round(float(np.percentile(ts, 50)), 2),
            "p95_ms": round(float(np.percentile(ts, 95)), 2),
            "total_s": round(float(ts.sum()) / 1e3, 1),
            "share_pct": round(100 * float(ts.sum()) / (wall * 1e3), 1),
        }
    CH = 600
    for s in range(0, len(rows), CH):
        seg = rows[s:s + CH]
        tot = sum(m for _, m, _ in seg) / 1e3
        res["chunks"].append({
            "frames": f"{s+1}-{s+len(seg)}",
            "num_kf_end": seg[-1][2],
            "scans_per_sec_sync": round(len(seg) / tot, 1),
            "verifies": sum(1 for c, _, _ in seg if c == "verify"),
            "accepts": sum(1 for c, _, _ in seg if c == "accept"),
        })
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "RESULTS_slope.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
