#!/usr/bin/env python
"""Diagnose the OS0-64 (+-45 deg FOV) accuracy collapse (VERDICT r4 #1).

Renders circuit frames on both beam tables and compares, per frame:
valid-pixel fraction, rows containing wall (non-ground, non-sky) content,
feature detect/match counts, skip rate, and front-end-only odometry drift.
"""

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
from intensity_slam_tpu.ops import projection, features, ground
from intensity_slam_tpu.utils import se3

FRAMES = 60


def diag(cfg, name):
    world = synthetic.circuit_world()
    poses = synthetic.circuit_trajectory(FRAMES, speed=0.4)
    xyz, inten = jax.jit(lambda q, t: synthetic.render_sequence(
        se3.Pose(q, t), world, cfg.sensor))(poses.q, poses.t)
    mask = projection.detection_mask(cfg.sensor)
    H, W = cfg.sensor.image_height, cfg.sensor.image_width

    scan0 = projection.project_organized(xyz[0], inten[0], cfg.sensor)
    valid = np.asarray(scan0.valid)
    z = np.asarray(scan0.xyz[..., 2])
    is_ground = valid & (z < -0.45)
    is_wall = valid & (z >= -0.45)
    print(f"== {name}")
    print(f"  valid frac {valid.mean():.3f}  ground frac {is_ground.mean():.3f}"
          f"  wall frac {is_wall.mean():.3f}")
    rows_wall = is_wall.mean(axis=1)
    print("  wall frac by row (8-row blocks):",
          np.round(rows_wall.reshape(8, -1).mean(axis=1), 3))

    # feature detect/match over consecutive frames
    det = jax.jit(lambda s: features.extract(s, mask, cfg.feature))
    prev = None
    goods, skips = [], []
    feat_rows = np.zeros(H)
    for k in range(0, 20):
        s = projection.project_organized(xyz[k], inten[k], cfg.sensor)
        f = det(s)
        fv = np.asarray(f.valid & f.xyz_valid)
        uv = np.asarray(f.uv)
        for r in uv[fv, 1]:
            feat_rows[r] += 1
        if prev is not None:
            m = features.match(prev.desc, prev.valid & prev.xyz_valid,
                               f.desc, f.valid & f.xyz_valid,
                               cfg.feature.match_keep_frac,
                               cfg.feature.max_hamming)
            ng = int(np.asarray(m.num_good))
            goods.append(ng)
            skips.append(ng < cfg.feature.min_good_matches)
        prev = f
    print(f"  det valid feats/frame ~{fv.sum()},  good matches {goods}")
    print("  feature row distribution (8-row blocks):",
          np.round(feat_rows.reshape(8, -1).sum(axis=1) / max(feat_rows.sum(), 1), 3))

    # ground extraction health
    key = jax.random.PRNGKey(0)
    g = ground.extract_ground(key, xyz[0], scan0.valid.reshape(-1), cfg.ground)
    print(f"  ground ok={bool(g.ok)} inliers={int(np.asarray(g.ground_mask).sum())}")

    # front-end-only odometry (no mapping): measure per-frame delta error
    from intensity_slam_tpu.pipeline import odometry
    ost = odometry.init_state(cfg)
    step = jax.jit(lambda st, s, t: odometry.odometry_step(st, s, t, mask, cfg))
    est = se3.Pose(jnp.array([1.0, 0, 0, 0]), jnp.zeros(3))
    errs = []
    nskip = 0
    for k in range(FRAMES):
        s = projection.project_organized(xyz[k], inten[k], cfg.sensor)
        ost, oo = step(ost, s, jnp.float32(0.1 * k))
        est = se3.compose(est, oo.delta)
        nskip += int(np.asarray(oo.skip))
        # ground-truth relative pose from frame 0
        p0 = se3.Pose(poses.q[0], poses.t[0])
        gt_rel = se3.compose(se3.inverse(p0), se3.Pose(poses.q[k], poses.t[k]))
        errs.append(float(jnp.linalg.norm(est.t - gt_rel.t)))
    print(f"  front-end-only: skips={nskip}/{FRAMES}  "
          f"drift@{FRAMES}f={errs[-1]:.3f} m  max={max(errs):.3f} m")
    print(f"  drift curve: {[round(e, 2) for e in errs[::10]]}")


if __name__ == "__main__":
    diag(config.SlamConfig(), "legacy +-16.6")
    diag(config.os0_64_config(), "OS0-64 +-45")
