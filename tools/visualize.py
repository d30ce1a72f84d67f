#!/usr/bin/env python
"""rviz-free visualization dumps (reference C24).

The reference publishes debug artifacts to rviz: matched-keypoint images
(`intensity_feature_tracker.cpp:943-1050`, `mapOptimization.cpp:797-853`),
marker lines, keyposes and loop scans.  Headless equivalent: render the same
artifacts to PNG with matplotlib.

Usage:
  python tools/visualize.py --frames 12 --out /tmp/viz          # synthetic
  python tools/visualize.py --islog seq.islog --out /tmp/viz
Outputs:
  out/matches_XXXX.png   intensity pair + match lines (keyframes only)
  out/range_0000.png     first-frame range image (reference's `image_range`:
                         range * range_scale clamped to 255, CV_8UC1 style,
                         image_handler.h_ouster:131)
  out/trajectory.png     top-down trajectory (+ ground truth if known)
  out/map.png            accumulated ground/corner map scatter
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from intensity_slam_tpu.utils.platform import honor_env_platform  # noqa: E402

honor_env_platform()

from intensity_slam_tpu import config  # noqa: E402
from intensity_slam_tpu.ops import features, projection  # noqa: E402
from intensity_slam_tpu.pipeline import slam  # noqa: E402


def draw_matches(img_a, img_b, uv_a, uv_b, valid, path):
    """Two intensity images stacked with match lines, like the reference's
    cv::drawMatches debug topic."""
    H, W = img_a.shape
    canvas = np.concatenate([img_a, img_b], axis=0)
    fig, ax = plt.subplots(figsize=(14, 3.5), dpi=110)
    ax.imshow(canvas, cmap="gray", vmin=0, vmax=255, aspect="auto")
    sel = np.nonzero(valid)[0][:120]
    for i in sel:
        ax.plot([uv_a[i, 0], uv_b[i, 0]], [uv_a[i, 1], uv_b[i, 1] + H],
                lw=0.6, alpha=0.8)
    ax.scatter(uv_a[sel, 0], uv_a[sel, 1], s=3, c="lime")
    ax.scatter(uv_b[sel, 0], uv_b[sel, 1] + H, s=3, c="cyan")
    ax.set_title(f"{len(sel)} matches (top shown)")
    ax.axis("off")
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def draw_trajectory(est, gt, loops, path):
    fig, ax = plt.subplots(figsize=(7, 6), dpi=110)
    ax.plot(est[:, 0], est[:, 1], "-o", ms=2, label="estimate")
    if gt is not None:
        ax.plot(gt[:, 0], gt[:, 1], "--", label="ground truth")
    for a, b, _ in loops or []:
        ax.plot([est[a, 0], est[b, 0]], [est[a, 1], est[b, 1]],
                "r-", lw=1.5, alpha=0.7)
    ax.set_aspect("equal")
    ax.legend()
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_title("trajectory (top-down)")
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def draw_map(ground_pts, corner_pts, path):
    fig, ax = plt.subplots(figsize=(8, 6), dpi=110)
    if len(ground_pts):
        ax.scatter(ground_pts[:, 0], ground_pts[:, 1], s=0.5, c=ground_pts[:, 2],
                   cmap="terrain", label=f"ground ({len(ground_pts)})")
    if len(corner_pts):
        ax.scatter(corner_pts[:, 0], corner_pts[:, 1], s=2.0, c="red",
                   label=f"corners ({len(corner_pts)})")
    ax.set_aspect("equal")
    ax.legend(markerscale=8)
    ax.set_title("device-resident voxel map (top-down)")
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--islog", type=str, default=None)
    ap.add_argument("--out", type=str, default="/tmp/islam_viz")
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    cfg = config.small_test_config() if args.small else config.SlamConfig()
    gt = None
    if args.islog:
        from intensity_slam_tpu.runtime import ScanLog

        log = ScanLog(args.islog)
        frames = [(log[k].timestamp, np.array(log[k].xyz),
                   np.array(log[k].intensity))
                  for k in range(min(args.frames, len(log)))]
    else:
        from intensity_slam_tpu.io import synthetic
        from intensity_slam_tpu.utils import se3

        world = synthetic.corridor_world()
        poses = synthetic.corridor_trajectory(args.frames, speed=0.35,
                                              yaw_rate=0.02)
        xyz, inten = jax.jit(lambda q, t: synthetic.render_sequence(
            se3.Pose(q, t), world, cfg.sensor))(poses.q, poses.t)
        frames = [(0.1 * k, np.asarray(xyz[k]), np.asarray(inten[k]))
                  for k in range(args.frames)]
        p0 = se3.Pose(poses.q[0], poses.t[0])
        gt = np.asarray(jax.vmap(lambda q, t: se3.compose(
            se3.inverse(p0), se3.Pose(q, t)).t)(poses.q, poses.t))

    mask = projection.detection_mask(cfg.sensor)
    step = jax.jit(lambda st, x, i, t: slam.slam_step(st, x, i, t, mask, cfg))
    st = slam.init_state(cfg)
    prev = None
    traj = []
    for k, (ts, x, i) in enumerate(frames):
        xj, ij = jnp.asarray(x), jnp.asarray(i)
        st, out = step(st, xj, ij, jnp.float32(ts))
        traj.append(np.asarray(out.pose.t))
        scan = projection.project_organized(xj, ij, cfg.sensor)
        img = np.asarray(scan.intensity)
        if k == 0:
            # range image at the reference's debug gain (CV_8UC1 clamp,
            # `image_handler.h_ouster:131`)
            rng8 = np.clip(np.asarray(scan.range) * cfg.sensor.range_scale,
                           0, 255)
            fig, ax = plt.subplots(figsize=(14, 2), dpi=110)
            ax.imshow(rng8, cmap="gray", vmin=0, vmax=255, aspect="auto")
            ax.axis("off")
            fig.savefig(os.path.join(args.out, "range_0000.png"),
                        bbox_inches="tight")
            plt.close(fig)
        feats = features.extract(scan, mask, cfg.feature)
        if prev is not None and bool(out.is_keyframe):
            m = features.match(feats.desc, feats.xyz_valid, prev[1].desc,
                               prev[1].xyz_valid,
                               cfg.feature.match_keep_frac,
                               cfg.feature.max_hamming)
            draw_matches(img, prev[0],
                         np.asarray(feats.uv), np.asarray(prev[1].uv[m.dst_idx]),
                         np.asarray(m.valid),
                         os.path.join(args.out, f"matches_{k:04d}.png"))
        prev = (img, feats)

    traj = np.stack(traj)
    draw_trajectory(traj, gt[: len(traj)] if gt is not None else None, [],
                    os.path.join(args.out, "trajectory.png"))
    gm = st.mapping.ground_map
    cm = st.mapping.corner_map
    gp = np.asarray(gm.pts.reshape(-1, 3))[np.asarray(gm.valid.reshape(-1))]
    cp = np.asarray(cm.pts.reshape(-1, 3))[np.asarray(cm.valid.reshape(-1))]
    draw_map(gp, cp, os.path.join(args.out, "map.png"))
    print(f"wrote {len(os.listdir(args.out))} artifacts -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
