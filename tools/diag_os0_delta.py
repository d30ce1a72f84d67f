#!/usr/bin/env python
"""Per-frame delta-error decomposition for the OS0 table: where does the
drift accumulate (turns vs straights), and what do skip/match stats look
like there?"""

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
from intensity_slam_tpu.ops import projection
from intensity_slam_tpu.pipeline import slam
from intensity_slam_tpu.utils import se3

FRAMES = int(os.environ.get("FRAMES", "200"))


def run(cfg, name):
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

    mask = projection.detection_mask(cfg.sensor)
    st = slam.init_state(cfg)
    step = jax.jit(lambda s_, x, i, t: slam.slam_step(s_, x, i, t, mask, cfg))
    rows = []
    prev_pose = se3.Pose(poses.q[0], poses.t[0])
    prev_est = se3.Pose(jnp.array([1.0, 0, 0, 0]), jnp.zeros(3))
    for k in range(FRAMES):
        st, out = step(st, xyz[k], inten[k], jnp.float32(0.1 * k))
        cur = se3.Pose(poses.q[k], poses.t[k])
        gt_d = se3.compose(se3.inverse(prev_pose), cur)
        est_d = se3.compose(se3.inverse(prev_est), out.odom_pose)
        dt = float(jnp.linalg.norm(est_d.t - gt_d.t))
        dq = se3.quat_mul(se3.quat_conj(gt_d.q), est_d.q)
        drot = float(2 * np.arccos(min(1.0, abs(float(dq[0])))))
        rows.append((k, dt, drot, int(out.skip), int(out.num_good),
                     float(np.degrees(np.arctan2(
                         2 * (float(gt_d.q[0]) * float(gt_d.q[3])),
                         1 - 2 * float(gt_d.q[3]) ** 2)))))
        prev_pose, prev_est = cur, out.odom_pose
    rows = np.array(rows)
    turn = np.abs(rows[:, 5]) > 2.0   # gt yaw rate > 2 deg/frame
    print(f"== {name}")
    print(f"  turns: {turn.sum()} frames; straights: {(~turn).sum()}")
    for lbl, m in (("turn", turn), ("straight", ~turn)):
        r = rows[m]
        print(f"  {lbl:9s}: dt mean {r[:,1].mean()*1000:.1f} mm  "
              f"drot mean {np.degrees(r[:,2].mean())*60:.1f} arcmin  "
              f"skips {int(r[:,3].sum())}  matches {r[:,4].mean():.0f}")
    # total accumulated |dt| error vs contribution
    print(f"  total |dt| err: turns {rows[turn,1].sum():.2f} m, "
          f"straights {rows[~turn,1].sum():.2f} m")
    print(f"  total |drot| err: turns {np.degrees(rows[turn,2].sum()):.2f} deg, "
          f"straights {np.degrees(rows[~turn,2].sum()):.2f} deg")
    worst = rows[np.argsort(-rows[:, 1])[:10]]
    print("  worst-10 dt frames:", [(int(w[0]), round(w[1], 3), int(w[3]),
                                     int(w[4])) for w in worst])
    lo, hi = int(os.environ.get("ZLO", "0")), int(os.environ.get("ZHI", "0"))
    if hi > lo:
        print(f"  zoom [{lo},{hi}): (frame, dt_mm, drot_arcmin, skip, match)")
        for r in rows[lo:hi]:
            print(f"    f{int(r[0]):4d} dt={r[1]*1000:7.1f} "
                  f"rot={np.degrees(r[2])*60:7.1f} skip={int(r[3])} "
                  f"good={int(r[4])}")


if __name__ == "__main__":
    t = os.environ.get("TABLE", "both")
    if t in ("os0", "both"):
        run(config.os0_64_config(), "OS0-64 +-45")
    if t in ("legacy", "both"):
        run(config.SlamConfig(), "legacy +-16.6")
