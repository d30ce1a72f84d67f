"""End-to-end streaming runner test: islog -> native prefetch -> two-stream
SLAM -> async trajectory file."""

import jax
import numpy as np

from intensity_slam_tpu import config
from intensity_slam_tpu.io import synthetic
from intensity_slam_tpu.runtime import ScanLog, ScanLogWriter, StreamingRunner
from intensity_slam_tpu.utils import se3


def _make_log(path, frames=8):
    cfg = config.small_test_config()
    world = synthetic.corridor_world()
    poses = synthetic.corridor_trajectory(frames, speed=0.3, yaw_rate=0.0)
    xyz, inten = jax.jit(
        lambda q, t: synthetic.render_sequence(
            se3.Pose(q, t), world, cfg.sensor)
    )(poses.q, poses.t)
    xyz, inten = np.asarray(xyz), np.asarray(inten)
    with ScanLogWriter(str(path), cfg.sensor.image_height,
                       cfg.sensor.image_width) as w:
        for k in range(frames):
            w.append(0.1 * k, xyz[k], inten[k])
    return cfg


def test_streaming_runner(tmp_path):
    log_path = tmp_path / "seq.islog"
    traj_path = tmp_path / "traj.tum"
    cfg = _make_log(log_path, frames=8)
    runner = StreamingRunner(cfg, traj_path=str(traj_path))
    with ScanLog(str(log_path)) as log:
        stats = runner.run(log)
    assert stats["frames"] == 8
    assert stats["keyframes"] >= 1
    rows = traj_path.read_text().splitlines()
    assert len(rows) == 8
    # forward corridor motion: x must advance monotonically-ish
    xs = [float(r.split()[1]) for r in rows]
    assert xs[-1] > 0.5
