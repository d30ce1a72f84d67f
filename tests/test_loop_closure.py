"""End-to-end loop closure: an out-and-back corridor run must detect the
revisit, verify with ICP, and pull accumulated drift out of the trajectory
(SURVEY §4.3)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intensity_slam_tpu import config
from intensity_slam_tpu.io import synthetic
from intensity_slam_tpu.pipeline.system import SlamSystem
from intensity_slam_tpu.utils import se3


def _loop_trajectory(n_out=14, n_turn=8, speed=0.4):
    """Forward along +x, U-turn, return to start; ends near origin facing -x."""
    qs, ts = [], []
    pose = se3.Pose(jnp.array([1.0, 0, 0, 0]), jnp.array([0.0, 0.0, 0.8]))
    for _ in range(n_out):
        qs.append(pose.q); ts.append(pose.t)
        pose = se3.compose(pose, se3.Pose(jnp.array([1.0, 0, 0, 0]),
                                          jnp.array([speed, 0, 0])))
    dyaw = np.pi / n_turn
    for _ in range(n_turn):
        qs.append(pose.q); ts.append(pose.t)
        step = se3.Pose(se3.so3_exp(jnp.array([0.0, 0.0, dyaw])),
                        jnp.array([speed * 0.5, 0, 0]))
        pose = se3.compose(pose, step)
    for _ in range(n_out + 2):
        qs.append(pose.q); ts.append(pose.t)
        pose = se3.compose(pose, se3.Pose(jnp.array([1.0, 0, 0, 0]),
                                          jnp.array([speed, 0, 0])))
    return se3.Pose(jnp.stack(qs), jnp.stack(ts))


@pytest.fixture(scope="module")
def loop_cfg():
    cfg = config.SlamConfig()
    # short test sequence: shrink the recency exclusions sized for long runs
    return cfg.replace(loop=dataclasses.replace(
        cfg.loop,
        sc_num_exclude_recent=4,
        min_loop_search_gap=4,
        max_keyframes=64,
        keyframe_cloud_size=1024,
    ))


@pytest.mark.slow
def test_out_and_back_closes_loop(loop_cfg):
    cfg = loop_cfg
    world = synthetic.corridor_world()
    poses = _loop_trajectory()
    T = poses.q.shape[0]
    xyz, inten = jax.jit(
        lambda q, t: synthetic.render_sequence(se3.Pose(q, t), world, cfg.sensor)
    )(poses.q, poses.t)

    sys = SlamSystem(cfg)
    for k in range(T):
        sys.process(xyz[k], inten[k], k * 0.1)

    assert len(sys.kf_map_pose) >= 8, "expected multiple keyframes"
    assert len(sys.loops) >= 1, "no loop closure found on revisit"
    # the loop must connect a late keyframe to an early one
    cur, old, fit = sys.loops[0]
    assert cur - old >= 4
    assert fit < cfg.loop.icp_fitness_score

    # corrected trajectory must end near ground truth
    p0 = se3.Pose(poses.q[0], poses.t[0])
    gt = np.asarray(jax.vmap(
        lambda q, t: se3.compose(se3.inverse(p0), se3.Pose(q, t)).t
    )(poses.q, poses.t))
    traj = sys.trajectory()
    end_err_pgo = np.linalg.norm(traj[-1] - gt[-1])
    raw = np.stack([t for _, t in sys.frame_poses])
    end_err_raw = np.linalg.norm(raw[-1] - gt[-1])
    # the PGO-corrected end pose must be at least as good as raw odometry
    # and within a tight absolute bound
    assert end_err_pgo <= end_err_raw + 1e-6
    assert end_err_pgo < 0.35, f"pgo end err {end_err_pgo} (raw {end_err_raw})"


def test_out_and_back_closes_loop_small():
    """Small-config equivalent of the out-and-back loop closure (the
    full-size variant is @slow and runs in the slow pass)."""
    cfg = config.small_test_config()
    cfg = cfg.replace(loop=dataclasses.replace(
        cfg.loop,
        sc_num_exclude_recent=4,
        min_loop_search_gap=4,
        max_keyframes=64,
        keyframe_cloud_size=512,
    ))
    world = synthetic.corridor_world()
    poses = _loop_trajectory()
    T = poses.q.shape[0]
    xyz, inten = jax.jit(
        lambda q, t: synthetic.render_sequence(se3.Pose(q, t), world, cfg.sensor)
    )(poses.q, poses.t)

    sys = SlamSystem(cfg)
    for k in range(T):
        sys.process(xyz[k], inten[k], k * 0.1)

    assert len(sys.kf_map_pose) >= 8
    assert len(sys.loops) >= 1, "no loop closure found on revisit"
    cur, old, fit = sys.loops[0]
    assert cur - old >= 4
    p0 = se3.Pose(poses.q[0], poses.t[0])
    gt = np.asarray(jax.vmap(
        lambda q, t: se3.compose(se3.inverse(p0), se3.Pose(q, t)).t
    )(poses.q, poses.t))
    traj = sys.trajectory()
    end_err_pgo = np.linalg.norm(traj[-1] - gt[-1])
    raw = np.stack([t for _, t in sys.frame_poses])
    end_err_raw = np.linalg.norm(raw[-1] - gt[-1])
    assert end_err_pgo <= end_err_raw + 1e-6
    assert end_err_pgo < 0.6, f"pgo end err {end_err_pgo} (raw {end_err_raw})"
