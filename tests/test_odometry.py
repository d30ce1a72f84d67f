import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intensity_slam_tpu import config
from intensity_slam_tpu.io import synthetic
from intensity_slam_tpu.pipeline import odometry
from intensity_slam_tpu.utils import se3


@pytest.fixture(scope="module")
def corridor_seq():
    """12-frame full-resolution corridor sequence with ground truth."""
    cfg = config.SlamConfig()
    world = synthetic.corridor_world()
    poses = synthetic.corridor_trajectory(12, speed=0.35, yaw_rate=0.01)
    xyz, inten = synthetic.render_sequence(poses, world, cfg.sensor)
    times = jnp.arange(12, dtype=jnp.float32) * cfg.sensor.scan_period
    return cfg, poses, xyz, inten, times


def test_sequence_odometry_ate(corridor_seq):
    cfg, gt_poses, xyz, inten, times = corridor_seq
    outs = odometry.run_sequence(xyz, inten, times, cfg)
    # frame 0 has no previous -> skip; everything after should track
    skips = np.asarray(outs.skip)
    assert skips[0]
    assert not skips[1:].any(), f"unexpected skips: {skips}"
    # estimated trajectory is relative to frame0's sensor frame; ground truth
    # relative to gt frame 0
    gt_rel = jax.vmap(
        lambda q, t: se3.compose(
            se3.inverse(se3.Pose(gt_poses.q[0], gt_poses.t[0])), se3.Pose(q, t)
        ).t
    )(gt_poses.q, gt_poses.t)
    ate = odometry.ate_rmse(outs.pose.t, gt_rel)
    assert float(ate) < 0.08, f"ATE {float(ate)} too high"
    # ~3.8 m traveled; end-position error under 5%
    end_err = jnp.linalg.norm(outs.pose.t[-1] - gt_rel[-1])
    assert float(end_err) < 0.2


def test_keyframe_gate(corridor_seq):
    cfg, _, xyz, inten, times = corridor_seq
    outs = odometry.run_sequence(xyz, inten, times, cfg)
    kfs = np.asarray(outs.is_keyframe)
    assert kfs[0]  # first frame always a keyframe
    # 0.35 m/frame at 10 Hz: every frame moves >0.3 m but dt gate needs >0.3 s
    # -> keyframes roughly every 4th frame
    assert 1 <= kfs[1:].sum() <= 5


def test_textureless_frames_skip():
    """Degeneracy contract: no texture -> no matches -> skip flag raises
    (the reference's skip_intensity chain, intensity_feature_tracker.cpp:722-730)."""
    cfg = config.SlamConfig()
    H, W = cfg.sensor.image_height, cfg.sensor.image_width
    # flat intensity: corner response is 0 everywhere -> no valid detections
    xyz = jnp.broadcast_to(
        jnp.array([5.0, 0.0, -0.8]), (3, H * W, 3)
    )
    inten = jnp.full((3, H * W), 100.0)
    times = jnp.arange(3, dtype=jnp.float32) * 0.1
    outs = odometry.run_sequence(xyz, inten, times, cfg)
    assert bool(np.asarray(outs.skip).all())
    # pose must stay at identity (delta = I when skipped)
    np.testing.assert_allclose(np.asarray(outs.pose.t), 0.0, atol=1e-6)


def test_streaming_matches_scan():
    """Step-by-step streaming gives identical results to lax.scan replay."""
    cfg = config.small_test_config()
    world = synthetic.corridor_world()
    poses = synthetic.corridor_trajectory(4, speed=0.3)
    xyz, inten = synthetic.render_sequence(poses, world, cfg.sensor)
    times = jnp.arange(4, dtype=jnp.float32) * 0.1
    outs = odometry.run_sequence(xyz, inten, times, cfg)

    from intensity_slam_tpu.ops import projection
    mask = projection.detection_mask(cfg.sensor)
    state = odometry.init_state(cfg)
    step = jax.jit(lambda s, x, i, t: odometry.odometry_step(
        s, projection.project_organized(x, i, cfg.sensor), t, mask, cfg))
    ts = []
    for k in range(4):
        state, out = step(state, xyz[k], inten[k], times[k])
        ts.append(out.pose.t)
    np.testing.assert_allclose(np.asarray(jnp.stack(ts)),
                               np.asarray(outs.pose.t), atol=1e-5)
