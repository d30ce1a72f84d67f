import jax
import jax.numpy as jnp
import numpy as np

from intensity_slam_tpu import config
from intensity_slam_tpu.io import synthetic
from intensity_slam_tpu.ops import projection
from intensity_slam_tpu.utils import se3

CFG = config.small_test_config()


def _scan(pose=None):
    world = synthetic.corridor_world()
    pose = pose or se3.Pose(jnp.array([1.0, 0, 0, 0]), jnp.array([0.0, 0, 0.8]))
    xyz, inten = synthetic.render_scan(pose, world, CFG.sensor)
    return xyz, inten


def test_project_organized_roundtrip():
    xyz, inten = _scan()
    scan = projection.project_organized(xyz, inten, CFG.sensor)
    H, W = CFG.sensor.image_height, CFG.sensor.image_width
    assert scan.intensity.shape == (H, W)
    assert scan.xyz.shape == (H, W, 3)
    # valid pixels reproduce the input points exactly
    flat_xyz = scan.xyz.reshape(-1, 3)
    flat_valid = scan.valid.reshape(-1)
    np.testing.assert_allclose(
        np.asarray(flat_xyz[flat_valid]),
        np.asarray(xyz[np.asarray(flat_valid)]),
        atol=1e-6,
    )
    # range is the norm of xyz at valid pixels
    r = jnp.linalg.norm(flat_xyz, axis=-1)
    np.testing.assert_allclose(
        np.asarray(scan.range.reshape(-1)[flat_valid]),
        np.asarray(r[flat_valid]), atol=1e-4)
    # intensity clamped
    assert float(scan.intensity.max()) <= 255.0
    # a corridor scan should see plenty of the world
    assert float(jnp.mean(scan.valid)) > 0.5


def test_near_points_invalidated():
    xyz = jnp.zeros((CFG.sensor.num_points, 3)).at[0].set(jnp.array([0.05, 0, 0]))
    inten = jnp.ones((CFG.sensor.num_points,))
    scan = projection.project_organized(xyz, inten, CFG.sensor)
    # range 0.05 < min_range 0.1 -> invalid and zeroed (image_handler.h_ouster:126)
    assert not bool(scan.valid.reshape(-1)[0])
    np.testing.assert_allclose(np.asarray(scan.xyz.reshape(-1, 3)[0]), 0.0)


def test_detection_mask_crop():
    mask = projection.detection_mask(CFG.sensor)
    crop = CFG.sensor.image_crop
    assert not bool(mask[0, 0]) and not bool(mask[0, crop - 1])
    assert bool(mask[0, crop]) and bool(mask[0, CFG.sensor.image_width - crop])


def test_lift_uv():
    xyz, inten = _scan()
    scan = projection.project_organized(xyz, inten, CFG.sensor)
    uv = jnp.array([[10, 5], [100, 20]])
    pts, ok = projection.lift_uv_to_3d(scan, uv)
    np.testing.assert_allclose(np.asarray(pts[0]), np.asarray(scan.xyz[5, 10]))


def test_project_unorganized_consistency():
    # render an organized scan, shuffle the points, re-project spherically
    xyz, inten = _scan()
    scan_o = projection.project_organized(xyz, inten, CFG.sensor)
    perm = jax.random.permutation(jax.random.PRNGKey(0), xyz.shape[0])
    scan_u = projection.project_unorganized(xyz[perm], inten[perm], CFG.sensor)
    # most pixels that are valid in both should agree in range closely
    both = scan_o.valid & scan_u.valid
    assert float(jnp.mean(both)) > 0.3
    diff = jnp.abs(scan_o.range - scan_u.range)
    med = jnp.median(diff[both])
    assert float(med) < 0.5


def test_render_sequence_batch():
    world = synthetic.corridor_world()
    poses = synthetic.corridor_trajectory(3)
    xyz, inten = synthetic.render_sequence(poses, world, CFG.sensor)
    assert xyz.shape == (3, CFG.sensor.num_points, 3)
    assert bool(jnp.all(jnp.isfinite(xyz)))


def test_undistort_scan_linear_translation():
    """Constant-velocity undistortion (A-LOAM TransformToStart,
    `laserOdometry.cpp:147-194`): under a pure-translation delta each point
    moves by (col/W) * t."""
    from intensity_slam_tpu.pipeline import slam
    from intensity_slam_tpu.utils.se3 import Pose

    sc = CFG.sensor
    N = sc.num_points
    xyz = jnp.tile(jnp.array([5.0, 1.0, -0.5]), (N, 1))
    delta = Pose(jnp.array([1.0, 0.0, 0.0, 0.0]), jnp.array([0.4, 0.0, 0.0]))
    out = slam.undistort_scan(xyz, delta, CFG)
    col = (jnp.arange(N) % sc.image_width).astype(jnp.float32)
    expect_x = 5.0 + 0.4 * col / sc.image_width
    assert float(jnp.max(jnp.abs(out[:, 0] - expect_x))) < 1e-5
    assert float(jnp.max(jnp.abs(out[:, 1] - 1.0))) < 1e-5


def test_slam_step_undistort_enabled_runs():
    import dataclasses

    from intensity_slam_tpu.pipeline import slam

    cfg = dataclasses.replace(
        CFG, sensor=dataclasses.replace(CFG.sensor, undistort=True))
    xyz, inten = _scan()
    mask = projection.detection_mask(cfg.sensor)
    st = slam.init_state(cfg)
    step = jax.jit(lambda s, x, i, t: slam.slam_step(s, x, i, t, mask, cfg))
    for k in range(3):
        st, out = step(st, xyz, inten, jnp.float32(0.1 * k))
    assert bool(jnp.all(jnp.isfinite(out.pose.t)))
