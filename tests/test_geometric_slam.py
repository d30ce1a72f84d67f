"""KITTI-style unorganized pipeline end to end (BASELINE.json config #2).

Velodyne-style input: the organized renderer's points, flattened and
randomly permuted so no organized structure survives — the spherical
projection (`scanRegistration.cpp:290-325` analogue) must rebuild it, and
the geometric-only odometry + A-LOAM mapping must track the trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intensity_slam_tpu import config
from intensity_slam_tpu.io import synthetic
from intensity_slam_tpu.ops import projection
from intensity_slam_tpu.pipeline import geometric_slam
from intensity_slam_tpu.utils import se3


@pytest.fixture(scope="module")
def cfg():
    return config.small_test_config()


@pytest.fixture(scope="module")
def unorganized_seq(cfg):
    """Render an organized corridor sequence, then destroy the organization
    (permute points per frame) to emulate an unorganized Velodyne packet."""
    world = synthetic.corridor_world()
    T = 12
    poses = synthetic.corridor_trajectory(T, speed=0.3, yaw_rate=0.01)
    xyz, inten = jax.jit(lambda q, t: synthetic.render_sequence(
        se3.Pose(q, t), world, cfg.sensor))(poses.q, poses.t)
    key = jax.random.PRNGKey(0)
    perms = jax.vmap(
        lambda k: jax.random.permutation(k, xyz.shape[1])
    )(jax.random.split(key, T))
    xyz_u = jnp.take_along_axis(xyz, perms[:, :, None], axis=1)
    inten_u = jnp.take_along_axis(inten, perms, axis=1)
    p0 = se3.Pose(poses.q[0], poses.t[0])
    gt = np.asarray(jax.vmap(
        lambda q, t: se3.compose(se3.inverse(p0), se3.Pose(q, t)).t
    )(poses.q, poses.t))
    return xyz_u, inten_u, gt


def test_projection_rebuilds_organization(cfg, unorganized_seq):
    xyz_u, inten_u, _ = unorganized_seq
    scan = projection.project_unorganized(xyz_u[0], inten_u[0], cfg.sensor,
                                          fov_up_deg=16.6, fov_down_deg=-16.6)
    H, W = cfg.sensor.image_height, cfg.sensor.image_width
    assert scan.xyz.shape == (H, W, 3)
    # the renderer emits one point per pixel; the spherical projection must
    # recover the overwhelming majority of them
    fill = float(jnp.mean(scan.valid))
    assert fill > 0.7, fill
    # rows are elevation-ordered: mean z per row decreases top to bottom
    zrow = np.asarray(
        jnp.sum(jnp.where(scan.valid, scan.xyz[..., 2], 0.0), axis=1)
        / jnp.maximum(jnp.sum(scan.valid, axis=1), 1)
    )
    assert zrow[0] > zrow[-1]


def test_geometric_slam_tracks_trajectory(cfg, unorganized_seq):
    xyz_u, inten_u, gt = unorganized_seq
    outs = jax.jit(
        lambda x, i: geometric_slam.run_sequence(x, i, cfg)
    )(xyz_u, inten_u)
    est = np.asarray(outs.pose.t)
    assert np.isfinite(est).all()
    # the mapping back-end must actually engage
    assert int(outs.num_surf_residuals[-1]) > 10
    err = np.linalg.norm(est - gt, axis=-1)
    ate = float(np.sqrt(np.mean(err**2)))
    total_motion = float(np.linalg.norm(gt[-1] - gt[0]))
    assert total_motion > 2.0
    assert ate < 0.25 * total_motion, f"ATE {ate:.3f} m over {total_motion:.1f} m"


def test_geo_slam_step_streaming_matches_scan(cfg, unorganized_seq):
    """Per-frame streaming calls produce the same result as lax.scan replay."""
    xyz_u, inten_u, _ = unorganized_seq
    outs = jax.jit(
        lambda x, i: geometric_slam.run_sequence(x, i, cfg)
    )(xyz_u[:4], inten_u[:4])
    st = geometric_slam.init_state(cfg)
    step = jax.jit(
        lambda s, x, i: geometric_slam.geo_slam_step(s, x, i, cfg))
    for k in range(4):
        st, out = step(st, xyz_u[k], inten_u[k])
    np.testing.assert_allclose(np.asarray(out.pose.t),
                               np.asarray(outs.pose.t[3]), atol=1e-4)
