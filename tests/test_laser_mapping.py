"""C15 A-LOAM scan-to-map (pipeline/laser_mapping.py).

Covers the reference's laserMapping.cpp behaviors: corner eigen-line fit
(lambda_2 > 3 lambda_1 -> edge factor, `:665-723`), surf plane fit
(`:745-796`), and the 2x outer GN solve converging a perturbed odometry
pose back onto the map (`:640,836-850`).
"""

import jax
import jax.numpy as jnp
import numpy as np

from intensity_slam_tpu import config
from intensity_slam_tpu.ops import grid_hash
from intensity_slam_tpu.ops.curvature import FeatureClouds
from intensity_slam_tpu.pipeline import laser_mapping
from intensity_slam_tpu.utils import se3


def _line_points(n=64, axis=2, offset=(4.0, 1.0, 0.0), span=4.0, key=0):
    t = jnp.linspace(-span, span, n)
    pts = jnp.tile(jnp.asarray(offset, jnp.float32), (n, 1))
    pts = pts.at[:, axis].add(t)
    noise = 0.005 * jax.random.normal(jax.random.PRNGKey(key), (n, 3))
    return pts + noise


def _plane_points(n=512, z=0.0, extent=8.0, key=1):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    xy = jax.random.uniform(k1, (n, 2), minval=-extent, maxval=extent)
    zs = z + 0.005 * jax.random.normal(k2, (n,))
    return jnp.concatenate([xy, zs[:, None]], axis=-1)


def test_fit_lines_accepts_line_rejects_blob():
    line = _line_points(n=5)[None, :, :]                   # (1, 5, 3)
    blob = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 3))
    neigh = jnp.concatenate([line, blob], axis=0)
    a, b, ok = laser_mapping._fit_lines(neigh, jnp.ones((2, 5), bool))
    assert bool(ok[0]) and not bool(ok[1])
    # fitted direction is the line axis (z here)
    d = np.asarray(a[0] - b[0])
    d = d / np.linalg.norm(d)
    assert abs(d[2]) > 0.99


def _make_fc(corner_pts, surf_pts, cap_c=256, cap_s=1024):
    """FeatureClouds with less_sharp/less_flat populated (what C15 consumes)."""
    zc = jnp.zeros((8, 3), jnp.float32)
    mc0 = jnp.zeros((8,), bool)
    rc = jnp.zeros((8,), jnp.int32)
    nc, ns = corner_pts.shape[0], surf_pts.shape[0]
    ls = jnp.zeros((cap_c, 3), jnp.float32).at[:nc].set(corner_pts)
    lsm = jnp.zeros((cap_c,), bool).at[:nc].set(True)
    lf = jnp.zeros((cap_s, 3), jnp.float32).at[:ns].set(surf_pts)
    lfm = jnp.zeros((cap_s,), bool).at[:ns].set(True)
    return FeatureClouds(
        sharp=zc, sharp_mask=mc0, sharp_ring=rc,
        less_sharp=ls, less_sharp_mask=lsm,
        less_sharp_ring=jnp.zeros((cap_c,), jnp.int32),
        flat=zc, flat_mask=mc0, flat_ring=rc,
        less_flat=lf, less_flat_mask=lfm,
    )


def test_laser_mapping_corrects_perturbed_odometry():
    cfg = config.small_test_config()
    state = laser_mapping.init_state(cfg)
    mc = cfg.mapping

    # world structure: floor plane z=0, two vertical edge lines
    surf_w = _plane_points(n=768, z=0.0)
    corner_w = jnp.concatenate([
        _line_points(n=96, axis=2, offset=(4.0, 1.0, 0.0), key=4),
        _line_points(n=96, axis=2, offset=(-3.0, -2.0, 0.0), key=5),
    ])
    state = state._replace(
        corner_map=grid_hash.insert(
            state.corner_map, corner_w, jnp.ones(corner_w.shape[0], bool),
            2.0 * mc.corner_voxel),
        surf_map=grid_hash.insert(
            state.surf_map, surf_w, jnp.ones(surf_w.shape[0], bool),
            2.0 * mc.ground_voxel),
        initialized=jnp.asarray(True),
    )

    # true sensor pose; odometry reports a perturbed pose
    true_pose = se3.Pose(
        se3.so3_exp(jnp.array([0.0, 0.0, 0.05])),
        jnp.array([0.5, -0.3, 0.8]),
    )
    err = se3.Pose(
        se3.so3_exp(0.03 * jnp.array([1.0, 0.3, 0.2])),
        jnp.array([0.06, -0.04, 0.12]),
    )
    odom = se3.compose(true_pose, err)      # wrong by `err`

    # scan = world structure seen from the true pose
    Ti = se3.inverse(true_pose)
    fc = _make_fc(
        se3.transform_points(Ti, corner_w[::2]),
        se3.transform_points(Ti, surf_w[::2]),
    )

    step = jax.jit(lambda s, f, o: laser_mapping.laser_mapping_step(
        s, f, o, cfg))
    new_state, out = step(state, fc, odom)

    err_before = float(jnp.linalg.norm(odom.t - true_pose.t))
    err_after = float(jnp.linalg.norm(out.pose.t - true_pose.t))
    assert int(out.num_surf_residuals) > 50
    assert int(out.num_corner_residuals) > 5
    assert err_after < 0.4 * err_before, (err_before, err_after)
    # map grew by the inserted scan
    assert int(new_state.surf_map.num_points) > int(state.surf_map.num_points)
    # re-anchor: T_map_odom o odom == refined pose
    re = se3.compose(new_state.T_map_odom, odom)
    np.testing.assert_allclose(np.asarray(re.t), np.asarray(out.pose.t),
                               atol=1e-5)


def test_laser_mapping_first_frame_bootstraps():
    cfg = config.small_test_config()
    state = laser_mapping.init_state(cfg)
    fc = _make_fc(_line_points(n=32), _plane_points(n=128))
    odom = se3.Pose.identity()
    new_state, out = laser_mapping.laser_mapping_step(state, fc, odom, cfg)
    # uninitialized map: pose passes through the odometry prediction
    np.testing.assert_allclose(np.asarray(out.pose.t), 0.0, atol=1e-6)
    assert bool(new_state.initialized)
    assert int(new_state.surf_map.num_points) > 0


def test_map_snapshot_shapes():
    cfg = config.small_test_config()
    state = laser_mapping.init_state(cfg)
    pts, valid = laser_mapping.map_snapshot(state.surf_map)
    assert pts.shape[0] == valid.shape[0]
    assert pts.shape[1] == 3
    assert int(valid.sum()) == 0
