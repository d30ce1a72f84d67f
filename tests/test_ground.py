import jax
import jax.numpy as jnp
import numpy as np

from intensity_slam_tpu import config
from intensity_slam_tpu.io import synthetic
from intensity_slam_tpu.ops import ground, projection
from intensity_slam_tpu.utils import se3

CFG = config.small_test_config()


def test_synthetic_plane_recovery():
    # points on plane z = -0.8 (sensor 0.8 m above ground) + wall points + noise
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    n_g, n_w = 2000, 500
    gx = jax.random.uniform(k1, (n_g, 2), minval=-10, maxval=10)
    gpts = jnp.concatenate([gx, jnp.full((n_g, 1), -0.8)], axis=-1)
    gpts += jax.random.normal(k2, gpts.shape) * 0.003
    wall = jnp.stack([
        jax.random.uniform(k3, (n_w,), minval=-10, maxval=10),
        jnp.full((n_w,), 2.0),
        jax.random.uniform(k1, (n_w,), minval=-0.8, maxval=2.0),
    ], axis=-1)
    xyz = jnp.concatenate([gpts, wall])
    valid = jnp.ones(xyz.shape[0], bool)
    res = ground.extract_ground(jax.random.PRNGKey(7), xyz, valid, CFG.ground)
    assert bool(res.ok)
    # normal ~ +z, d ~ 0.8
    np.testing.assert_allclose(np.asarray(res.plane[:3]), [0, 0, 1], atol=0.03)
    assert abs(float(res.plane[3]) - 0.8) < 0.05
    # ground points recovered, wall points excluded
    gmask = np.asarray(res.ground_mask)
    assert gmask[:n_g].mean() > 0.9
    # a few wall points sit at z ~= -0.8 and are genuinely inside the plane
    # band; anything above ~5% would indicate a bad fit
    assert gmask[n_g:].mean() < 0.05


def test_ground_on_rendered_scan():
    world = synthetic.corridor_world()
    pose = se3.Pose(jnp.array([1.0, 0, 0, 0]), jnp.array([0.0, 0, 0.8]))
    xyz, inten = synthetic.render_scan(pose, world, CFG.sensor)
    scan = projection.project_organized(xyz, inten, CFG.sensor)
    res = ground.extract_ground(
        jax.random.PRNGKey(1), xyz, scan.valid.reshape(-1), CFG.ground
    )
    assert bool(res.ok)
    # sensor is 0.8 above ground: plane z = -0.8 in sensor frame
    np.testing.assert_allclose(np.asarray(res.plane[:3]), [0, 0, 1], atol=0.05)
    assert abs(float(res.plane[3]) - 0.8) < 0.1
    # all recovered ground points are near the true plane
    pts = np.asarray(xyz)[np.asarray(res.ground_mask)]
    assert pts.shape[0] > 100
    assert np.abs(pts[:, 2] + 0.8).max() < 0.08


def test_no_candidates_flags_not_ok():
    # all points well above the height band
    xyz = jnp.ones((1000, 3)) * jnp.array([5.0, 5.0, 3.0])
    res = ground.extract_ground(
        jax.random.PRNGKey(2), xyz, jnp.ones(1000, bool), CFG.ground
    )
    assert not bool(res.ok)
    assert not bool(jnp.any(res.ground_mask))


def test_jit_and_stability():
    f = jax.jit(lambda k, x, v: ground.extract_ground(k, x, v, CFG.ground))
    xyz = jnp.concatenate([
        jnp.stack([jnp.linspace(-5, 5, 512), jnp.zeros(512), jnp.full((512,), -0.7)], -1),
        jax.random.normal(jax.random.PRNGKey(3), (512, 3)) * 5,
    ])
    res = f(jax.random.PRNGKey(4), xyz, jnp.ones(1024, bool))
    assert bool(jnp.all(jnp.isfinite(res.plane)))
