import jax
import jax.numpy as jnp
import numpy as np

from intensity_slam_tpu import config
from intensity_slam_tpu.io import synthetic
from intensity_slam_tpu.ops import features, projection, solver
from intensity_slam_tpu.utils import se3

CFG = config.small_test_config()


def _scan_at(pose):
    world = synthetic.corridor_world()
    xyz, inten = synthetic.render_scan(pose, world, CFG.sensor)
    return projection.project_organized(xyz, inten, CFG.sensor)


def test_detect_finds_synthetic_corners():
    # image with 4 bright squares -> corners at their boundaries
    H, W = CFG.sensor.image_height, CFG.sensor.image_width
    img = jnp.zeros((H, W))
    img = img.at[18:26, 40:60].set(200.0)
    img = img.at[16:24, 120:150].set(150.0)
    mask = jnp.ones((H, W), bool)
    uv, uv_sub, score, valid = features.detect(img, mask, 32)
    assert int(valid.sum()) >= 4
    # all detections near the squares
    u, v = np.asarray(uv[valid][:, 0]), np.asarray(uv[valid][:, 1])
    near1 = (np.abs(u - 50) < 20) & (np.abs(v - 22) < 8)
    near2 = (np.abs(u - 135) < 25) & (np.abs(v - 20) < 8)
    assert (near1 | near2).all()


def test_descriptor_shift_invariance():
    # the same texture at two positions gives near-identical descriptors
    H, W = 32, 256
    key = jax.random.PRNGKey(0)
    tex = jax.random.uniform(key, (H, W)) * 255
    shift = 37
    img2 = jnp.roll(tex, shift, axis=1)
    uv1 = jnp.array([[60, 16], [100, 16], [140, 16]], jnp.int32)
    uv2 = uv1.at[:, 0].add(shift)
    d1, a1 = features.describe(tex, uv1)
    d2, a2 = features.describe(img2, uv2)
    dist = jnp.sum(
        jax.lax.population_count(jnp.bitwise_xor(d1, d2)), axis=-1
    )
    assert int(dist.max()) <= 20  # out of 256 bits


def test_match_mutual_and_keep_frac():
    key = jax.random.PRNGKey(1)
    desc = jax.random.randint(key, (64, 8), 0, 2**31 - 1, dtype=jnp.int32).astype(jnp.uint32)
    # b = a shuffled
    perm = jax.random.permutation(jax.random.PRNGKey(2), 64)
    m = features.match(desc, jnp.ones(64, bool), desc[perm], jnp.ones(64, bool),
                       keep_frac=1.0, max_hamming=64)
    # every feature matches its permuted copy at distance 0
    assert int(m.num_mutual) == 64
    np.testing.assert_array_equal(np.asarray(perm[m.dst_idx]), np.arange(64))
    m2 = features.match(desc, jnp.ones(64, bool), desc[perm], jnp.ones(64, bool),
                        keep_frac=0.3, max_hamming=64)
    assert int(m2.num_good) == int(np.ceil(0.3 * 64))


def test_end_to_end_two_frame_odometry():
    """The core front-end contract: features from two rendered frames ->
    mutual matches -> 3D lift -> p2p GN solve recovers the true motion."""
    # production resolution: pixel quantization at 256 cols would dominate
    cfg = config.SlamConfig()
    p0 = se3.Pose(jnp.array([1.0, 0, 0, 0]), jnp.array([2.0, 0.0, 0.8]))
    delta_gt = se3.se3_exp(jnp.array([0.0, 0.0, 0.02, 0.25, 0.02, 0.0]))
    p1 = se3.compose(p0, delta_gt)
    world = synthetic.corridor_world()
    def scan_at(p):
        xyz, inten = synthetic.render_scan(p, world, cfg.sensor)
        return projection.project_organized(xyz, inten, cfg.sensor)
    s0, s1 = scan_at(p0), scan_at(p1)
    mask = projection.detection_mask(cfg.sensor)
    f0 = features.extract(s0, mask, cfg.feature, num_features=512)
    f1 = features.extract(s1, mask, cfg.feature, num_features=512)
    assert int(f0.xyz_valid.sum()) > 100
    m = features.match(f1.desc, f1.xyz_valid, f0.desc, f0.xyz_valid,
                       keep_frac=cfg.feature.match_keep_frac,
                       max_hamming=cfg.feature.max_hamming)
    assert int(m.num_good) >= 30
    src, dst, w = features.matched_points(f1, f0, m)
    # solve: points of frame1 expressed in frame0 = delta * p_frame1
    res = solver.solve_pose(
        se3.Pose.identity(), solver.point_to_point(src, dst, w),
        iters=cfg.odometry.gn_iters, robust="huber",
        robust_scale=cfg.odometry.huber_delta,
    )
    err = se3.se3_log(se3.compose(se3.inverse(delta_gt), res.pose))
    assert float(jnp.linalg.norm(err[:3])) < 0.01   # rotation (rad)
    assert float(jnp.linalg.norm(err[3:])) < 0.05   # translation (m)


def test_match_empty_inputs():
    desc = jnp.zeros((32, 8), jnp.uint32)
    m = features.match(desc, jnp.zeros(32, bool), desc, jnp.zeros(32, bool),
                       keep_frac=0.3)
    assert int(m.num_good) == 0
    assert not bool(m.valid.any())
