import jax
import jax.numpy as jnp
import numpy as np

from intensity_slam_tpu.ops import solver
from intensity_slam_tpu.utils import se3


def _random_pose(key, rot_scale=0.3, t_scale=1.0):
    kr, kt = jax.random.split(key)
    xi = jnp.concatenate([
        jax.random.normal(kr, (3,)) * rot_scale,
        jax.random.normal(kt, (3,)) * t_scale,
    ])
    return se3.se3_exp(xi)


def _umeyama(src, dst):
    """Closed-form rigid alignment (Horn) for ground truth comparison."""
    src, dst = np.asarray(src, np.float64), np.asarray(dst, np.float64)
    mu_s, mu_d = src.mean(0), dst.mean(0)
    cov = (dst - mu_d).T @ (src - mu_s) / src.shape[0]
    U, _, Vt = np.linalg.svd(cov)
    S = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
    R = U @ S @ Vt
    t = mu_d - R @ mu_s
    return R, t


def test_p2p_matches_horn():
    key = jax.random.PRNGKey(0)
    gt = _random_pose(key)
    src = jax.random.normal(jax.random.PRNGKey(1), (128, 3)) * 5
    dst = se3.transform_points(gt, src)
    res = solver.solve_pose(
        se3.Pose.identity(), solver.point_to_point(src, dst, jnp.ones(128)),
        iters=20, robust="huber", robust_scale=0.1,
    )
    R_h, t_h = _umeyama(src, dst)
    np.testing.assert_allclose(se3.quat_to_mat(res.pose.q), R_h, atol=1e-4)
    np.testing.assert_allclose(res.pose.t, t_h, atol=1e-4)


def test_p2p_with_outliers_huber():
    gt = _random_pose(jax.random.PRNGKey(2), rot_scale=0.2, t_scale=0.5)
    src = jax.random.normal(jax.random.PRNGKey(3), (256, 3)) * 5
    dst = se3.transform_points(gt, src)
    # corrupt 20% with large outliers
    n_out = 51
    dst = dst.at[:n_out].add(jax.random.normal(jax.random.PRNGKey(4), (n_out, 3)) * 10)
    res = solver.solve_pose(
        se3.Pose.identity(), solver.point_to_point(src, dst, jnp.ones(256)),
        iters=30, robust="huber", robust_scale=0.1,
    )
    err = se3.se3_log(se3.compose(se3.inverse(gt), res.pose))
    assert float(jnp.linalg.norm(err)) < 0.02


def test_padding_mask_ignored():
    gt = _random_pose(jax.random.PRNGKey(5))
    src = jax.random.normal(jax.random.PRNGKey(6), (64, 3)) * 3
    dst = se3.transform_points(gt, src)
    # pad with garbage rows, weight 0
    src_p = jnp.concatenate([src, jnp.full((32, 3), 1e6)])
    dst_p = jnp.concatenate([dst, jnp.zeros((32, 3))])
    w = jnp.concatenate([jnp.ones(64), jnp.zeros(32)])
    res = solver.solve_pose(
        se3.Pose.identity(), solver.point_to_point(src_p, dst_p, w), iters=15
    )
    err = se3.se3_log(se3.compose(se3.inverse(gt), res.pose))
    assert float(jnp.linalg.norm(err)) < 1e-4


def test_point_to_plane_nd():
    gt = _random_pose(jax.random.PRNGKey(7), rot_scale=0.1, t_scale=0.3)
    # 6 planes with distinct normals fully constrain the pose
    key = jax.random.PRNGKey(8)
    normals = se3.quat_rotate(
        se3.quat_normalize(jax.random.normal(key, (6, 4))),
        jnp.array([0.0, 0.0, 1.0]),
    )
    normals = jnp.repeat(normals, 32, axis=0)  # (192, 3)
    kp = jax.random.PRNGKey(9)
    # for each plane sample points on it (world frame), then pull back by gt
    d0 = jnp.tile(jnp.arange(6.0)[:, None], (1, 32)).reshape(-1)
    # construct world points x with n.x + d = 0
    raw = jax.random.normal(kp, (192, 3)) * 4
    x_w = raw - (jnp.sum(raw * normals, -1) + d0)[:, None] * normals
    pts_local = se3.transform_points(se3.inverse(gt), x_w)
    res = solver.solve_pose(
        se3.Pose.identity(),
        solver.point_to_plane_nd(pts_local, normals, d0, jnp.ones(192)),
        iters=20, robust="none", robust_scale=0.0,
    )
    err = se3.se3_log(se3.compose(se3.inverse(gt), res.pose))
    assert float(jnp.linalg.norm(err)) < 1e-3


def test_point_to_line():
    gt = _random_pose(jax.random.PRNGKey(10), rot_scale=0.15, t_scale=0.3)
    key = jax.random.PRNGKey(11)
    # lines along random directions; points on the lines in world frame
    a = jax.random.normal(key, (96, 3)) * 5
    dirs = jax.random.normal(jax.random.PRNGKey(12), (96, 3))
    dirs /= jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    b = a + dirs
    alpha = jax.random.uniform(jax.random.PRNGKey(13), (96, 1), minval=-2, maxval=2)
    x_w = a + alpha * dirs
    pts_local = se3.transform_points(se3.inverse(gt), x_w)
    res = solver.solve_pose(
        se3.Pose.identity(),
        solver.point_to_line(pts_local, a, b, jnp.ones(96)),
        iters=25, robust="none",
    )
    err = se3.se3_log(se3.compose(se3.inverse(gt), res.pose))
    assert float(jnp.linalg.norm(err)) < 1e-3


def test_concat_heterogeneous():
    gt = _random_pose(jax.random.PRNGKey(14), rot_scale=0.1, t_scale=0.2)
    src = jax.random.normal(jax.random.PRNGKey(15), (64, 3)) * 3
    dst = se3.transform_points(gt, src)
    normals = jnp.tile(jnp.array([[0.0, 0, 1]]), (32, 1))
    raw = jax.random.normal(jax.random.PRNGKey(16), (32, 3)) * 2
    d0 = jnp.full((32,), -1.0)
    x_w = raw - (jnp.sum(raw * normals, -1) + d0)[:, None] * normals
    pl = se3.transform_points(se3.inverse(gt), x_w)
    fn = solver.concat_residuals(
        (solver.point_to_point(src, dst, jnp.ones(64)), 3),
        (solver.point_to_plane_nd(pl, normals, d0, jnp.ones(32)), 1),
    )
    res = solver.solve_pose(se3.Pose.identity(), fn, iters=15)
    err = se3.se3_log(se3.compose(se3.inverse(gt), res.pose))
    assert float(jnp.linalg.norm(err)) < 1e-3


def test_rotation_only_ground_keeps_translation():
    pts = jax.random.normal(jax.random.PRNGKey(17), (64, 3))
    normals = jnp.tile(jnp.array([[0.0, 0, 1]]), (64, 1))
    fn = solver.rotation_only_ground(pts, normals, -pts[:, 2], jnp.ones(64))
    p0 = se3.Pose(jnp.array([1.0, 0, 0, 0]), jnp.array([5.0, 6.0, 7.0]))
    res = solver.solve_pose(p0, fn, iters=5, robust="none")
    # translation must be untouched (rotation-only factor)
    np.testing.assert_allclose(res.pose.t, p0.t, atol=1e-6)


def test_cost_decreases():
    gt = _random_pose(jax.random.PRNGKey(18))
    src = jax.random.normal(jax.random.PRNGKey(19), (128, 3)) * 4
    dst = se3.transform_points(gt, src)
    res = solver.solve_pose(
        se3.Pose.identity(), solver.point_to_point(src, dst, jnp.ones(128)), iters=10
    )
    assert float(res.final_cost) < float(res.initial_cost)
