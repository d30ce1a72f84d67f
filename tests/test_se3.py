import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intensity_slam_tpu.utils import se3


def rand_quat(key, shape=()):
    q = jax.random.normal(key, shape + (4,))
    return se3.quat_normalize(q)


def test_quat_mul_matches_matrix():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    qa, qb = rand_quat(k1, (16,)), rand_quat(k2, (16,))
    Rab = se3.quat_to_mat(se3.quat_mul(qa, qb))
    Ra, Rb = se3.quat_to_mat(qa), se3.quat_to_mat(qb)
    np.testing.assert_allclose(Rab, Ra @ Rb, atol=1e-5)


def test_quat_rotate_matches_matrix():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    q = rand_quat(k1, (8,))
    v = jax.random.normal(k2, (8, 3))
    np.testing.assert_allclose(
        se3.quat_rotate(q, v),
        (se3.quat_to_mat(q) @ v[..., None])[..., 0],
        atol=1e-5,
    )


def test_mat_quat_roundtrip():
    q = rand_quat(jax.random.PRNGKey(2), (64,))
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    q2 = se3.mat_to_quat(se3.quat_to_mat(q))
    np.testing.assert_allclose(q, q2, atol=1e-5)


def test_so3_exp_log_roundtrip():
    # stay inside the injectivity radius ||phi|| < pi
    d = jax.random.normal(jax.random.PRNGKey(3), (32, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    mag = jax.random.uniform(jax.random.PRNGKey(30), (32, 1), minval=0.01, maxval=3.0)
    phi = d * mag
    np.testing.assert_allclose(se3.so3_log(se3.so3_exp(phi)), phi, atol=1e-5)
    # near zero
    phi = jax.random.normal(jax.random.PRNGKey(4), (8, 3)) * 1e-7
    np.testing.assert_allclose(se3.so3_log(se3.so3_exp(phi)), phi, atol=1e-9)


def test_se3_exp_log_roundtrip():
    xi = jax.random.normal(jax.random.PRNGKey(5), (32, 6))
    # keep the rotation part inside the injectivity radius
    xi = xi.at[:, :3].multiply(0.8)
    p = se3.se3_exp(xi)
    np.testing.assert_allclose(se3.se3_log(p), xi, atol=1e-4)


def test_compose_inverse_identity():
    xi = jax.random.normal(jax.random.PRNGKey(6), (16, 6))
    p = se3.se3_exp(xi)
    ident = se3.compose(p, se3.inverse(p))
    np.testing.assert_allclose(jnp.abs(ident.q[..., 0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(ident.t, 0.0, atol=1e-5)


def test_compose_matches_matrix_product():
    xa = jax.random.normal(jax.random.PRNGKey(7), (8, 6))
    xb = jax.random.normal(jax.random.PRNGKey(8), (8, 6))
    pa, pb = se3.se3_exp(xa), se3.se3_exp(xb)
    M = se3.compose(pa, pb).matrix()
    np.testing.assert_allclose(M, pa.matrix() @ pb.matrix(), atol=1e-5)


def test_transform_points_broadcast():
    p = se3.se3_exp(jax.random.normal(jax.random.PRNGKey(9), (6,)))
    pts = jax.random.normal(jax.random.PRNGKey(10), (100, 3))
    out = se3.transform_points(p, pts)
    ref = (se3.quat_to_mat(p.q) @ pts.T).T + p.t
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_retract_first_order():
    p = se3.Pose.identity()
    xi = jnp.array([1e-4, -2e-4, 3e-4, 0.01, 0.02, -0.01])
    p2 = se3.retract(p, xi)
    np.testing.assert_allclose(se3.se3_log(p2), xi, atol=1e-6)


def test_slerp_endpoints():
    q0 = rand_quat(jax.random.PRNGKey(11))
    q1 = rand_quat(jax.random.PRNGKey(12))
    np.testing.assert_allclose(jnp.abs(jnp.sum(se3.slerp(q0, q1, 0.0) * q0)), 1.0, atol=1e-5)
    np.testing.assert_allclose(jnp.abs(jnp.sum(se3.slerp(q0, q1, 1.0) * q1)), 1.0, atol=1e-5)


def test_jit_compiles():
    f = jax.jit(lambda xi: se3.se3_log(se3.se3_exp(xi)))
    xi = jnp.ones((4, 6)) * 0.1
    np.testing.assert_allclose(f(xi), xi, atol=1e-5)
