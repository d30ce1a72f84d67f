"""SO(3)/SE(3) math on quaternions — the pose substrate for every stage.

The reference manipulates poses as Eigen quaternion+translation pairs
(e.g. `src/intensity_feature_tracker.cpp:817-877` pose integration,
`src/laserOdometry.cpp:716-717` odometry integration) and as Ceres
`EigenQuaternionParameterization` blocks (`intensity_feature_tracker.cpp:887`).
Here poses are plain jnp arrays — quaternions in **wxyz** order, shape [..., 4],
translations [..., 3] — so every function broadcasts over arbitrary batch
dimensions and jits cleanly.

Conventions:
- quaternion q = [w, x, y, z], unit norm, q and -q are the same rotation.
- `Pose` is a NamedTuple pytree (q, t); `compose(a, b)` applies b first:
  x_a = R_a (R_b x + t_b) + t_a.
- tangent/twist vectors are [..., 6] ordered (rotation[3], translation[3]).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-9


class Pose(NamedTuple):
    """SE(3) element as (wxyz quaternion, translation); arbitrary batch dims."""

    q: jax.Array  # [..., 4] wxyz
    t: jax.Array  # [..., 3]

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "Pose":
        q = jnp.zeros(batch_shape + (4,), dtype).at[..., 0].set(1.0)
        t = jnp.zeros(batch_shape + (3,), dtype)
        return Pose(q, t)

    def matrix(self) -> jax.Array:
        """[..., 4, 4] homogeneous transform."""
        R = quat_to_mat(self.q)
        top = jnp.concatenate([R, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], R.dtype), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product, broadcasts over batch dims."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v [..., 3] by quaternions q [..., 4] (broadcasting).

    Uses the 2-cross-product form: v + 2 w (u × v) + 2 u × (u × v).
    """
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_mat(q: jax.Array) -> jax.Array:
    """[..., 4] wxyz -> [..., 3, 3] rotation matrix."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rows = [
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def mat_to_quat(R: jax.Array) -> jax.Array:
    """[..., 3, 3] -> [..., 4] wxyz, branch-free (Shepperd's method via max trace)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    # Four candidate quaternions (each valid when its pivot is the largest).
    qw = jnp.stack([1 + m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], -1)
    pivots = jnp.stack(
        [1 + m00 + m11 + m22, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22,
         1 - m00 - m11 + m22],
        -1,
    )
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4cand, 4]
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    q = quat_normalize(q)
    # canonicalize sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def so3_exp(phi: jax.Array) -> jax.Array:
    """Rotation vector [..., 3] -> quaternion [..., 4], Taylor-safe near 0."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    half = 0.5 * theta
    small = theta2 < 1e-12
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    return quat_normalize(jnp.concatenate([w, k * phi], axis=-1))


def so3_log(q: jax.Array) -> jax.Array:
    """Quaternion [..., 4] -> rotation vector [..., 3], Taylor-safe near
    identity AND autodiff-safe there: the vector norm is computed on a
    sanitized input (double-where trick) so reverse-mode gradients at the
    identity don't hit d(sqrt)/dx = inf via the 0 * NaN trap."""
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)  # shortest arc
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    sq = jnp.sum(q[..., 1:] * q[..., 1:], axis=-1, keepdims=True)
    small = sq < 1e-12
    vn = jnp.sqrt(jnp.where(small, 1.0, sq))  # garbage-but-finite when small
    theta = 2.0 * jnp.arctan2(vn, w)
    scale = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), theta / vn)
    return scale * q[..., 1:]


def skew(v: jax.Array) -> jax.Array:
    """[..., 3] -> [..., 3, 3] cross-product matrix."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        axis=-2,
    )


def compose(a: Pose, b: Pose) -> Pose:
    """a ∘ b (apply b first): matches `T_s2m_ *= T_s2s_` accumulation in the
    reference (`intensity_feature_tracker.cpp:829-833`)."""
    return Pose(
        quat_normalize(quat_mul(a.q, b.q)),
        quat_rotate(a.q, b.t) + a.t,
    )


def inverse(p: Pose) -> Pose:
    qc = quat_conj(p.q)
    return Pose(qc, -quat_rotate(qc, p.t))


def transform_points(p: Pose, pts: jax.Array) -> jax.Array:
    """Apply pose to points [..., N, 3] (pose batch dims broadcast)."""
    q = p.q[..., None, :] if p.q.ndim + 1 == pts.ndim + 0 else p.q
    t = p.t[..., None, :] if p.t.ndim + 1 == pts.ndim + 0 else p.t
    return quat_rotate(q, pts) + t


def se3_exp(xi: jax.Array) -> Pose:
    """Twist [..., 6] = (phi, rho) -> Pose.  Uses the SO(3)xR3 retraction
    t = V(phi) rho with the exact left-Jacobian V (SE(3) exponential)."""
    phi, rho = xi[..., :3], xi[..., 3:]
    q = so3_exp(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    K = skew(phi)
    KK = K @ K
    small = theta2 < 1e-12
    A = jnp.where(small, 0.5 - theta2 / 24.0, (1 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS))
    B = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + A * K + B * KK
    t = (V @ rho[..., :, None])[..., 0]
    return Pose(q, t)


def se3_log(p: Pose) -> jax.Array:
    """Pose -> twist [..., 6] (inverse of se3_exp)."""
    phi = so3_log(p.q)
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    K = skew(phi)
    KK = K @ K
    small = theta2 < 1e-12
    # V^{-1} = I - K/2 + C * K^2 with C = (1 - theta cot(theta/2) / 2) / theta^2
    half = theta / 2.0
    cot_term = half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)
    C = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                  (1.0 - cot_term) / jnp.maximum(theta2, _EPS))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    Vinv = eye - 0.5 * K + C * KK
    rho = (Vinv @ p.t[..., :, None])[..., 0]
    return jnp.concatenate([phi, rho], axis=-1)


def retract(p: Pose, xi: jax.Array) -> Pose:
    """Right-multiplicative retraction p ∘ exp(xi) — the GN/LM update used by
    ops.solver (reference counterpart: Ceres local parameterization step)."""
    return compose(p, se3_exp(xi))


def slerp(q0: jax.Array, q1: jax.Array, alpha) -> jax.Array:
    """Quaternion slerp (used by A-LOAM-style undistortion,
    `laserOdometry.cpp:147-170` TransformToStart)."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-5
    w0 = jnp.where(use_lerp, 1.0 - alpha, jnp.sin((1 - alpha) * theta) / jnp.maximum(sin_theta, _EPS))
    w1 = jnp.where(use_lerp, alpha, jnp.sin(alpha * theta) / jnp.maximum(sin_theta, _EPS))
    return quat_normalize(w0 * q0 + w1 * q1)


def rotation_geodesic_angle(qa: jax.Array, qb: jax.Array) -> jax.Array:
    """Angle (rad) between two rotations — used by metrics/keyframe gating."""
    d = jnp.abs(jnp.sum(qa * qb, axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(d, 0.0, 1.0))
