"""Batched robust Gauss-Newton / Levenberg-Marquardt on SE(3).

This single module replaces every Ceres solve in the reference
(SURVEY §2 C4/C7/C16):

- scan-to-scan intensity odometry (`p2p_calculateRandT`,
  `src/intensity_feature_tracker.cpp:880-928`: quaternion+translation blocks,
  `front_end_residual` per match, HuberLoss(0.1), DENSE_QR, <=20 iters)
- A-LOAM scan-to-scan (`src/laserOdometry.cpp:417,703-710`: LidarEdgeFactor /
  LidarPlaneFactor, <=4 iters x 2 outer)
- scan-to-map (`src/mapOptimization.cpp:432-442`: LidarPlaneNormFactor,
  <=10 iters)
- the residual library itself (`src/lidarFeaturePointsFunction.hpp`)

TPU design: the pose is a single SE(3) element; each iteration evaluates all
N residuals and their Jacobians in one fused vectorized pass (jacfwd over the
6-dim tangent — forward-mode turns into 6 JVPs that XLA batches), reduces the
6x6 normal equations with two small contractions, and solves on-device.
Robustification is IRLS (Huber/Cauchy weights per residual block), matching
Ceres' loss functions.  Padding is an explicit weight=0 mask — fixed shapes
throughout, so the whole multi-iteration solve is one compiled program with
`lax.scan`, no host round-trips.

LM damping uses the standard accept/reject rule implemented branch-free with
`jnp.where` so it stays a static graph.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..utils import se3
from ..utils.se3 import Pose

# residual_fn(pose) -> (res [G, D], weight [G]) ; weight 0 masks padding rows.
ResidualFn = Callable[[Pose], tuple[jax.Array, jax.Array]]


class SolveResult(NamedTuple):
    pose: Pose
    final_cost: jax.Array     # () robust cost
    initial_cost: jax.Array
    iterations: jax.Array     # () int32 (== max iters; fixed-trip-count)
    converged: jax.Array      # () bool — gradient norm below tol at exit
    min_hessian_eig: jax.Array  # () smallest eigenvalue of J^T W J at the
    # solution — the degeneracy signal (LOAM's eigen check,
    # `laserMapping.cpp:665-723` uses the same idea on AtA): near-zero means
    # some pose direction is unobserved and the estimate there is garbage


def huber_weight(sq_norm: jax.Array, delta: float) -> jax.Array:
    """IRLS weight for Huber loss on the residual-block norm (Ceres
    HuberLoss semantics: rho(s)=s for s<=d^2 else 2 d sqrt(s) - d^2)."""
    norm = jnp.sqrt(jnp.maximum(sq_norm, 1e-18))
    return jnp.where(norm <= delta, 1.0, delta / norm)


def cauchy_weight(sq_norm: jax.Array, c: float) -> jax.Array:
    """IRLS weight for Ceres CauchyLoss(c): rho(s)=c^2 log(1+s/c^2)."""
    return 1.0 / (1.0 + sq_norm / (c * c))


def robust_cost(res: jax.Array, w: jax.Array, kind: str, scale: float) -> jax.Array:
    sq = jnp.sum(res * res, axis=-1)
    if kind == "huber":
        d = scale
        rho = jnp.where(sq <= d * d, sq, 2.0 * d * jnp.sqrt(jnp.maximum(sq, 1e-18)) - d * d)
    elif kind == "cauchy":
        rho = scale * scale * jnp.log1p(sq / (scale * scale))
    else:
        rho = sq
    return 0.5 * jnp.sum(rho * w)


def solve_pose(
    pose0: Pose,
    residual_fn: ResidualFn,
    iters: int = 20,
    robust: str = "huber",
    robust_scale: float = 0.1,
    lm_lambda0: float = 1e-4,
    use_lm: bool = True,
    grad_tol: float = 1e-8,
) -> SolveResult:
    """Minimize sum_g w_g rho(||r_g(pose)||^2) over SE(3).

    `residual_fn` must be traceable with fixed shapes; its weight output masks
    padding AND can encode per-block sqrt-information scaling.

    NOT jitted here: residual_fn closures are fresh objects per call and
    would defeat the jit cache as static args.  Callers jit the enclosing
    pipeline step (the intended usage — see pipeline.odometry).
    """

    def cost_of(p: Pose) -> jax.Array:
        r, w = residual_fn(p)
        return robust_cost(r, w, robust, robust_scale)

    def linearize(p: Pose):
        r0, w = residual_fn(p)                      # (G, D), (G,)
        # Jacobian of residuals wrt right-tangent delta at 0: (G, D, 6)
        J = jax.jacfwd(lambda xi: residual_fn(se3.retract(p, xi))[0])(
            jnp.zeros(6, r0.dtype)
        )
        sq = jnp.sum(r0 * r0, axis=-1)
        if robust == "huber":
            rw = huber_weight(sq, robust_scale)
        elif robust == "cauchy":
            rw = cauchy_weight(sq, robust_scale)
        else:
            rw = jnp.ones_like(sq)
        wt = w * rw                                  # (G,)
        # normal equations: H = J^T W J, b = J^T W r
        H = jnp.einsum("gdi,gdj,g->ij", J, J, wt)
        b = jnp.einsum("gdi,gd,g->i", J, r0, wt)
        return H, b

    def step(carry):
        pose, lam, cost, _, _, rej, k = carry
        H, b = linearize(pose)
        # damping: LM diag scaling PLUS an absolute Tikhonov floor.  The
        # floor matters when the problem has a gauge/null space (e.g. the
        # ground-plane-only mapping solve leaves x/y/yaw unconstrained):
        # diag(H) is ~0 there and pure diag-scaled damping lets float noise
        # in b drive huge null-space steps.  With an absolute floor the
        # null-space component of delta is ~0 instead.
        diag = jnp.diag(H)
        floor = 1e-6 * jnp.maximum(jnp.max(diag), 1.0)
        damped = H + jnp.eye(6, dtype=b.dtype) * (
            lam * jnp.maximum(diag, 1e-8) + floor
        )
        delta = -jnp.linalg.solve(damped, b)
        # trust region: pose increments beyond ~1 rad / 1 m are never
        # legitimate for scan registration — clip rather than diverge
        dn = jnp.linalg.norm(delta)
        delta = delta * jnp.minimum(1.0, 1.0 / jnp.maximum(dn, 1e-12))
        cand = se3.retract(pose, delta)
        new_cost = cost_of(cand)
        prev_cost = cost
        if use_lm:
            accept = new_cost < cost
            pose = jax.tree.map(lambda a, b_: jnp.where(accept, b_, a), pose, cand)
            cost = jnp.where(accept, new_cost, cost)
            lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-9), jnp.minimum(lam * 4.0, 1e6))
            # relative decrease of the ACCEPTED step; a rejected step keeps
            # rel at +inf so a single rejection mid-run (lambda too low)
            # grows lambda and retries instead of exiting
            rel = jnp.where(accept, (prev_cost - new_cost)
                            / jnp.maximum(prev_cost, 1e-12), jnp.inf)
            rej = jnp.where(accept, 0, rej + 1)
        else:
            pose, cost = cand, new_cost
            rel = (prev_cost - new_cost) / jnp.maximum(prev_cost, 1e-12)
        gnorm = jnp.linalg.norm(b)
        return (pose, lam, cost, gnorm, rel, rej, k + 1)

    c0 = cost_of(pose0)
    tol = grad_tol * jnp.maximum(1.0, c0)
    FTOL = 1e-6  # Ceres' function_tolerance default
    MAX_CONSECUTIVE_REJECT = 3  # at the optimum every LM step is rejected
    # (new_cost >= cost) no matter how large lambda grows — without this
    # exit the loop spins to max iters paying a full linearize each time
    # (measured: the 20-iter odometry solve cost 2.48 ms vs 1.72 ms capped
    # at 8, with IDENTICAL final cost — pure post-convergence spin)

    def not_done(carry):
        # early exit on gradient tolerance, tiny accepted relative cost
        # decrease (Ceres' gradient_tolerance / function_tolerance), or
        # repeated step rejection (Ceres: min_trust_region_radius)
        _, _, _, gnorm, rel, rej, k = carry
        return ((k < iters) & (gnorm > tol) & (jnp.abs(rel) > FTOL)
                & (rej < MAX_CONSECUTIVE_REJECT))

    pose, _, cost, gnorm, _, _, k = jax.lax.while_loop(
        not_done,
        step,
        (pose0, jnp.asarray(lm_lambda0, c0.dtype), c0,
         jnp.asarray(jnp.inf, c0.dtype), jnp.asarray(jnp.inf, c0.dtype),
         jnp.int32(0), jnp.int32(0)),
    )
    H_final, _ = linearize(pose)
    min_eig = jnp.linalg.eigvalsh(H_final)[0]
    return SolveResult(
        pose=pose,
        final_cost=cost,
        initial_cost=c0,
        iterations=k,
        converged=gnorm < tol,
        min_hessian_eig=min_eig,
    )


# ---------------------------------------------------------------------------
# Residual library — the six functors of src/lidarFeaturePointsFunction.hpp
# expressed as mask-aware residual builders.  Each returns a ResidualFn
# closure over fixed-shape data.
# ---------------------------------------------------------------------------


def point_to_point(src: jax.Array, dst: jax.Array, w: jax.Array) -> ResidualFn:
    """`front_end_residual` (:21-58) / `FeatureMatchingResidual` (:61-98):
    r = R src + t - dst, 3-dim blocks."""

    def fn(p: Pose):
        r = se3.quat_rotate(p.q[None, :], src) + p.t[None, :] - dst
        return r, w

    return fn


def point_to_plane_nd(
    pts: jax.Array, normals: jax.Array, ds: jax.Array, w: jax.Array
) -> ResidualFn:
    """`LidarPlaneNormFactor` (:199-240): r = n . (R p + t) + d, 1-dim."""

    def fn(p: Pose):
        pw = se3.quat_rotate(p.q[None, :], pts) + p.t[None, :]
        r = jnp.sum(pw * normals, axis=-1) + ds
        return r[:, None], w

    return fn


def rotation_only_ground(
    pts: jax.Array, normals: jax.Array, ds: jax.Array, w: jax.Array
) -> ResidualFn:
    """`LidarGroundPlaneNormFactor` (:101-140): rotation-only point-to-plane —
    the translation column of the Jacobian is zeroed by ignoring t.

    Library-parity note: the reference DEFINES this functor in its residual
    library but never instantiates it anywhere in the system (no call site
    in `src/`); it is kept here on the same terms — a tested residual
    available to solver users, unused by the shipped pipeline."""

    def fn(p: Pose):
        pw = se3.quat_rotate(p.q[None, :], pts)
        r = jnp.sum(pw * normals, axis=-1) + ds
        return r[:, None], w

    return fn


def point_to_line(
    pts: jax.Array, line_a: jax.Array, line_b: jax.Array, w: jax.Array
) -> ResidualFn:
    """`LidarEdgeFactor` (:243-293): r = (p' - a) x (p' - b) / |a - b|,
    3-dim blocks (DISTORTION=0 in the reference, laserOdometry.cpp:82, so the
    slerp interpolation factor is identity)."""
    denom = jnp.maximum(jnp.linalg.norm(line_a - line_b, axis=-1, keepdims=True), 1e-9)

    def fn(p: Pose):
        pw = se3.quat_rotate(p.q[None, :], pts) + p.t[None, :]
        r = jnp.cross(pw - line_a, pw - line_b) / denom
        return r, w

    return fn


def point_to_plane_3pt(
    pts: jax.Array, pa: jax.Array, pb: jax.Array, pc: jax.Array, w: jax.Array
) -> ResidualFn:
    """`LidarPlaneFactor` (:143-196): signed distance of transformed point to
    the plane spanned by (a, b, c); 1-dim blocks."""
    n = jnp.cross(pa - pb, pa - pc)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)

    def fn(p: Pose):
        pw = se3.quat_rotate(p.q[None, :], pts) + p.t[None, :]
        r = jnp.sum((pw - pa) * n, axis=-1)
        return r[:, None], w

    return fn


def pose_prior(prior: Pose, sqrt_info: jax.Array) -> ResidualFn:
    """Anchor to a predicted pose: r = sqrt_info * log(prior^-1 o pose),
    one 6-dim block.  Tangent order (rot, trans).

    No single functor in the reference corresponds to this, but the behavior
    does: Ceres starts each scan-to-map solve at the odometry prediction and
    its trust region keeps weakly-observed directions near it
    (`mapOptimization.cpp:432-442` with the `:730-736` prior).  With
    explicit IRLS-GN the same robustness needs an explicit anchor: the
    ground-plane core observes z/roll/pitch strongly and x/y/yaw not at
    all, so micro-tilted plane fits would otherwise random-walk the pose in
    the null space.  Per-axis sqrt_info encodes exactly which directions
    the map may override."""

    def fn(p: Pose):
        xi = se3.se3_log(se3.compose(se3.inverse(prior), p))
        return (sqrt_info * xi)[None, :], jnp.ones((1,), xi.dtype)

    return fn


def concat_residuals(*fns_dims: tuple[ResidualFn, int]) -> ResidualFn:
    """Stack heterogeneous residual sets into one (padding narrower blocks
    with zero columns so shapes stay static)."""
    max_d = max(d for _, d in fns_dims)

    def fn(p: Pose):
        rs, ws = [], []
        for f, d in fns_dims:
            r, w = f(p)
            if d < max_d:
                r = jnp.pad(r, ((0, 0), (0, max_d - d)))
            rs.append(r)
            ws.append(w)
        return jnp.concatenate(rs, axis=0), jnp.concatenate(ws, axis=0)

    return fn
