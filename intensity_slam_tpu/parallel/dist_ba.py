"""Distributed Schur-complement bundle adjustment over a device mesh.

No reference counterpart: the C++ system disables its BA residuals
(`mapOptimization.cpp:251` `&& false`, sliding window size 0).  This module
is the north-star scale-out component (BASELINE.json): keyframe poses +
map landmarks refined jointly, with observations sharded across a
`jax.sharding.Mesh` and the landmark elimination + reduced pose system
assembled with mesh collectives.

Problem form (point-cloud BA):
    min over {T_i}, {p_j}  sum_obs rho(|| R_i^T (p_j - t_i) - z_ij ||^2)
where z_ij is landmark j observed in sensor frame of pose i.  (This is the
inverse form of the front-end residual `front_end_residual`,
`lidarFeaturePointsFunction.hpp:21-58`, extended with landmarks as free
variables.)

Schur trick: the Hessian is [[A, W], [W^T, D]] with D block-diagonal over
landmarks (3x3).  Eliminate landmarks: S = A - W D^-1 W^T, solve S dx = b
on poses with matrix-free CG, back-substitute landmark updates.  All
per-observation work shards over the mesh 'obs' axis; per-landmark and
per-pose reductions are psum-style segment sums that XLA lowers to
reduce-scatter/all-reduce over ICI when inputs are sharded.

The public entry `ba_solve` is written with plain jnp ops + segment_sum so
the SAME code jits on one chip or under shard_map/NamedSharding over a
mesh (`shard_obs_in_specs` documents the intended partitioning).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import se3
from ..utils.se3 import Pose


class BAProblem(NamedTuple):
    poses: Pose           # [K] initial pose estimates (sensor->world)
    landmarks: jax.Array  # (L, 3) world landmark estimates
    obs_pose: jax.Array   # (M,) int32 pose index per observation
    obs_lm: jax.Array     # (M,) int32 landmark index per observation
    obs_z: jax.Array      # (M, 3) sensor-frame measurement
    obs_w: jax.Array      # (M,) weight (0 masks padding)
    fixed_poses: jax.Array  # (K,) bool — gauge anchors (e.g. pose 0)


class BAResult(NamedTuple):
    poses: Pose
    landmarks: jax.Array
    initial_cost: jax.Array
    final_cost: jax.Array


def _residuals(prob: BAProblem, poses: Pose, lms: jax.Array) -> jax.Array:
    """(M, 3) r_ij = R_i^T (p_j - t_i) - z_ij."""
    q = poses.q[prob.obs_pose]
    t = poses.t[prob.obs_pose]
    p = lms[prob.obs_lm]
    local = se3.quat_rotate(se3.quat_conj(q), p - t)
    return local - prob.obs_z


def _cost(prob: BAProblem, poses: Pose, lms: jax.Array) -> jax.Array:
    r = _residuals(prob, poses, lms)
    return 0.5 * jnp.sum(prob.obs_w * jnp.sum(r * r, axis=-1))


@partial(jax.jit, static_argnames=("gn_iters", "cg_iters"))
def ba_solve(
    prob: BAProblem,
    gn_iters: int = 5,
    cg_iters: int = 32,
    damping: float = 1e-6,
) -> BAResult:
    """Gauss-Newton with exact per-iteration Schur elimination of landmarks.

    Pose retraction is right-multiplicative on SE(3); landmark updates are
    additive.  Jacobians are analytic:
      d r / d xi_i   (pose i tangent: [rot, trans])
      d r / d p_j  = R_i^T
    """
    K = prob.poses.q.shape[0]
    L = prob.landmarks.shape[0]
    c0 = _cost(prob, prob.poses, prob.landmarks)

    def gn_step(carry, _):
        poses, lms = carry
        q = poses.q[prob.obs_pose]                    # (M, 4)
        t = poses.t[prob.obs_pose]
        p = lms[prob.obs_lm]
        Rt = se3.quat_to_mat(se3.quat_conj(q))        # (M, 3, 3) = R^T
        local = jnp.einsum("mij,mj->mi", Rt, p - t)   # R^T (p - t)
        r = local - prob.obs_z                        # (M, 3)
        w = prob.obs_w

        # Jacobians (right perturbation T <- T exp(xi)):
        #   d local / d rot   = skew(local)   (3x3)
        #   d local / d trans = -I
        #   d local / d p     = R^T
        J_rot = se3.skew(local)                       # (M, 3, 3)
        J_tr = -jnp.broadcast_to(jnp.eye(3), J_rot.shape)
        J_pose = jnp.concatenate([J_rot, J_tr], axis=-1)  # (M, 3, 6)
        J_lm = Rt                                     # (M, 3, 3)

        # gauge: zero out Jacobians of fixed poses
        free = (~prob.fixed_poses)[prob.obs_pose].astype(r.dtype)
        J_pose = J_pose * free[:, None, None]

        # block accumulations (segment sums = sharded reduce)
        wj = w[:, None, None]
        A_blk = jax.ops.segment_sum(                  # (K, 6, 6) pose diag
            wj * jnp.einsum("mdi,mdj->mij", J_pose, J_pose),
            prob.obs_pose, num_segments=K)
        D_blk = jax.ops.segment_sum(                  # (L, 3, 3) lm diag
            wj * jnp.einsum("mdi,mdj->mij", J_lm, J_lm),
            prob.obs_lm, num_segments=L)
        b_pose = jax.ops.segment_sum(                 # (K, 6)
            w[:, None] * jnp.einsum("mdi,md->mi", J_pose, r),
            prob.obs_pose, num_segments=K)
        b_lm = jax.ops.segment_sum(                   # (L, 3)
            w[:, None] * jnp.einsum("mdi,md->mi", J_lm, r),
            prob.obs_lm, num_segments=L)

        # damp + invert landmark blocks (tiny 3x3 per landmark)
        D_blk = D_blk + damping * jnp.eye(3)
        has_lm = jnp.einsum("lii->l", D_blk) > 3 * damping + 1e-12
        D_inv = jnp.where(
            has_lm[:, None, None], jnp.linalg.inv(D_blk), 0.0
        )

        # Schur RHS: b_s = b_pose - W D^-1 b_lm, assembled per observation
        Dinv_blm = jnp.einsum("lij,lj->li", D_inv, b_lm)   # (L, 3)
        corr = jax.ops.segment_sum(
            w[:, None] * jnp.einsum(
                "mdi,md->mi", J_pose,
                jnp.einsum("mdj,mj->md", J_lm, Dinv_blm[prob.obs_lm]),
            ),
            prob.obs_pose, num_segments=K)
        b_s = b_pose - corr

        # matrix-free S v = A v - W D^-1 W^T v  (v: (K, 6))
        def S_mv(v):
            Av = jnp.einsum("kij,kj->ki", A_blk, v) + damping * v
            Jp_v = jnp.einsum("mdi,mi->md", J_pose, v[prob.obs_pose])  # (M,3)
            WT_v = jax.ops.segment_sum(
                w[:, None] * jnp.einsum("mdi,md->mi", J_lm, Jp_v),
                prob.obs_lm, num_segments=L)                            # (L,3)
            DinvWTv = jnp.einsum("lij,lj->li", D_inv, WT_v)
            back = jax.ops.segment_sum(
                w[:, None] * jnp.einsum(
                    "mdi,md->mi", J_pose,
                    jnp.einsum("mdj,mj->md", J_lm, DinvWTv[prob.obs_lm]),
                ),
                prob.obs_pose, num_segments=K)
            return Av - back

        dx_pose, _ = jax.scipy.sparse.linalg.cg(S_mv, -b_s, maxiter=cg_iters)
        dx_pose = jnp.where(prob.fixed_poses[:, None], 0.0, dx_pose)

        # back-substitute landmarks: dp = -D^-1 (b_lm + W^T dx)
        Jp_dx = jnp.einsum("mdi,mi->md", J_pose, dx_pose[prob.obs_pose])
        WT_dx = jax.ops.segment_sum(
            w[:, None] * jnp.einsum("mdi,md->mi", J_lm, Jp_dx),
            prob.obs_lm, num_segments=L)
        dp = -jnp.einsum("lij,lj->li", D_inv, b_lm + WT_dx)

        new_poses = Pose(
            q=se3.quat_normalize(se3.quat_mul(poses.q, se3.so3_exp(dx_pose[:, :3]))),
            t=poses.t + se3.quat_rotate(poses.q, dx_pose[:, 3:]),
        )
        new_lms = lms + dp
        # accept only if cost decreases (batched LM-style guard)
        new_cost = _cost(prob, new_poses, new_lms)
        old_cost = _cost(prob, poses, lms)
        better = new_cost < old_cost
        poses = jax.tree.map(lambda n, o: jnp.where(better, n, o), new_poses, poses)
        lms = jnp.where(better, new_lms, lms)
        return (poses, lms), new_cost

    (poses, lms), costs = jax.lax.scan(
        gn_step, (prob.poses, prob.landmarks), None, length=gn_iters
    )
    return BAResult(
        poses=poses, landmarks=lms,
        initial_cost=c0, final_cost=_cost(prob, poses, lms),
    )


def shard_problem(prob: BAProblem, mesh, axis: str = "data") -> BAProblem:
    """Place the observation arrays sharded over `axis`; poses/landmarks
    replicated.  XLA then lowers the segment sums in ba_solve to sharded
    partial sums + all-reduce over the mesh (ICI collectives on real pods;
    Gloo across localhost processes in CI).  Valid on single- and
    multi-process meshes (multiproc.put_global)."""
    from jax.sharding import PartitionSpec as P

    from .multiproc import put_global, tree_put_global

    return BAProblem(
        poses=tree_put_global(prob.poses, mesh, P()),
        landmarks=put_global(prob.landmarks, mesh, P()),
        obs_pose=put_global(prob.obs_pose, mesh, P(axis)),
        obs_lm=put_global(prob.obs_lm, mesh, P(axis)),
        obs_z=put_global(prob.obs_z, mesh, P(axis)),
        obs_w=put_global(prob.obs_w, mesh, P(axis)),
        fixed_poses=put_global(prob.fixed_poses, mesh, P()),
    )
