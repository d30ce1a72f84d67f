"""Sharded pose-graph optimization over a device mesh.

Two levels of distribution:

1. `shard_graph` + `optimize_sharded` — placement-only: shard the node
   arrays, jit the stock matrix-free solve, and let XLA partition it.  Fine
   for demos; the partitioner's choices are opaque.
2. `optimize_shmap` — the real component: a hand-written SPMD solve under
   `jax.shard_map` with explicit collectives, mirroring
   `pipeline.posegraph.optimize` exactly (same residuals, robust weights,
   damping, retraction — the two agree to float tolerance).

Sharding layout (scaling-book style: shard the big axis, replicate the
small state): the EDGES are the work — each of the mesh's shards owns a
slice of the odometry chain and of the loop-edge table and evaluates its
residual block's J^T J products locally; the POSE VECTOR (K x 7 floats,
tiny) is replicated, so cross-shard edge endpoints are local gathers.  The
only communication is one `psum` of the (K, 6) normal-equation products per
CG application — an all-reduce that rides ICI on a real slice.  The prior
factor is evaluated on every shard at 1/sqrt(n) information so the psum
reconstructs it exactly.

The reference's counterpart is single-threaded iSAM2 inside one process
(`intensity_feature_tracker.cpp:516-528`); distribution has no reference
counterpart (SURVEY §7.10 north star).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..pipeline import posegraph
from ..utils import se3
from ..utils.se3 import Pose


def shard_graph(g: posegraph.PoseGraph, mesh, axis: str = "data"
                ) -> posegraph.PoseGraph:
    """Placement-only sharding: nodes over `axis`, loop edges replicated."""
    from jax.sharding import NamedSharding

    node = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def put_nodes(a):
        return jax.device_put(a, node)

    def put_rep(a):
        return jax.device_put(a, rep)

    return posegraph.PoseGraph(
        poses=jax.tree.map(put_nodes, g.poses),
        node_valid=put_nodes(g.node_valid),
        num_nodes=put_rep(g.num_nodes),
        odo_rel=jax.tree.map(put_nodes, g.odo_rel),
        loop_i=put_rep(g.loop_i),
        loop_j=put_rep(g.loop_j),
        loop_rel=jax.tree.map(put_rep, g.loop_rel),
        loop_sqrt_info=put_rep(g.loop_sqrt_info),
        loop_valid=put_rep(g.loop_valid),
        num_loops=put_rep(g.num_loops),
        last_raw=jax.tree.map(put_rep, g.last_raw),
    )


optimize_sharded = posegraph.optimize  # same compiled entry point for the
# placement-only path.


def _pad_to(a: jax.Array, n: int, fill) -> jax.Array:
    if a.shape[0] == n:
        return a
    pad = jnp.full((n - a.shape[0],) + a.shape[1:], fill, a.dtype)
    return jnp.concatenate([a, pad], axis=0)


def _cg_fixed(A, b, iters: int):
    """Fixed-trip-count conjugate gradients.  The library cg's
    tolerance-checked while_loop defeats shard_map's replication inference
    (its carry gets typed as device-varying); a fixed `scan` keeps every
    value provably replicated AND compiles to a static TPU loop."""

    def body(carry, _):
        x, r, p, rr = carry
        Ap = A(p)
        alpha = rr / jnp.maximum(jnp.vdot(p, Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        rr_new = jnp.vdot(r, r)
        beta = rr_new / jnp.maximum(rr, 1e-30)
        return (x, r, r + beta * p, rr_new), None

    x0 = jnp.zeros_like(b)
    (x, _, _, _), _ = jax.lax.scan(
        body, (x0, b, b, jnp.vdot(b, b)), None, length=iters)
    return x


def optimize_shmap(
    g: posegraph.PoseGraph,
    mesh,
    gn_iters: int = 8,
    cg_iters: int = 64,
    odo_noise: tuple = (2.5e-5, 2.5e-5, 2.5e-5, 4e-4, 4e-4, 4e-4),
    prior_noise: tuple = (1e-6, 1e-6, 1e-6, 1e-8, 1e-8, 1e-6),
    loop_cauchy_c: float = 1.0,
    drift_rate: float = 0.08,
    drift_rot_rate: float = 0.005,
    axis: str = "data",
) -> posegraph.PoseGraph:
    """SPMD pose-graph solve: edges sharded over `axis`, poses replicated,
    normal-equation products psum-reduced.  Numerically equivalent to
    `posegraph.optimize` (same per-edge math; only the reduction order
    differs)."""
    n = mesh.shape[axis]
    K = g.node_valid.shape[0]
    E = g.loop_valid.shape[0]
    Kp = -(-K // n) * n
    Ep = -(-E // n) * n
    scale = 1e-3  # matches posegraph.optimize's conditioning scale
    pr_si = (1.0 / jnp.sqrt(jnp.asarray(prior_noise, jnp.float32))) * scale
    pr_si_shard = pr_si / jnp.sqrt(float(n))
    odo_var = jnp.asarray(odo_noise, jnp.float32)

    def shard_solve(pq, pt, node_valid,
                    oi, oq, ot, omask, osi,
                    li, lj, lq, lt, lsi, lval, lenv):
        def retract(poses, x):
            p = Pose(
                q=se3.quat_normalize(
                    se3.quat_mul(poses.q, se3.so3_exp(x[:, :3]))),
                t=poses.t + se3.quat_rotate(poses.q, x[:, 3:]),
            )
            return p

        def gn_step(poses, _):
            if loop_cauchy_c > 0:
                Tli = jax.tree.map(lambda a: a[li], poses)
                Tlj = jax.tree.map(lambda a: a[lj], poses)
                rel_l = se3.compose(se3.inverse(Tli), Tlj)
                r_l = se3.se3_log(
                    se3.compose(se3.inverse(Pose(lq, lt)), rel_l))
                s = jnp.sum(r_l * r_l / lenv, axis=-1)
                c2 = loop_cauchy_c ** 2
                # squared envelope-DCS weight (matches posegraph.optimize)
                w_rob = jnp.minimum(1.0, (2.0 * c2 / (c2 + s)) ** 2)
                lsi_eff = lsi * scale * w_rob[:, None]
            else:
                lsi_eff = lsi * scale

            def r_of(x):
                p = retract(poses, x)
                r_pr = pr_si_shard * se3.se3_log(
                    jax.tree.map(lambda a: a[0], p))
                Ti = jax.tree.map(lambda a: a[oi], p)
                Tim1 = jax.tree.map(lambda a: a[jnp.maximum(oi - 1, 0)], p)
                rel_est = se3.compose(se3.inverse(Tim1), Ti)
                r_odo = se3.se3_log(
                    se3.compose(se3.inverse(Pose(oq, ot)), rel_est))
                r_odo = jnp.where(omask[:, None], r_odo * osi, 0.0)
                Tl_i = jax.tree.map(lambda a: a[li], p)
                Tl_j = jax.tree.map(lambda a: a[lj], p)
                rel = se3.compose(se3.inverse(Tl_i), Tl_j)
                r_loop = se3.se3_log(
                    se3.compose(se3.inverse(Pose(lq, lt)), rel))
                r_loop = jnp.where(lval[:, None], r_loop * lsi_eff, 0.0)
                return jnp.concatenate(
                    [r_pr[None, :], r_odo, r_loop], axis=0).reshape(-1)

            x0 = jnp.zeros((K, 6))
            r0 = r_of(x0)

            def Jv(v):
                return jax.jvp(r_of, (x0,), (v,))[1]

            _, vjp = jax.vjp(r_of, x0)

            def A(v):
                return jax.lax.psum(vjp(Jv(v))[0], axis) + 1e-8 * v

            b = jax.lax.psum(vjp(r0)[0], axis)
            dx = _cg_fixed(A, -b, cg_iters)
            new_poses = retract(poses, dx)
            new_poses = jax.tree.map(
                lambda a, o: jnp.where(node_valid[:, None], a, o),
                new_poses, poses,
            )
            return new_poses, None

        poses, _ = jax.lax.scan(
            gn_step, Pose(pq, pt), None, length=gn_iters)
        return poses.q, poses.t

    @jax.jit
    def run(g: posegraph.PoseGraph) -> posegraph.PoseGraph:
        idx = jnp.arange(Kp)
        omask = (
            _pad_to(g.node_valid, Kp, False)
            & (idx >= 1) & (idx < g.num_nodes)
        )
        oi = jnp.minimum(idx, K - 1).astype(jnp.int32)
        oq = _pad_to(g.odo_rel.q, Kp, 0.0).at[K:, 0].set(1.0) \
            if Kp > K else g.odo_rel.q
        ot = _pad_to(g.odo_rel.t, Kp, 0.0)
        lval = _pad_to(g.loop_valid, Ep, False)
        li = jnp.clip(_pad_to(g.loop_i, Ep, 0), 0, K - 1)
        lj = jnp.clip(_pad_to(g.loop_j, Ep, 0), 0, K - 1)
        lq = _pad_to(g.loop_rel.q, Ep, 0.0).at[E:, 0].set(1.0) \
            if Ep > E else g.loop_rel.q
        lt = _pad_to(g.loop_rel.t, Ep, 0.0)
        lsi = _pad_to(g.loop_sqrt_info, Ep, 0.0)
        # plausible-drift Cauchy envelope per loop edge (matches
        # posegraph.optimize: linear-in-path drift + random-walk floor)
        idx_k = jnp.arange(K)
        step_len = jnp.where(
            g.node_valid & (idx_k >= 1) & (idx_k < g.num_nodes),
            jnp.linalg.norm(g.odo_rel.t, axis=-1), 0.0)
        # per-edge odometry sqrt-information: random-walk floor + linear
        # bias-drift in step length (matches posegraph.optimize exactly)
        odo_var_edge = odo_var[None, :] + jnp.concatenate([
            jnp.broadcast_to((drift_rot_rate * step_len[:, None]) ** 2,
                             (K, 3)),
            jnp.broadcast_to((drift_rate * step_len[:, None]) ** 2, (K, 3)),
        ], axis=-1)
        osi = _pad_to(scale / jnp.sqrt(odo_var_edge), Kp, 0.0)
        cum_len = jnp.cumsum(step_len)
        path_e = jnp.maximum(jnp.abs(cum_len[li] - cum_len[lj]), 1.0)
        n_e = jnp.maximum(jnp.abs(li - lj).astype(jnp.float32), 1.0)
        drift_var = jnp.concatenate([
            jnp.broadcast_to((drift_rot_rate * path_e[:, None]) ** 2,
                             (Ep, 3)),
            jnp.broadcast_to((drift_rate * path_e[:, None]) ** 2,
                             (Ep, 3)),
        ], axis=-1)
        lenv = n_e[:, None] * odo_var[None, :] + drift_var

        solve = jax.shard_map(
            shard_solve,
            mesh=mesh,
            in_specs=(
                P(), P(), P(),                 # poses q/t, node_valid (rep)
                P(axis), P(axis), P(axis), P(axis), P(axis),  # odo edges
                P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                P(axis),                              # loop edges + envelope
            ),
            out_specs=(P(), P()),
        )
        q, t = solve(
            g.poses.q, g.poses.t, g.node_valid,
            oi, oq, ot, omask, osi,
            li, lj, lq, lt, lsi, lval, lenv,
        )
        return g._replace(poses=Pose(q, t))

    return run(g)
