"""Sharded pose-graph optimization over a device mesh.

Two levels of distribution:

1. `shard_graph` + `optimize_sharded` — placement-only: shard the node
   arrays, jit the stock solve, and let XLA partition it.  Fine for demos;
   the partitioner's choices are opaque.
2. `optimize_shmap` — the real component: a hand-written SPMD solve under
   `jax.shard_map` with explicit collectives, mirroring
   `pipeline.posegraph.optimize` exactly (same residuals, robust weights,
   dense relative-coordinate GN — the two agree to float tolerance).

Sharding layout (scaling-book style: shard the big axis, replicate the
small state): the LOOP-EDGE Jacobian work is the flops — each shard owns a
slice of the loop-edge table, builds its slice's (E_s*6, 6K) Jacobian block
and its contribution to the 6K x 6K normal equations locally; the POSE
VECTOR (K x 7 floats, tiny) and the odometry chain terms are replicated.
The only communication is ONE `psum` of the loop normal-equation
contribution (H_loop, b_loop) per GN iteration — an all-reduce that rides
ICI on a real slice.  Every shard then runs the identical dense Cholesky +
associative-scan pose rebuild (`posegraph._dense_update_multi`), so the output is
replicated by construction.

The reference's counterpart is single-threaded iSAM2 inside one process
(`intensity_feature_tracker.cpp:516-528`); distribution has no reference
counterpart (SURVEY §7.10 north star).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..pipeline import posegraph
from ..utils import se3
from ..utils.se3 import Pose


def shard_graph(g: posegraph.PoseGraph, mesh, axis: str = "data"
                ) -> posegraph.PoseGraph:
    """Placement-only sharding: nodes over `axis`, loop edges replicated.
    Valid on single- and multi-process meshes (multiproc.put_global)."""
    from .multiproc import put_global

    def put_nodes(a):
        return put_global(a, mesh, P(axis))

    def put_rep(a):
        return put_global(a, mesh, P())

    return posegraph.PoseGraph(
        poses=jax.tree.map(put_nodes, g.poses),
        node_valid=put_nodes(g.node_valid),
        num_nodes=put_rep(g.num_nodes),
        odo_rel=jax.tree.map(put_nodes, g.odo_rel),
        odo_qual=put_nodes(g.odo_qual),
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


def optimize_shmap(
    g: posegraph.PoseGraph,
    mesh,
    gn_iters: int = 8,
    cg_iters: int = 64,
    odo_noise: tuple = (2.5e-5, 2.5e-5, 2.5e-5, 4e-4, 4e-4, 4e-4),
    prior_noise: tuple = (1e-6, 1e-6, 1e-6, 1e-8, 1e-8, 1e-6),
    loop_cauchy_c: float = 1.0,
    drift_rate: float = 0.05,
    drift_rot_rate: float = 0.005,
    axis: str = "data",
    loop_active: jax.Array | None = None,
) -> posegraph.PoseGraph:
    """SPMD pose-graph solve: loop edges sharded over `axis`, poses and the
    odometry chain replicated; one psum of the (6K, 6K) loop normal
    equations per GN iteration.  Numerically equivalent to
    `posegraph.optimize` (same per-edge math; only the reduction order
    differs).  `cg_iters` is retained for API compatibility and ignored
    (the dense Cholesky solve is exact)."""
    if jax.process_count() > 1:
        # multi-controller: inputs must be global arrays on the mesh before
        # entering the jitted shard_map program (each process holds the
        # full graph — it is replicated state in the live system)
        from .multiproc import tree_put_global

        g = tree_put_global(g, mesh, P())
    n = mesh.shape[axis]
    K = g.node_valid.shape[0]
    E = g.loop_valid.shape[0]
    Ep = -(-E // n) * n
    scale = 1e-3  # matches posegraph.optimize's conditioning scale
    odo_var = jnp.asarray(odo_noise, jnp.float32)

    def shard_solve(pq, pt, node_valid, odo_ok,
                    oq, ot, osi,
                    li, lj, lq, lt, lsi, lenv):
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

            Tprev = jax.tree.map(lambda a: jnp.roll(a, 1, axis=0), poses)
            rel_est = se3.compose(se3.inverse(Tprev), poses)
            r_odo, J_odo = posegraph._edge_jacobians(
                rel_est, Pose(oq, ot), osi * odo_ok[:, None])
            r_loop, M = posegraph._loop_jacobians(
                poses, li, lj, Pose(lq, lt), lsi_eff)
            Es = lsi_eff.shape[0]
            Mf = M.transpose(0, 2, 1, 3).reshape(Es * 6, K * 6)
            # THE collective: one all-reduce of the loop normal equations
            Hl = jax.lax.psum(Mf.T @ Mf, axis)
            bl = jax.lax.psum(Mf.T @ r_loop.reshape(-1), axis)

            # damping-ladder step control, mirroring posegraph.optimize
            # exactly (see the step-control comment there): the loop-cost
            # term of each candidate is a sharded partial sum, psum'd — a
            # scalar collective per candidate per iteration.
            cost_old = (jnp.sum(r_odo * r_odo)
                        + jax.lax.psum(jnp.sum(r_loop * r_loop), axis))
            cands = posegraph._dense_update_multi(
                poses, node_valid, odo_ok, rel_est, r_odo, J_odo, Hl, bl,
                posegraph._LM_LAMBDAS)

            def cand_cost(cand):
                # shared frozen-cost residual math (posegraph); the loop
                # term is this shard's partial sum — psum'd OUTSIDE the
                # vmap (vmapping a psum changes its shape contract)
                return posegraph._frozen_cost_parts(
                    cand, Pose(oq, ot), osi * odo_ok[:, None],
                    li, lj, Pose(lq, lt), lsi_eff)

            odo_c, loop_c = jax.vmap(cand_cost)(cands)
            cand_costs = odo_c + jax.lax.psum(loop_c, axis)
            costs = jnp.concatenate([cost_old[None], cand_costs])
            # NaN candidates (failed Cholesky) must not win the argmin —
            # see the matching guard in posegraph.optimize
            costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
            best = jnp.argmin(costs)
            stacked = jax.tree.map(
                lambda old, cs: jnp.concatenate([old[None], cs]),
                poses, cands)
            new_poses = jax.tree.map(lambda a: a[best], stacked)
            return new_poses, None

        poses, _ = jax.lax.scan(
            gn_step, Pose(pq, pt), None, length=gn_iters)
        return poses.q, poses.t

    @jax.jit
    def run(g: posegraph.PoseGraph) -> posegraph.PoseGraph:
        idx_k = jnp.arange(K)
        odo_ok = g.node_valid & (idx_k >= 1) & (idx_k < g.num_nodes)
        lv = (g.loop_valid if loop_active is None
              else g.loop_valid & loop_active)
        lval = _pad_to(lv, Ep, False)
        li = jnp.clip(_pad_to(g.loop_i, Ep, 0), 0, K - 1)
        lj = jnp.clip(_pad_to(g.loop_j, Ep, 0), 0, K - 1)
        lq = _pad_to(g.loop_rel.q, Ep, 0.0).at[E:, 0].set(1.0) \
            if Ep > E else g.loop_rel.q
        lt = _pad_to(g.loop_rel.t, Ep, 0.0)
        lsi = _pad_to(g.loop_sqrt_info, Ep, 0.0) * lval[:, None]
        step_len = jnp.where(
            odo_ok, jnp.linalg.norm(g.odo_rel.t, axis=-1), 0.0)
        step_eff = step_len * g.odo_qual   # quality-weighted (posegraph r5)
        # per-edge odometry sqrt-information: random-walk floor + linear
        # bias-drift in step length (matches posegraph.optimize exactly)
        odo_var_edge = odo_var[None, :] + jnp.concatenate([
            jnp.broadcast_to((drift_rot_rate * step_eff[:, None]) ** 2,
                             (K, 3)),
            jnp.broadcast_to((drift_rate * step_eff[:, None]) ** 2, (K, 3)),
        ], axis=-1)
        osi = scale / jnp.sqrt(odo_var_edge)
        # plausible-drift Cauchy envelope per loop edge (matches
        # posegraph.optimize: linear-in-path drift + random-walk floor)
        cum_len = jnp.cumsum(step_eff)
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
                P(), P(), P(), P(),        # poses q/t, node_valid, odo_ok
                P(), P(), P(),             # odo chain (replicated)
                P(axis), P(axis), P(axis), P(axis), P(axis),
                P(axis),                   # loop edges + envelope (sharded)
            ),
            out_specs=(P(), P()),
        )
        q, t = solve(
            g.poses.q, g.poses.t, g.node_valid, odo_ok,
            g.odo_rel.q, g.odo_rel.t, osi,
            li, lj, lq, lt, lsi, lenv,
        )
        return g._replace(poses=Pose(q, t))

    return run(g)
