"""Distributed keyframe back-end, fed from the LIVE SLAM state.

This is the integration layer the scale-out story runs through
(BASELINE.json north star; SURVEY §7.10): it takes the exact
`pipeline.loop.BackendState` the online system maintains (keyframe clouds,
descriptors, feature points, pose graph) and runs the heavy global solves
sharded over a `jax.sharding.Mesh`:

1. `refine` — the full pass:
   a. sharded pose-graph solve of the live graph (odometry chain + accepted
      loop edges) via `dist_pgo.optimize_shmap` — explicit SPMD with edges
      sharded and one psum per CG application;
   b. BA problem built from the live keyframe store's feature tracks
      (`ba_builder.build_problem`), observations sharded over the mesh
      (`dist_ba.shard_problem`), solved by the distributed Schur-complement
      Gauss-Newton (`dist_ba.ba_solve`);
   c. BA-refined poses written back into the graph (valid nodes only),
      landmarks returned as the refined sparse map.

   The online system's own loop-closure solves keep running on-device at
   keyframe rate; `refine` is the batch counterpart of the reference's
   `updatePoses` full rewrite (`intensity_feature_tracker.cpp:110-145`) —
   run it periodically, at session end, or on another slice.

2. `shard_backend_state` — places the keyframe-major store arrays sharded
   over the mesh so the whole BackendState lives distributed (the "sharded
   keyframe store": each shard holds a contiguous block of keyframes'
   clouds/descriptors/feature points; graph + scalars replicated).

Everything here is also valid on one device (mesh=None) — the same code
path, minus collectives.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import SlamConfig
from ..pipeline import posegraph
from ..pipeline.loop import BackendState
from . import ba_builder, dist_ba, dist_pgo


class RefineResult(NamedTuple):
    state: BackendState       # graph poses updated (PGO + BA)
    landmarks: jax.Array      # (L, 3) BA-refined sparse landmark map
    landmark_valid: jax.Array  # (L,) bool — tracks with >= 2 observations
    ba_initial_cost: jax.Array
    ba_final_cost: jax.Array
    num_obs: jax.Array        # () int32 BA observations used


def shard_backend_state(state: BackendState, mesh, axis: str = "data"
                        ) -> BackendState:
    """Distribute the keyframe store: keyframe-major arrays sharded over
    `axis` (each shard owns a block of keyframes), graph + scalars
    replicated (poses are tiny; the clouds/descriptors are the bulk).
    Valid on single- and multi-process meshes (multiproc.put_global)."""
    from ..pipeline.loop import logical_view
    from .multiproc import put_global

    # payload arrays live at PHYSICAL slots in the live state; normalize to
    # logical keyframe order so each shard owns a contiguous keyframe block
    state = jax.jit(logical_view)(state)

    def kf(a):
        return put_global(a, mesh, P(axis))

    def rep(a):
        return put_global(a, mesh, P())

    return BackendState(
        graph=jax.tree.map(rep, state.graph),
        kf_cloud=kf(state.kf_cloud),
        kf_cloud_mask=kf(state.kf_cloud_mask),
        kf_cloud_int=kf(state.kf_cloud_int),
        kf_sc=kf(state.kf_sc),
        kf_ringkey=kf(state.kf_ringkey),
        kf_sig=kf(state.kf_sig),
        kf_time=kf(state.kf_time),
        num_kf=rep(state.num_kf),
        kf_feat_desc=kf(state.kf_feat_desc),
        kf_feat_xyz=kf(state.kf_feat_xyz),
        kf_feat_valid=kf(state.kf_feat_valid),
        kf_raw=jax.tree.map(kf, state.kf_raw),
        kf_ground=kf(state.kf_ground),
        kf_ground_mask=kf(state.kf_ground_mask),
        kf_corner=kf(state.kf_corner),
        kf_corner_mask=kf(state.kf_corner_mask),
        last_loop_kf=rep(state.last_loop_kf),
        kf_slot=rep(state.kf_slot),
        free_slots=rep(state.free_slots),
        free_count=rep(state.free_count),
    )


def refine(
    state: BackendState,
    cfg: SlamConfig,
    mesh=None,
    run_pgo: bool = True,
) -> RefineResult:
    """Global trajectory + structure refinement from live state (sharded
    over `mesh` when given; identical math on one device when None)."""
    pc, lc = cfg.parallel, cfg.loop
    axis = pc.mesh_axis_data

    # --- (a) pose-graph solve of the live graph.  The same
    # pairwise-consistency vote the online solve runs (r5) deactivates
    # inconsistent loop edges here too — measurements-only, so it can be
    # computed replicated before the sharded solve.
    g = state.graph
    if run_pgo:
        active = (posegraph.consistent_loop_mask(
            g, odo_noise=lc.odom_noise, drift_rate=lc.loop_drift_rate,
            drift_rot_rate=lc.loop_drift_rot_rate, chi2_max=lc.pcm_chi2)
            if lc.use_pcm else None)
        if mesh is not None:
            g = dist_pgo.optimize_shmap(
                g, mesh,
                gn_iters=lc.pgo_gn_iters, cg_iters=pc.pgo_cg_iters,
                odo_noise=lc.odom_noise, prior_noise=lc.prior_noise,
                loop_cauchy_c=lc.loop_cauchy_c,
                drift_rate=lc.loop_drift_rate,
                drift_rot_rate=lc.loop_drift_rot_rate, axis=axis,
                loop_active=active,
            )
        else:
            g = posegraph.optimize(
                g, gn_iters=lc.pgo_gn_iters, cg_iters=pc.pgo_cg_iters,
                odo_noise=lc.odom_noise, prior_noise=lc.prior_noise,
                loop_cauchy_c=lc.loop_cauchy_c,
                drift_rate=lc.loop_drift_rate,
                drift_rot_rate=lc.loop_drift_rot_rate,
                loop_active=active,
            )
    state = state._replace(graph=g)

    # --- (b) BA from the live keyframe store, observations sharded.
    # out_shardings places the problem directly in the distributed layout
    # (obs sharded over `axis`, poses/landmarks replicated) — no host
    # round-trip, and valid when the mesh spans multiple processes (where
    # re-placing after the fact would need non-addressable transfers).
    if mesh is not None:
        obs = NamedSharding(mesh, P(axis))
        rep = NamedSharding(mesh, P())
        out_sh = dist_ba.BAProblem(
            poses=jax.tree.map(lambda _: rep, state.graph.poses),
            landmarks=rep, obs_pose=obs, obs_lm=obs, obs_z=obs, obs_w=obs,
            fixed_poses=rep,
        )
        prob = jax.jit(ba_builder.build_problem, static_argnums=1,
                       out_shardings=out_sh)(state, cfg)
    else:
        prob = jax.jit(ba_builder.build_problem, static_argnums=1)(
            state, cfg)
    res = dist_ba.ba_solve(
        prob, gn_iters=pc.ba_gn_iters, cg_iters=pc.ba_cg_iters
    )

    # --- (c) optionally write BA poses back (valid live nodes only; node 0
    # is the gauge anchor and padding slots are frozen inside the solve
    # already).  Default off — see config.ParallelConfig.ba_pose_writeback:
    # the PGO result (ICP-verified loops + odometry chain) is the stronger
    # pose evidence; BA still refines and returns the landmark map.
    if pc.ba_pose_writeback:
        # jitted: runs as a global SPMD program when the mesh spans
        # processes (eager ops on non-addressable arrays are invalid)
        @jax.jit
        def _writeback(res_poses, g_poses, num_kf):
            live = (jnp.arange(g.node_valid.shape[0]) < num_kf)[:, None]
            return jax.tree.map(
                lambda ref, old: jnp.where(live, ref, old),
                res_poses, g_poses)

        g = g._replace(poses=_writeback(res.poses, g.poses, state.num_kf))

    L = prob.landmarks.shape[0]

    @jax.jit
    def _obs_stats(w, lm):
        cnt = jax.ops.segment_sum(w, lm, num_segments=L)
        return cnt >= 2.0, jnp.sum(w > 0).astype(jnp.int32)

    lm_valid, num_obs = _obs_stats(prob.obs_w, prob.obs_lm)
    return RefineResult(
        state=state._replace(graph=g),
        landmarks=res.landmarks,
        landmark_valid=lm_valid,
        ba_initial_cost=res.initial_cost,
        ba_final_cost=res.final_cost,
        num_obs=num_obs,
    )
