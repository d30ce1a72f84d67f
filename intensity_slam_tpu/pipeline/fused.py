"""The fused per-frame step: front-end + keyframe back-end in ONE program.

Round-2 measurement showed the two-program host orchestration (front step,
read `is_keyframe` back, maybe dispatch a backend step) costing 250x its
compute: every frame paid a device->host sync on a remote-TPU transport
(front-end 31.3 ms median vs 6.3 ms sync-free), and the separately-jitted
backend compiled lazily mid-run (58 s stall at the first loop closure).

The fix is architectural, not incremental: the keyframe decision stays ON
DEVICE as the predicate of a `lax.cond` whose true-branch runs the whole
backend (keyframe ingest, loop detect, ICP verify, PGO), and every output
the host would have read back per frame — poses, skip flags, keyframe ids —
is appended to a device-resident ring log instead.  One jitted call per
frame, zero host round-trips in the hot loop; the log and counters are
fetched once at the end (or at any checkpoint the caller likes).  Both cond
branches compile with the program, so there is no mid-run compile cliff.

This also closes the loop the reference closes but round 2 didn't: an
accepted loop's correction immediately re-bases the live mapping frame
(`mapping.apply_correction`), rebuilds the voxel maps at the optimized
poses (`mapping.rebuild_maps`, config-gated), and moves the raw anchors
(`loop.apply_correction`) — the tf map->pgo_odom + updatePoses semantics of
`intensity_feature_tracker.cpp:110-145,555-582`, applied to the WHOLE
system state, map included.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..utils import se3
from ..utils.se3 import Pose
from . import loop as loop_mod
from . import mapping, slam


class FrameLog(NamedTuple):
    """Device-resident per-frame ring log (capacity cfg.log_capacity)."""

    q: jax.Array          # (T, 4) mapping-frame pose (era frame, see kf)
    t: jax.Array          # (T, 3)
    oq: jax.Array         # (T, 4) merged odometry pose (odom frame)
    ot: jax.Array         # (T, 3)
    kf: jax.Array         # (T,) int32 governing keyframe id
    skip: jax.Array       # (T,) bool intensity-odometry skip flag
    count: jax.Array      # () int32 frames ever logged
    num_skips: jax.Array  # () int32
    # per-era odometry-quality accumulator (r5): sum of inverse frame
    # quality and frame count since the last keyframe — becomes the new
    # keyframe's posegraph.odo_qual edge multiplier, so the PGO places
    # loop corrections where the uncertainty accrued (skip-heavy /
    # match-poor stretches)
    era_iq_sum: jax.Array  # () f32
    era_n: jax.Array       # () f32
    compactions: jax.Array  # () int32 keyframe-store decimations so far —
    # host spill segments record it so their frozen kf ids can be remapped
    # (id //= 2 per decimation) against the CURRENT graph at export time


class FusedState(NamedTuple):
    slam: slam.SlamState
    backend: loop_mod.BackendState
    log: FrameLog


class FrameInfo(NamedTuple):
    """Tiny per-frame scalars returned to the host.  Reading ANY field
    forces a sync — the hot loop should not; fetch at the end or every N
    frames."""

    is_keyframe: jax.Array
    skip: jax.Array
    num_good: jax.Array
    loop_found: jax.Array
    loop_idx: jax.Array
    icp_fitness: jax.Array
    icp_int_corr: jax.Array
    num_kf: jax.Array
    compacted: jax.Array
    pose_t: jax.Array     # (3,) current mapping-frame position


def init_state(cfg: SlamConfig, seed: int = 0) -> FusedState:
    T = cfg.log_capacity
    return FusedState(
        slam=slam.init_state(cfg, seed),
        backend=loop_mod.init_state(cfg),
        log=FrameLog(
            q=jnp.zeros((T, 4), jnp.float32).at[:, 0].set(1.0),
            t=jnp.zeros((T, 3), jnp.float32),
            oq=jnp.zeros((T, 4), jnp.float32).at[:, 0].set(1.0),
            ot=jnp.zeros((T, 3), jnp.float32),
            kf=jnp.full((T,), -1, jnp.int32),
            skip=jnp.zeros((T,), bool),
            count=jnp.int32(0),
            num_skips=jnp.int32(0),
            compactions=jnp.int32(0),
            era_iq_sum=jnp.float32(0),
            era_n=jnp.float32(0),
        ),
    )


def _no_undistort(cfg: SlamConfig) -> SlamConfig:
    if not cfg.sensor.undistort:
        return cfg
    return cfg.replace(
        sensor=dataclasses.replace(cfg.sensor, undistort=False))


def fused_step(
    state: FusedState,
    xyz: jax.Array,           # (H*W, 3) organized scan, sensor frame
    inten: jax.Array,         # (H*W,)
    timestamp: jax.Array,
    detect_mask: jax.Array,
    cfg: SlamConfig,
) -> tuple[FusedState, FrameInfo]:
    # undistort ONCE and feed the same corrected cloud to both the front-end
    # and the keyframe store (r2 advisory: keyframe clouds / ScanContext /
    # ICP must see the geometry the poses were estimated from)
    if cfg.sensor.undistort:
        xyz = slam.undistort_scan(xyz, state.slam.last_delta, cfg)
    sstate, out = slam.slam_step(
        state.slam, xyz, inten, timestamp, detect_mask, _no_undistort(cfg)
    )

    # The keyframe back-end runs under a cond carrying ONLY the small
    # control state; the bulky payload arrays are read-only operands inside
    # and are written by drop-mode slot scatters AFTER the cond — a cond
    # branch that may rewrite a big array non-aliasably would otherwise
    # force XLA to copy it through the conditional on EVERY frame
    # (measured ~1 ms/frame; see loop.BackendState docstring).
    # per-frame inverse quality: a skipped frame's delta comes from the
    # geometric fallback (measured ~2-3x noisier per frame than the
    # intensity solve); a low-match frame degrades with its match count.
    # The era mean becomes the keyframe edge's noise multiplier
    # (posegraph.odo_qual).  Capped at 3: the multiplier COMPOUNDS with
    # loop_drift_rate, and an uncapped 5x on an already-wide envelope
    # left the chain nearly unconstrained (a noisy toy refine swung to
    # 9 m ATE).
    # the "healthy" match count scales with the feature budget (~4 % of
    # num_features: 41 at the full 1024, 2.6 at the 64-feature test
    # config) — an absolute threshold silently maxed the multiplier on
    # small configs and turned their chains to jelly
    good_floor = 0.04 * cfg.feature.num_features
    iq = jnp.where(
        out.skip, 3.0,
        jnp.clip(good_floor
                 / jnp.maximum(out.num_good.astype(jnp.float32), 2.0),
                 1.0, 3.0))
    era_qual = (state.log.era_iq_sum + iq) / (state.log.era_n + 1.0)

    def kf_branch(sstate, small):
        scan_valid = jnp.linalg.norm(xyz, axis=-1) >= cfg.sensor.min_range
        small, slot, bout = loop_mod.keyframe_core(
            small, state.backend, xyz, scan_valid, out.desc, out.desc_valid,
            out.pose, timestamp, cfg,
            feat_xyz=out.feat_xyz,
            ground_pts=out.ground_ds, ground_mask=out.ground_ds_mask,
            corner_pts=out.corner_ds, corner_mask=out.corner_ds_mask,
            scan_int=inten, era_qual=era_qual,
        )
        # --- live correction feedback (reference: updatePoses + tf
        # map->pgo_odom): re-base the mapping frame, move the raw anchors,
        # and (config-gated) rebuild the maps at the optimized poses
        small = loop_mod.apply_correction(
            small, bout.loop_found, bout.correction)
        # correction is identity when no loop was accepted, so the rebase
        # composes unconditionally
        mstate = mapping.apply_correction(sstate.mapping, bout.correction)
        if cfg.mapping.rebuild_on_loop:
            def _rebuild(ms):
                # logical views of the rebuild clouds; the CURRENT
                # keyframe's payload is not in the store yet — patch it in
                k = small.num_kf - 1
                sl = small.kf_slot
                gv = state.backend.kf_ground[sl].at[k].set(out.ground_ds)
                gm = (state.backend.kf_ground_mask[sl]
                      .at[k].set(out.ground_ds_mask))
                cv = state.backend.kf_corner[sl].at[k].set(out.corner_ds)
                cm = (state.backend.kf_corner_mask[sl]
                      .at[k].set(out.corner_ds_mask))
                return mapping.rebuild_maps(
                    ms, gv, gm, cv, cm,
                    small.graph.poses, small.num_kf, cfg)

            mstate = jax.lax.cond(
                bout.loop_found, _rebuild, lambda ms: ms, mstate,
            )
        return sstate._replace(mapping=mstate), small, slot, bout

    def no_kf(sstate, small):
        bout = loop_mod.BackendOutput(
            loop_found=jnp.asarray(False), loop_idx=jnp.int32(-1),
            icp_fitness=jnp.asarray(jnp.inf), correction=Pose.identity(),
            sc_found=jnp.asarray(False), sc_dist=jnp.asarray(jnp.inf),
            icp_inlier_frac=jnp.asarray(0.0),
            icp_int_corr=jnp.asarray(-2.0), compacted=jnp.asarray(False),
        )
        return sstate, small, loop_mod.empty_slot(cfg), bout

    sstate, small, slot, bout = jax.lax.cond(
        out.is_keyframe, kf_branch, no_kf,
        sstate, loop_mod.small_of(state.backend),
    )
    bstate = loop_mod.write_slot(state.backend, small, slot)

    # --- ring-log append.  The logged pose is expressed in the CURRENT era
    # frame: when this very frame accepted a loop, compose its correction in
    # so the entry matches the rebased kf_raw anchor.
    log = state.log
    logged = se3.compose(bout.correction, out.pose)
    i = log.count % cfg.log_capacity
    kf_prev = jnp.where(bout.compacted, log.kf // 2, log.kf)
    log = FrameLog(
        q=log.q.at[i].set(logged.q),
        t=log.t.at[i].set(logged.t),
        oq=log.oq.at[i].set(out.odom_pose.q),
        ot=log.ot.at[i].set(out.odom_pose.t),
        kf=kf_prev.at[i].set(bstate.num_kf - 1),
        skip=log.skip.at[i].set(out.skip),
        count=log.count + 1,
        num_skips=log.num_skips + out.skip.astype(jnp.int32),
        compactions=log.compactions + bout.compacted.astype(jnp.int32),
        era_iq_sum=jnp.where(out.is_keyframe, 0.0, log.era_iq_sum + iq),
        era_n=jnp.where(out.is_keyframe, 0.0, log.era_n + 1.0),
    )

    info = FrameInfo(
        is_keyframe=out.is_keyframe,
        skip=out.skip,
        num_good=out.num_good,
        loop_found=bout.loop_found,
        loop_idx=bout.loop_idx,
        icp_fitness=bout.icp_fitness,
        icp_int_corr=bout.icp_int_corr,
        num_kf=bstate.num_kf,
        compacted=bout.compacted,
        pose_t=logged.t,
    )
    return FusedState(slam=sstate, backend=bstate, log=log), info


def keyframe_corrections(backend: loop_mod.BackendState) -> Pose:
    """[K] per-keyframe era->PGO-frame corrections: opt_k o raw_k^-1
    (`updatePoses` rewrite, `intensity_feature_tracker.cpp:110-145`)."""
    return se3.compose(backend.graph.poses, se3.inverse(backend.kf_raw))


def trajectory(state: FusedState, cfg: SlamConfig
               ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """PGO-corrected trajectory export from the device log.

    Returns (q (T, 4), t (T, 3), n ()): the first min(count, capacity)
    entries are valid.  Each frame is corrected rigidly by its governing
    keyframe's era->PGO correction — updatePoses semantics, evaluated
    lazily at export time so the hot loop never touches it."""
    log, backend = state.log, state.backend
    corr = keyframe_corrections(backend)
    kf = jnp.clip(log.kf, 0, backend.graph.node_valid.shape[0] - 1)
    c = jax.tree.map(lambda a: a[kf], corr)
    p = se3.compose(c, Pose(log.q, log.t))
    have_kf = (log.kf >= 0)[:, None]
    q = jnp.where(have_kf, p.q, log.q)
    t = jnp.where(have_kf, p.t, log.t)
    n = jnp.minimum(log.count, cfg.log_capacity)
    # Once the ring has wrapped, storage order is rotated: the oldest
    # retained frame sits at count % capacity.  Roll it back to slot 0 so
    # the first n entries are always chronological (ADVICE r3: a wrapped
    # export silently paired rotated poses with sequential timestamps).
    shift = jnp.where(log.count > cfg.log_capacity,
                      log.count % cfg.log_capacity, 0)
    q = jnp.roll(q, -shift, axis=0)
    t = jnp.roll(t, -shift, axis=0)
    return q, t, n


def export_window(state: FusedState, start: jax.Array, length: int,
                  cfg: SlamConfig
                  ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """RAW (era-frame) poses + governing keyframe ids for global frames
    [start, start+length), which must still be resident in the ring
    (count - start <= log_capacity) — the device half of the host spill
    that makes trajectory export unbounded (the reference keeps unbounded
    keyframe deques, `intensity_feature_tracker.h:242-248`; our ring is
    fixed, so segments stream to the host before they are overwritten).

    r5 redesign: the spill used to export poses CORRECTED as of spill
    time, so any loop accepted after a segment spilled never reached its
    frames (measured on the r4 soak: mid-trajectory error 10x the live
    window's).  Now the spill ships the raw pose + its keyframe id + the
    compaction generation, and `runtime.spill.LogSpiller.full_trajectory`
    applies the FINAL graph's era->PGO corrections at export — every
    frame of the session benefits from every loop ever accepted, exactly
    like the reference's `updatePoses` full rewrite
    (`intensity_feature_tracker.cpp:110-145`)."""
    log = state.log
    idx = (start + jnp.arange(length)) % cfg.log_capacity
    return log.q[idx], log.t[idx], log.kf[idx], log.compactions


def adopt_graph(state: FusedState, new_poses: Pose, cfg: SlamConfig
                ) -> FusedState:
    """Adopt externally refined keyframe poses (e.g. from the distributed
    `parallel.dist_backend.refine` pass) into the live system: write them
    into the graph, re-base the live mapping frame onto the refined current
    keyframe, move the raw anchors, and rebuild the maps (config-gated) —
    the same feedback path an on-device loop closure takes."""
    backend = state.backend
    K = backend.graph.node_valid.shape[0]
    live = (jnp.arange(K) < backend.num_kf)[:, None]
    poses = jax.tree.map(
        lambda n, o: jnp.where(live, n, o), new_poses, backend.graph.poses
    )
    backend = backend._replace(graph=backend.graph._replace(poses=poses))
    k = backend.num_kf - 1
    corr = se3.compose(
        jax.tree.map(lambda a: a[k], poses),
        se3.inverse(jax.tree.map(lambda a: a[k], backend.kf_raw)),
    )
    backend = loop_mod.apply_correction(backend, jnp.asarray(True), corr)
    # frames of the CURRENT era are already in the log, expressed in the
    # pre-adoption raw frame; re-basing kf_raw[k] above would orphan them
    # (their export correction becomes identity), so move them into the
    # corrected frame here — unlike an in-graph loop closure, whose era
    # starts AT the corrected keyframe
    log = state.log
    era = (log.kf == k)[:, None]
    moved = se3.compose(corr, Pose(log.q, log.t))
    log = log._replace(
        q=jnp.where(era, moved.q, log.q),
        t=jnp.where(era, moved.t, log.t),
    )
    mstate = mapping.apply_correction(state.slam.mapping, corr)
    if cfg.mapping.rebuild_on_loop:
        sl = backend.kf_slot   # rebuild clouds live at physical slots
        mstate = mapping.rebuild_maps(
            mstate, backend.kf_ground[sl], backend.kf_ground_mask[sl],
            backend.kf_corner[sl], backend.kf_corner_mask[sl],
            backend.graph.poses, backend.num_kf, cfg)
    return state._replace(
        slam=state.slam._replace(mapping=mstate), backend=backend, log=log
    )
