"""Loop-closure back-end: keyframe store, detection, ICP verify, PGO.

Replicates the reference's two back-end threads (CS-4/CS-5,
`src/intensity_feature_tracker.cpp:195-595`) as one jitted per-keyframe
step:

- keyframe ingestion: the pose-graph node is added with the map-frame pose
  (BetweenFactor chain from consecutive map odometry, `:465-510`); the
  keyframe cloud (voxel-downsampled, fixed capacity) and its ScanContext
  descriptor enter the device-resident store
- loop detection: ScanContext ring-key retrieval + shift distance
  (`SCManager::detectLoopClosureID`, C9). The reference's launched build
  uses DBoW3 ORB bag-of-words instead (`loop_closure_handler.cpp:94-96`);
  ScanContext is compiled in as the alternative strategy — here it is the
  primary, since a BoW vocabulary is a CPU-side tree the TPU replaces with
  dense descriptor similarity
- verification: trimmed ICP of the current keyframe cloud (in map frame)
  against the submap of the loop keyframe +/-1 (`:174-193,216-316`);
  fitness gate at `icp_fitness_score` (`spot.yaml:34`)
- on acceptance: loop BetweenFactor with fitness-scaled noise (`:344-363`)
  and a full batched PGO solve — the `updatePoses` rewrite (`:110-145`)
  falls out of the solve returning every node's new pose

The step runs under `lax.cond` so frames without a detected loop skip the
ICP + solve entirely.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..ops import bow, icp, scancontext
from ..ops.voxel import compact, voxel_downsample
from ..utils import se3
from ..utils.se3 import Pose
from . import posegraph


class BackendState(NamedTuple):
    graph: posegraph.PoseGraph
    kf_cloud: jax.Array       # (K, P, 3) sensor-frame subsampled clouds
    kf_cloud_mask: jax.Array  # (K, P)
    kf_sc: jax.Array          # (K, R, S)
    kf_ringkey: jax.Array     # (K, R)
    kf_sig: jax.Array         # (K, V) bag-of-binary-words signatures (C8)
    kf_time: jax.Array        # (K,)
    num_kf: jax.Array         # () int32
    # per-keyframe intensity features (the reference keeps full descriptor
    # sets per Keyframe, `keyframe.h:71-113`) — the raw material for the
    # distributed bundle-adjustment back-end (parallel.ba_builder)
    kf_feat_desc: jax.Array   # (K, F, 8) uint32
    kf_feat_xyz: jax.Array    # (K, F, 3) sensor-frame feature points
    kf_feat_valid: jax.Array  # (K, F)
    # RAW mapping-frame pose of each keyframe at ingestion time (the frame
    # its era's live frames were expressed in) — the per-keyframe anchor the
    # trajectory export differences against (`updatePoses` rewrite,
    # `intensity_feature_tracker.cpp:110-145`)
    kf_raw: Pose              # [K]
    # per-keyframe downsampled sensor-frame GROUND and CORNER clouds — the
    # raw material for rebuilding the scan-to-map voxel maps at optimized
    # poses after a loop closure (mapping.rebuild_maps)
    kf_ground: jax.Array      # (K, Pg, 3)
    kf_ground_mask: jax.Array  # (K, Pg)
    kf_corner: jax.Array      # (K, Pc, 3)
    kf_corner_mask: jax.Array  # (K, Pc)
    # keyframe index of the last ACCEPTED loop (cooldown gate); very
    # negative when none yet
    last_loop_kf: jax.Array   # () int32


class BackendOutput(NamedTuple):
    loop_found: jax.Array     # () bool (accepted loop this keyframe)
    loop_idx: jax.Array       # () int32
    icp_fitness: jax.Array    # () f32
    correction: Pose          # T_new o map_pose^-1: maps RAW mapping-frame
    # poses of the current era into the post-solve PGO frame.  The fused
    # step left-composes it onto mapping.T_map_odom (and the raw anchors,
    # `apply_correction`) so the LIVE system follows the corrected frame —
    # the reference's tf map->pgo_odom re-basing
    # (`intensity_feature_tracker.cpp:555-582`).  Identity when no loop.
    sc_found: jax.Array       # () bool — ScanContext candidate fired
    sc_dist: jax.Array        # () f32 — best ScanContext distance
    icp_inlier_frac: jax.Array  # () f32
    compacted: jax.Array      # () bool — keyframe store was full and was
    # decimated by 2 BEFORE this keyframe was ingested (host mirrors it)


def init_state(cfg: SlamConfig) -> BackendState:
    lc = cfg.loop
    K, P = lc.max_keyframes, lc.keyframe_cloud_size
    F = cfg.feature.num_features
    Pg = cfg.mapping.max_query_points
    Pc = cfg.mapping.max_query_points // 2
    return BackendState(
        graph=posegraph.empty(K, 256),
        kf_cloud=jnp.zeros((K, P, 3), jnp.float32),
        kf_cloud_mask=jnp.zeros((K, P), bool),
        kf_sc=jnp.zeros((K, lc.sc_num_ring, lc.sc_num_sector), jnp.float32),
        kf_ringkey=jnp.zeros((K, lc.sc_num_ring), jnp.float32),
        kf_sig=jnp.zeros((K, bow.VOCAB_SIZE), jnp.float32),
        kf_time=jnp.zeros((K,), jnp.float32),
        num_kf=jnp.int32(0),
        kf_feat_desc=jnp.zeros((K, F, 8), jnp.uint32),
        kf_feat_xyz=jnp.zeros((K, F, 3), jnp.float32),
        kf_feat_valid=jnp.zeros((K, F), bool),
        kf_raw=Pose.identity((K,)),
        kf_ground=jnp.zeros((K, Pg, 3), jnp.float32),
        kf_ground_mask=jnp.zeros((K, Pg), bool),
        kf_corner=jnp.zeros((K, Pc, 3), jnp.float32),
        kf_corner_mask=jnp.zeros((K, Pc), bool),
        last_loop_kf=jnp.int32(-(1 << 30)),
    )


def _compact_state(st: BackendState) -> BackendState:
    """Keyframe-store half of the decimation (see posegraph.compact_half):
    even-indexed keyframes survive; upper-half slots become stale payload
    masked out by `num_kf`."""
    K = st.kf_cloud.shape[0]
    idx = jnp.arange(K)
    src = jnp.minimum(2 * idx, K - 1)
    new_num = (st.num_kf + 1) // 2
    live = idx < new_num
    return BackendState(
        graph=posegraph.compact_half(st.graph),
        kf_cloud=st.kf_cloud[src],
        kf_cloud_mask=st.kf_cloud_mask[src] & live[:, None],
        kf_sc=st.kf_sc[src],
        kf_ringkey=st.kf_ringkey[src],
        kf_sig=st.kf_sig[src],
        kf_time=st.kf_time[src],
        num_kf=new_num,
        kf_feat_desc=st.kf_feat_desc[src],
        kf_feat_xyz=st.kf_feat_xyz[src],
        kf_feat_valid=st.kf_feat_valid[src] & live[:, None],
        kf_raw=jax.tree.map(lambda a: a[src], st.kf_raw),
        kf_ground=st.kf_ground[src],
        kf_ground_mask=st.kf_ground_mask[src] & live[:, None],
        kf_corner=st.kf_corner[src],
        kf_corner_mask=st.kf_corner_mask[src] & live[:, None],
        last_loop_kf=st.last_loop_kf // 2,
    )


def backend_step(
    state: BackendState,
    scan_xyz: jax.Array,      # (N, 3) sensor-frame scan of this keyframe
    scan_mask: jax.Array,     # (N,)
    desc: jax.Array,          # (F, 8) uint32 keyframe feature descriptors
    desc_valid: jax.Array,    # (F,)
    map_pose: Pose,           # mapping-refined pose of this keyframe
    timestamp: jax.Array,
    cfg: SlamConfig,
    feat_xyz: jax.Array | None = None,  # (F, 3) sensor-frame feature points
    # (stored for the distributed BA back-end; zeros if not provided)
    ground_pts: jax.Array | None = None,   # (Pg, 3) downsampled sensor-frame
    ground_mask: jax.Array | None = None,  # ground cloud (map rebuild input)
    corner_pts: jax.Array | None = None,   # (Pc, 3) downsampled corner cloud
    corner_mask: jax.Array | None = None,
) -> tuple[BackendState, BackendOutput]:
    lc = cfg.loop

    # --- capacity: decimate the store + graph by 2 when full (no silent
    # clobber; host side mirrors via the `compacted` output flag)
    need_compact = state.num_kf >= lc.max_keyframes
    state = jax.lax.cond(
        need_compact, _compact_state, lambda st: st, state
    )
    k = state.num_kf

    # --- ingest: node + cloud + descriptors
    graph = posegraph.add_node(state.graph, map_pose)
    if lc.use_voxel:
        cloud, cmask = voxel_downsample(
            scan_xyz, scan_mask, lc.voxel_size * 2.0, lc.keyframe_cloud_size
        )
    else:
        cloud, cmask = compact(scan_xyz, scan_mask, lc.keyframe_cloud_size)
    sc = scancontext.make_scancontext(scan_xyz, scan_mask, lc)
    rk = scancontext.ring_key(sc)
    sig = bow.signature(desc, desc_valid)
    if feat_xyz is None:
        feat_xyz = jnp.zeros_like(state.kf_feat_xyz[0])
    if ground_pts is None:
        ground_pts = jnp.zeros_like(state.kf_ground[0])
        ground_mask = jnp.zeros_like(state.kf_ground_mask[0])
    if corner_pts is None:
        corner_pts = jnp.zeros_like(state.kf_corner[0])
        corner_mask = jnp.zeros_like(state.kf_corner_mask[0])
    state = state._replace(
        graph=graph,
        kf_cloud=state.kf_cloud.at[k].set(cloud),
        kf_cloud_mask=state.kf_cloud_mask.at[k].set(cmask),
        kf_sc=state.kf_sc.at[k].set(sc),
        kf_ringkey=state.kf_ringkey.at[k].set(rk),
        kf_sig=state.kf_sig.at[k].set(sig),
        kf_time=state.kf_time.at[k].set(timestamp),
        num_kf=k + 1,
        kf_feat_desc=state.kf_feat_desc.at[k].set(desc),
        kf_feat_xyz=state.kf_feat_xyz.at[k].set(feat_xyz),
        kf_feat_valid=state.kf_feat_valid.at[k].set(desc_valid),
        kf_raw=jax.tree.map(
            lambda a, v: a.at[k].set(v), state.kf_raw, map_pose),
        kf_ground=state.kf_ground.at[k].set(ground_pts),
        kf_ground_mask=state.kf_ground_mask.at[k].set(ground_mask),
        kf_corner=state.kf_corner.at[k].set(corner_pts),
        kf_corner_mask=state.kf_corner_mask.at[k].set(corner_mask),
    )

    # --- detect: the reference hard-switches between three strategies
    # (`loop_closure_handler.cpp:94-96`: USE_ORBLOOP / USE_SCANCONTEXT /
    # kd-radius); here each channel is independently config-gated and any
    # channel's candidate goes to ICP verification.  Priority when several
    # fire: ScanContext > BoW > radius (strongest geometric evidence first).
    kf_valid = jnp.arange(lc.max_keyframes) < state.num_kf
    F = jnp.asarray(False)
    if lc.use_scancontext:
        sc_idx, yaw, sc_dist, sc_found = scancontext.detect_loop(
            sc, rk, state.kf_sc, state.kf_ringkey, kf_valid, k, lc
        )
    else:
        sc_idx, sc_dist, sc_found = jnp.int32(-1), jnp.asarray(jnp.inf), F
    if lc.use_bow_loop:
        bow_idx, bow_score, bow_found = bow.detect_loop(
            sig, state.kf_sig, kf_valid, k, lc
        )
    else:
        bow_idx, bow_found = jnp.int32(-1), F
    if lc.use_radius_search:
        # kd-radius strategy (`loop_closure_handler.cpp:42-84`): nearest
        # keyframe pose within radius_search_m of the current pose whose
        # timestamp differs by more than min_time_gap (40 s, `:77`); the
        # radius search there is PCL KdTreeFLANN radiusSearch(7 m, `:68`) —
        # here one masked distance argmin over the keyframe positions.
        # Distances use GRAPH-frame poses on both sides (node k was just
        # inserted in the corrected frame): after loop corrections the raw
        # map_pose drifts away from the graph frame.
        cur_t = state.graph.poses.t[k]
        dpos = jnp.linalg.norm(
            state.graph.poses.t - cur_t[None, :], axis=-1
        )
        eligible = (
            kf_valid
            & (jnp.arange(lc.max_keyframes) < k)
            & (dpos < lc.radius_search_m)
            & (jnp.abs(state.kf_time - timestamp) > lc.min_time_gap)
        )
        dmask = jnp.where(eligible, dpos, jnp.inf)
        rad_idx = jnp.argmin(dmask).astype(jnp.int32)
        rad_found = jnp.isfinite(dmask[rad_idx])
    else:
        rad_idx, rad_found = jnp.int32(-1), F
    loop_idx = jnp.where(
        sc_found, sc_idx, jnp.where(bow_found, bow_idx, rad_idx)
    )
    # cooldown after an accepted loop (config.loop_cooldown_kf): consecutive
    # keyframes along a revisited stretch would otherwise each re-close
    # against the same place, paying a full PGO solve per near-duplicate
    # edge (the reference throttles via its 10 Hz loop-thread cadence +
    # MIN_LOOP_SEARCH_GAP, `intensity_feature_tracker.cpp:195-214`)
    cooled = (k - state.last_loop_kf) >= lc.loop_cooldown_kf
    # plausibility PRE-gate before the expensive ICP verify: a true revisit
    # puts both keyframes at the same physical spot, so their GRAPH-frame
    # separation can only be the accumulated drift — bounded by the same
    # plausible-drift envelope the post-ICP chi2 gate whitens with.
    # Aliased BoW/SC matches to self-similar but DIFFERENT places imply
    # separations far outside it; rejecting them here skips a ~50 ms
    # ICP+gates pass per false candidate at keyframe rate (the r3 circuit
    # spent most of its keyframe budget inside rejected verifies), where
    # this check is two gathers and a norm.
    idx_n0 = jnp.arange(lc.max_keyframes)
    step_len0 = jnp.where(
        (idx_n0 >= 1) & (idx_n0 < state.graph.num_nodes),
        jnp.linalg.norm(state.graph.odo_rel.t, axis=-1), 0.0,
    )
    cum_len0 = jnp.cumsum(step_len0)
    path0 = jnp.abs(cum_len0[k] - cum_len0[jnp.maximum(loop_idx, 0)])
    sep = jnp.linalg.norm(
        state.graph.poses.t[k] - state.graph.poses.t[jnp.maximum(loop_idx, 0)]
    )
    env_sd = lc.loop_drift_rate * jnp.maximum(path0, 1.0)
    plausible = sep <= 3.0 * env_sd + 1.0
    found = (sc_found | bow_found | rad_found) & cooled & plausible

    def verify_and_close(st: BackendState):
        g = st.graph
        T_cur = jax.tree.map(lambda a: a[k], g.poses)
        T_loop = jax.tree.map(lambda a: a[loop_idx], g.poses)
        # submap: loop keyframe +/- submap_window (`:174-193`), assembled in
        # the LOOP keyframe's LOCAL frame.  Redesign vs the reference's
        # map-frame ICP (`:249`): by loop time the current pose carries the
        # very drift the loop is supposed to measure — map-frame ICP starts
        # a full drift-length off and slides into local minima, returning a
        # measurement that merely restates the drifted estimate (zero
        # information).  Aligning sensor-local clouds with the ScanContext
        # yaw as the initial guess starts ICP from the (small) true
        # revisit offset instead.
        P = lc.keyframe_cloud_size
        win = jnp.arange(-lc.submap_window, lc.submap_window + 1)
        idxs = jnp.clip(loop_idx + win, 0, jnp.maximum(st.num_kf - 1, 0))
        tgt_parts, tgt_masks = [], []
        for wi in range(win.shape[0]):
            i = idxs[wi]
            Ti = jax.tree.map(lambda a: a[i], g.poses)
            rel_i = se3.compose(se3.inverse(T_loop), Ti)
            tgt_parts.append(se3.transform_points(rel_i, st.kf_cloud[i]))
            tgt_masks.append(st.kf_cloud_mask[i])
        tgt = jnp.concatenate(tgt_parts)
        tgt_mask = jnp.concatenate(tgt_masks)
        # source: current cloud in its own sensor frame; ICP solves
        # M: cur-sensor -> loop-local.  Init: Rz(scan-context yaw) when the
        # SC channel produced the candidate; otherwise the ROTATION of the
        # graph's relative estimate T_loop^-1 o T_cur — rotation drift is
        # far smaller than a heading flip, so for BoW/radius candidates
        # (which carry no yaw evidence) the graph estimate is strictly
        # better than identity: a revisit with opposite heading (~180 deg,
        # common in corridors) would start ICP half a turn off and be
        # silently rejected by the fitness gate.  Translation stays zero —
        # a true revisit's offset is small, while the graph's relative
        # TRANSLATION carries the very drift the loop must measure.
        src = st.kf_cloud[k]
        src_mask = st.kf_cloud_mask[k]
        half = 0.5 * jnp.where(sc_found, yaw if lc.use_scancontext else 0.0,
                               0.0)
        q_sc = jnp.stack([jnp.cos(half), jnp.zeros_like(half),
                          jnp.zeros_like(half), jnp.sin(half)])
        q_graph = se3.compose(se3.inverse(T_loop), T_cur).q
        init = Pose(jnp.where(sc_found, q_sc, q_graph), jnp.zeros(3))
        if lc.use_crop:
            # CropBox(+/-CROP_SIZE) around the revisited place — the loop
            # keyframe origin in these local frames (the reference crops
            # around the robot, `intensity_feature_tracker.cpp:228-230,
            # 266-283`)
            in_box = lambda p: jnp.all(jnp.abs(p) <= lc.crop_size, axis=-1)
            src_mask = src_mask & in_box(src)
            tgt_mask = tgt_mask & in_box(tgt)
        res = icp.icp_align(
            src, src_mask, tgt, tgt_mask, init,
            iters=lc.icp_iters, max_corr_dist=lc.icp_max_corr,
        )
        # between measurement: M maps cur-sensor to loop-local, so
        # Z_{cur->loop} = M^-1 (`:330-363` semantics)
        rel = se3.inverse(res.pose)
        # consistency gate: the implied correction (measurement vs current
        # graph estimate) whitened by the plausible-drift envelope (same
        # linear-in-path model as posegraph.optimize).  A ScanContext match
        # between two self-similar but DIFFERENT places passes the fitness
        # gate (the local geometry really does align); it cannot pass this
        # one, because the implied correction is far outside what odometry
        # drift can explain.
        rel_est = se3.compose(se3.inverse(T_cur), T_loop)
        r_gate = se3.se3_log(se3.compose(se3.inverse(rel), rel_est))
        idx_n = jnp.arange(lc.max_keyframes)
        step_len = jnp.where(
            (idx_n >= 1) & (idx_n < g.num_nodes),
            jnp.linalg.norm(g.odo_rel.t, axis=-1), 0.0,
        )
        cum_len = jnp.cumsum(step_len)
        path_e = jnp.maximum(jnp.abs(cum_len[k] - cum_len[loop_idx]), 1.0)
        n_e = jnp.maximum(jnp.abs(k - loop_idx).astype(jnp.float32), 1.0)
        odo_var = jnp.asarray(lc.odom_noise, jnp.float32)
        env = n_e * odo_var + jnp.concatenate([
            jnp.full((3,), (lc.loop_drift_rot_rate * path_e) ** 2),
            jnp.full((3,), (lc.loop_drift_rate * path_e) ** 2),
        ])
        chi2 = jnp.sum(r_gate * r_gate / env)
        # accept on fitness + coverage + drift consistency; NOT on the
        # step-norm convergence flag — correspondence trimming keeps the
        # last update jittering at ~1e-3 on TPU floats, and PCL's
        # hasConverged() is likewise true after any normally-terminated
        # align()
        accept = (
            (res.fitness <= lc.icp_fitness_score)
            & (res.inlier_frac >= lc.icp_min_inlier_frac)
            & (chi2 <= lc.loop_gate_chi2)
        )
        # the PGO solve runs ONLY on acceptance: BoW proposes aggressively
        # and relies on the ICP/chi2 gates to reject
        # (`loop_closure_handler.cpp:142-143` semantics) — solving per
        # CANDIDATE would pay the dense solve on every false proposal
        # (measured: the r3 circuit run spent ~10 s of its 31 s inside
        # rejected-candidate solves before this gate)
        def do_close(gg):
            g2 = posegraph.add_loop(gg, k, loop_idx, rel, res.fitness, lc)
            if lc.online_pgo:
                g2 = posegraph.optimize(
                    g2, gn_iters=lc.pgo_gn_iters, cg_iters=64,
                    odo_noise=lc.odom_noise, prior_noise=lc.prior_noise,
                    loop_cauchy_c=lc.loop_cauchy_c,
                    drift_rate=lc.loop_drift_rate,
                    drift_rot_rate=lc.loop_drift_rot_rate,
                )
            # else: defer the global solve to the distributed back-end
            # (config.LoopConfig.online_pgo); the edge is recorded, poses
            # stay, correction below is ~identity
            return g2

        g_out = jax.lax.cond(accept, do_close, lambda gg: gg, g)
        T_new = jax.tree.map(lambda a: a[k], g_out.poses)
        # raw->PGO-frame correction: maps the live mapping frame (in which
        # map_pose was measured) into the post-solve graph frame; identity
        # unless accepted (see BackendOutput.correction)
        corr_acc = se3.compose(T_new, se3.inverse(map_pose))
        corr = jax.tree.map(
            lambda a, i: jnp.where(accept, a, i), corr_acc, Pose.identity()
        )
        return st._replace(
            graph=g_out,
            last_loop_kf=jnp.where(accept, k, st.last_loop_kf),
        ), BackendOutput(
            loop_found=accept, loop_idx=loop_idx,
            icp_fitness=res.fitness, correction=corr,
            sc_found=found, sc_dist=sc_dist,
            icp_inlier_frac=res.inlier_frac,
            compacted=need_compact,
        )

    def no_loop(st: BackendState):
        return st, BackendOutput(
            loop_found=jnp.asarray(False), loop_idx=jnp.int32(-1),
            icp_fitness=jnp.asarray(jnp.inf),
            correction=Pose.identity(),
            sc_found=found, sc_dist=sc_dist,
            icp_inlier_frac=jnp.asarray(0.0),
            compacted=need_compact,
        )

    return jax.lax.cond(found, verify_and_close, no_loop, state)


def apply_correction(
    st: BackendState, accepted: jax.Array, corr: Pose
) -> BackendState:
    """Rebase the backend's raw anchors after the LIVE system adopts `corr`
    (the raw->PGO-frame correction of an accepted loop at the CURRENT
    keyframe).

    Once the fused step left-composes `corr` onto `mapping.T_map_odom`,
    every subsequent mapped pose arrives in the corrected frame, so: the
    graph's `last_raw` (what the next odometry edge is differenced against)
    and the current keyframe's `kf_raw` (what its era's trajectory-log
    frames are corrected against at export) must both move to the corrected
    frame — i.e. to the keyframe's optimized graph pose.  This is the state
    half of the reference's map->pgo_odom re-basing
    (`intensity_feature_tracker.cpp:110-145,555-582`); without it the next
    odometry edge would bake the whole loop correction in as if it were
    robot motion."""
    k = st.num_kf - 1
    raw_k = jax.tree.map(lambda a: a[k], st.kf_raw)
    T_new = se3.compose(corr, raw_k)
    sel = lambda a, b: jnp.where(accepted, a, b)
    kf_raw = jax.tree.map(
        lambda arr, v: arr.at[k].set(sel(v, arr[k])), st.kf_raw, T_new
    )
    last_raw = jax.tree.map(sel, T_new, st.graph.last_raw)
    return st._replace(
        kf_raw=kf_raw, graph=st.graph._replace(last_raw=last_raw)
    )
