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
    """Keyframe back-end state.

    PHYSICAL vs LOGICAL layout: the bulky per-keyframe payload arrays
    (clouds, feature sets, rebuild clouds — ~95 MB at full config) are
    indexed by PHYSICAL slot; `kf_slot[i]` maps logical keyframe i to its
    slot.  Everything else (graph, descriptors, times, raw anchors) is
    logical-ordered.  Why: the per-frame fused program runs the whole
    back-end under a keyframe-gated `lax.cond`, and ANY big array that a
    cond branch may rewrite non-aliasably (the old decimation permuted
    every payload array) forces XLA to copy it through the conditional on
    EVERY frame, taken or not — measured ~1 ms/frame of pure copies on a
    TPU v5e.  With the indirection, compaction rewrites only the small
    slot table and payload writes are slot scatters OUTSIDE the cond
    (`write_slot`), which alias in place under donation."""

    graph: posegraph.PoseGraph
    kf_cloud: jax.Array       # (K, P, 3) sensor-frame subsampled clouds [PHYS]
    kf_cloud_mask: jax.Array  # (K, P)                                  [PHYS]
    kf_cloud_int: jax.Array   # (K, P) per-point intensity — the
    # appearance channel of loop ICP verification (r5)          [PHYS]
    kf_sc: jax.Array          # (K, R, S)
    kf_ringkey: jax.Array     # (K, R)
    kf_sig: jax.Array         # (K, V) bag-of-binary-words signatures (C8)
    kf_time: jax.Array        # (K,)
    num_kf: jax.Array         # () int32
    # per-keyframe intensity features (the reference keeps full descriptor
    # sets per Keyframe, `keyframe.h:71-113`) — the raw material for the
    # distributed bundle-adjustment back-end (parallel.ba_builder)
    kf_feat_desc: jax.Array   # (K, F, 8) uint32                        [PHYS]
    kf_feat_xyz: jax.Array    # (K, F, 3) sensor-frame feature points   [PHYS]
    kf_feat_valid: jax.Array  # (K, F)                                  [PHYS]
    # RAW mapping-frame pose of each keyframe at ingestion time (the frame
    # its era's live frames were expressed in) — the per-keyframe anchor the
    # trajectory export differences against (`updatePoses` rewrite,
    # `intensity_feature_tracker.cpp:110-145`)
    kf_raw: Pose              # [K]
    # per-keyframe downsampled sensor-frame GROUND and CORNER clouds — the
    # raw material for rebuilding the scan-to-map voxel maps at optimized
    # poses after a loop closure (mapping.rebuild_maps)
    kf_ground: jax.Array      # (K, Pg, 3)                              [PHYS]
    kf_ground_mask: jax.Array  # (K, Pg)                                [PHYS]
    kf_corner: jax.Array      # (K, Pc, 3)                              [PHYS]
    kf_corner_mask: jax.Array  # (K, Pc)                                [PHYS]
    # keyframe index of the last ACCEPTED loop (cooldown gate); very
    # negative when none yet
    last_loop_kf: jax.Array   # () int32
    # logical keyframe -> physical payload slot (see class docstring)
    kf_slot: jax.Array        # (K,) int32
    free_slots: jax.Array     # (K,) int32 stack of free physical slots
    free_count: jax.Array     # () int32 — always K - num_kf


# Fields of BackendState that are physical-slot payload (big) vs
# logical-ordered control state (small).  keyframe_core carries only the
# small fields through the keyframe cond; write_slot scatters the payload.
_PAYLOAD_FIELDS = (
    "kf_cloud", "kf_cloud_mask", "kf_cloud_int", "kf_feat_desc", "kf_feat_xyz",
    "kf_feat_valid", "kf_ground", "kf_ground_mask", "kf_corner",
    "kf_corner_mask",
)


class SmallState(NamedTuple):
    """The cond-carried half of BackendState (everything but payloads)."""

    graph: posegraph.PoseGraph
    kf_sc: jax.Array
    kf_ringkey: jax.Array
    kf_sig: jax.Array
    kf_time: jax.Array
    num_kf: jax.Array
    kf_raw: Pose
    last_loop_kf: jax.Array
    kf_slot: jax.Array
    free_slots: jax.Array
    free_count: jax.Array


class SlotData(NamedTuple):
    """One keyframe's payload + its physical slot.  `phys` = K (out of
    bounds) when the frame was not a keyframe — the drop-mode scatters in
    `write_slot` then write nothing."""

    phys: jax.Array           # () int32
    cloud: jax.Array          # (P, 3)
    cloud_mask: jax.Array     # (P,)
    cloud_int: jax.Array      # (P,)
    feat_desc: jax.Array      # (F, 8) uint32
    feat_xyz: jax.Array       # (F, 3)
    feat_valid: jax.Array     # (F,)
    ground: jax.Array         # (Pg, 3)
    ground_mask: jax.Array    # (Pg,)
    corner: jax.Array         # (Pc, 3)
    corner_mask: jax.Array    # (Pc,)


def small_of(state: BackendState) -> SmallState:
    return SmallState(
        graph=state.graph, kf_sc=state.kf_sc, kf_ringkey=state.kf_ringkey,
        kf_sig=state.kf_sig, kf_time=state.kf_time, num_kf=state.num_kf,
        kf_raw=state.kf_raw, last_loop_kf=state.last_loop_kf,
        kf_slot=state.kf_slot, free_slots=state.free_slots,
        free_count=state.free_count,
    )


def merge_small(state: BackendState, small: SmallState) -> BackendState:
    return state._replace(
        graph=small.graph, kf_sc=small.kf_sc, kf_ringkey=small.kf_ringkey,
        kf_sig=small.kf_sig, kf_time=small.kf_time, num_kf=small.num_kf,
        kf_raw=small.kf_raw, last_loop_kf=small.last_loop_kf,
        kf_slot=small.kf_slot, free_slots=small.free_slots,
        free_count=small.free_count,
    )


def empty_slot(cfg: SlamConfig) -> SlotData:
    lc = cfg.loop
    K, P = lc.max_keyframes, lc.keyframe_cloud_size
    F = cfg.feature.num_features
    Pg = cfg.mapping.max_query_points
    Pc = cfg.mapping.max_query_points // 2
    return SlotData(
        phys=jnp.int32(K),
        cloud=jnp.zeros((P, 3), jnp.float32),
        cloud_mask=jnp.zeros((P,), bool),
        cloud_int=jnp.zeros((P,), jnp.float32),
        feat_desc=jnp.zeros((F, 8), jnp.uint32),
        feat_xyz=jnp.zeros((F, 3), jnp.float32),
        feat_valid=jnp.zeros((F,), bool),
        ground=jnp.zeros((Pg, 3), jnp.float32),
        ground_mask=jnp.zeros((Pg,), bool),
        corner=jnp.zeros((Pc, 3), jnp.float32),
        corner_mask=jnp.zeros((Pc,), bool),
    )


def write_slot(state: BackendState, small: SmallState, slot: SlotData
               ) -> BackendState:
    """Merge the cond-carried small state and scatter the payload into its
    physical slot.  With `phys` out of bounds (no keyframe) the drop-mode
    scatters are no-ops; under donation everything updates in place — no
    conditional ever owns a payload buffer."""
    p = slot.phys
    d = dict(mode="drop")
    return merge_small(state, small)._replace(
        kf_cloud=state.kf_cloud.at[p].set(slot.cloud, **d),
        kf_cloud_mask=state.kf_cloud_mask.at[p].set(slot.cloud_mask, **d),
        kf_cloud_int=state.kf_cloud_int.at[p].set(slot.cloud_int, **d),
        kf_feat_desc=state.kf_feat_desc.at[p].set(slot.feat_desc, **d),
        kf_feat_xyz=state.kf_feat_xyz.at[p].set(slot.feat_xyz, **d),
        kf_feat_valid=state.kf_feat_valid.at[p].set(slot.feat_valid, **d),
        kf_ground=state.kf_ground.at[p].set(slot.ground, **d),
        kf_ground_mask=state.kf_ground_mask.at[p].set(slot.ground_mask, **d),
        kf_corner=state.kf_corner.at[p].set(slot.corner, **d),
        kf_corner_mask=state.kf_corner_mask.at[p].set(slot.corner_mask, **d),
    )


def logical_view(state: BackendState) -> BackendState:
    """BackendState with payload arrays gathered into LOGICAL keyframe
    order (kf_slot becomes the identity).  For consumers that index
    payloads by keyframe id directly: the distributed back-end
    (ba_builder, shard_backend_state) and host-side analysis."""
    s = state.kf_slot
    K = s.shape[0]
    out = {f: getattr(state, f)[s] for f in _PAYLOAD_FIELDS}
    return state._replace(
        kf_slot=jnp.arange(K, dtype=jnp.int32),
        free_slots=jnp.arange(K - 1, -1, -1, dtype=jnp.int32),
        free_count=K - state.num_kf,
        **out,
    )


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
    icp_int_corr: jax.Array   # () f32 intensity correlation of the ICP
    # inlier pairs (-2 when no candidate was verified this keyframe)
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
        kf_cloud_int=jnp.zeros((K, P), jnp.float32),
        kf_sc=jnp.zeros((K, lc.sc_num_ring, lc.sc_num_sector), jnp.float32),
        kf_ringkey=jnp.zeros((K, lc.sc_num_ring), jnp.float32),
        kf_sig=jnp.zeros((K, bow.SIG_FEATURES, 9), jnp.uint32),
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
        kf_slot=jnp.arange(K, dtype=jnp.int32),
        free_slots=jnp.arange(K - 1, -1, -1, jnp.int32),
        free_count=jnp.int32(K),
    )


def _compact_small(st: SmallState) -> SmallState:
    """Decimate-by-2 on the SMALL state only (see posegraph.compact_half):
    even-indexed keyframes survive; odd keyframes' physical payload slots
    are pushed back onto the free stack — the payload arrays themselves
    are never touched (BackendState docstring)."""
    K = st.kf_slot.shape[0]
    idx = jnp.arange(K)
    src = jnp.minimum(2 * idx, K - 1)
    new_num = (st.num_kf + 1) // 2
    # free the odd logical ids' physical slots: j = 1, 3, ... < num_kf
    n_freed = st.num_kf // 2
    odd = jnp.minimum(2 * idx + 1, K - 1)
    phys_freed = st.kf_slot[odd]                      # (K,) first n_freed real
    tgt = jnp.where(idx < n_freed, st.free_count + idx, K)
    free_slots = st.free_slots.at[tgt].set(phys_freed, mode="drop")
    return SmallState(
        graph=posegraph.compact_half(st.graph),
        kf_sc=st.kf_sc[src],
        kf_ringkey=st.kf_ringkey[src],
        kf_sig=st.kf_sig[src],
        kf_time=st.kf_time[src],
        num_kf=new_num,
        kf_raw=jax.tree.map(lambda a: a[src], st.kf_raw),
        last_loop_kf=st.last_loop_kf // 2,
        kf_slot=st.kf_slot[src],
        free_slots=free_slots,
        free_count=st.free_count + n_freed,
    )


def keyframe_core(
    small: SmallState,
    payload: BackendState,    # PAYLOAD READS ONLY (kf_cloud via kf_slot);
    # never modified — safe as a read-only operand of an enclosing cond
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
    scan_int: jax.Array | None = None,     # (N,) per-point intensity (the
    # loop-verification appearance channel; zeros when absent)
    era_qual: jax.Array | float = 1.0,     # odometry-quality multiplier of
    # this keyframe's era (mean inverse frame quality; posegraph.odo_qual)
) -> tuple[SmallState, SlotData, BackendOutput]:
    """One keyframe's back-end work on the cond-carried small state: slot
    allocation, graph node, loop detect, ICP verify, PGO.  Returns the
    payload as SlotData for the caller to scatter via `write_slot` OUTSIDE
    any conditional (see BackendState docstring for why)."""
    lc = cfg.loop

    # --- capacity: decimate the store + graph by 2 when full (no silent
    # clobber; host side mirrors via the `compacted` output flag)
    need_compact = small.num_kf >= lc.max_keyframes
    small = jax.lax.cond(
        need_compact, _compact_small, lambda st: st, small
    )
    k = small.num_kf

    # --- ingest: physical slot + node + descriptors
    phys = small.free_slots[small.free_count - 1]
    graph = posegraph.add_node(small.graph, map_pose, qual=era_qual)
    if scan_int is None:
        scan_int = jnp.zeros(scan_xyz.shape[0], jnp.float32)
    if lc.use_voxel:
        cloud, cmask, cint = voxel_downsample(
            scan_xyz, scan_mask, lc.voxel_size * 2.0, lc.keyframe_cloud_size,
            aux=scan_int,
        )
    else:
        cloud, cmask, cint = compact(
            scan_xyz, scan_mask, lc.keyframe_cloud_size, aux=scan_int)
    sc = scancontext.make_scancontext(scan_xyz, scan_mask, lc)
    rk = scancontext.ring_key(sc)
    sig = bow.signature(desc, desc_valid)
    if feat_xyz is None:
        feat_xyz = jnp.zeros_like(payload.kf_feat_xyz[0])
    if ground_pts is None:
        ground_pts = jnp.zeros_like(payload.kf_ground[0])
        ground_mask = jnp.zeros_like(payload.kf_ground_mask[0])
    if corner_pts is None:
        corner_pts = jnp.zeros_like(payload.kf_corner[0])
        corner_mask = jnp.zeros_like(payload.kf_corner_mask[0])
    slot = SlotData(
        phys=phys, cloud=cloud, cloud_mask=cmask, cloud_int=cint,
        feat_desc=desc, feat_xyz=feat_xyz, feat_valid=desc_valid,
        ground=ground_pts, ground_mask=ground_mask,
        corner=corner_pts, corner_mask=corner_mask,
    )
    small = small._replace(
        graph=graph,
        kf_sc=small.kf_sc.at[k].set(sc),
        kf_ringkey=small.kf_ringkey.at[k].set(rk),
        kf_sig=small.kf_sig.at[k].set(sig),
        kf_time=small.kf_time.at[k].set(timestamp),
        num_kf=k + 1,
        kf_raw=jax.tree.map(
            lambda a, v: a.at[k].set(v), small.kf_raw, map_pose),
        kf_slot=small.kf_slot.at[k].set(phys),
        free_count=small.free_count - 1,
    )
    state = small  # detection below reads only small-state fields

    # --- detect: the reference hard-switches between three strategies
    # (`loop_closure_handler.cpp:94-96`: USE_ORBLOOP / USE_SCANCONTEXT /
    # kd-radius); here each channel is independently config-gated and any
    # channel's candidate goes to ICP verification.  Priority when several
    # fire: ScanContext > BoW > radius (strongest geometric evidence first).
    kf_valid = jnp.arange(lc.max_keyframes) < state.num_kf
    F = jnp.asarray(False)
    # per-CANDIDATE plausibility (r5): a true revisit's graph-frame
    # separation from the current node is bounded by accumulated drift
    # (linear-in-path envelope).  Filtering candidates HERE — instead of
    # testing only the best-scoring candidate after retrieval (the r3/r4
    # pre-gate) — both rejects aliased same-looking WRONG candidates and
    # recovers the correct lower-scoring one the old gate threw the whole
    # frame away over.  In an aliased corridor (texture tiles every 10 m)
    # this is the only channel-level signal that separates the true
    # revisit from its copies one period away.
    idx_env = jnp.arange(lc.max_keyframes)
    step_env = jnp.where(
        (idx_env >= 1) & (idx_env < state.graph.num_nodes),
        jnp.linalg.norm(state.graph.odo_rel.t, axis=-1), 0.0,
    )
    cum_env = jnp.cumsum(step_env)
    path_env = jnp.abs(cum_env[k] - cum_env)
    sep_env = jnp.linalg.norm(
        state.graph.poses.t - state.graph.poses.t[k][None, :], axis=-1)
    cand_plausible = sep_env <= (
        3.0 * lc.loop_drift_rate * jnp.maximum(path_env, 1.0) + 1.0)
    kf_eligible = kf_valid & cand_plausible
    if lc.use_scancontext:
        sc_idx, yaw, sc_dist, sc_found = scancontext.detect_loop(
            sc, rk, state.kf_sc, state.kf_ringkey, kf_eligible, k, lc
        )
    else:
        sc_idx, sc_dist, sc_found = jnp.int32(-1), jnp.asarray(jnp.inf), F
    if lc.use_bow_loop:
        bow_idx, bow_score, bow_found = bow.detect_loop(
            sig, state.kf_sig, kf_eligible, k, lc
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
    # (the r3/r4 best-candidate-only plausibility pre-gate is subsumed by
    # the per-candidate `cand_plausible` filter above: every retrieved
    # candidate already sits inside the drift envelope)
    found = (sc_found | bow_found | rad_found) & cooled

    def verify_and_close(st: SmallState):
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
        tgt_parts, tgt_masks, tgt_ints = [], [], []
        for wi in range(win.shape[0]):
            i = idxs[wi]
            Ti = jax.tree.map(lambda a: a[i], g.poses)
            rel_i = se3.compose(se3.inverse(T_loop), Ti)
            si = st.kf_slot[i]   # payload lives at the physical slot
            tgt_parts.append(
                se3.transform_points(rel_i, payload.kf_cloud[si]))
            tgt_masks.append(payload.kf_cloud_mask[si])
            tgt_ints.append(payload.kf_cloud_int[si])
        tgt = jnp.concatenate(tgt_parts)
        tgt_mask = jnp.concatenate(tgt_masks)
        tgt_int = jnp.concatenate(tgt_ints)
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
        # current keyframe's cloud is the local payload — it has not been
        # scattered into the store yet (write_slot runs after the cond)
        src = cloud
        src_mask = cmask
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
        # appearance gate (r5): Pearson correlation of per-point intensity
        # over the converged alignment's inlier pairs.  Wrong loops between
        # self-similar places align geometrically but pair DIFFERENT
        # surfaces, so their intensity textures are uncorrelated — the
        # reference paper's intensity-as-signature thesis applied to loop
        # verification (see ops.icp.intensity_correlation).  Gated at
        # lc.loop_intensity_min; <= -1 disables (and clouds stored without
        # intensity correlate at 0, so the gate must be off for them).
        int_corr = icp.intensity_correlation(cint, tgt_int, res)
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
        # tentatively add the edge and run the pairwise-consistency vote
        # over the whole loop table (posegraph.consistent_loop_mask): the
        # candidate must join the maximum mutually-consistent clique of
        # loop edges (cycle residuals through the raw odometry chain inside
        # the drift envelope).  A wrong loop conflicts with every correct
        # loop sharing a chain segment and is vetoed here; an EARLIER
        # accepted wrong loop is re-voted at each later solve and drops out
        # of `active` once correct loops outnumber it.
        l_new = g.num_loops % g.loop_valid.shape[0]
        g_cand = posegraph.add_loop(g, k, loop_idx, rel, res.fitness, lc)
        if lc.use_pcm:
            active = posegraph.consistent_loop_mask(
                g_cand, odo_noise=lc.odom_noise,
                drift_rate=lc.loop_drift_rate,
                drift_rot_rate=lc.loop_drift_rot_rate,
                chi2_max=lc.pcm_chi2,
            )
            pcm_ok = active[l_new]
        else:
            active, pcm_ok = g_cand.loop_valid, jnp.asarray(True)
        accept = (
            (res.fitness <= lc.icp_fitness_score)
            & (res.inlier_frac >= lc.icp_min_inlier_frac)
            & (chi2 <= lc.loop_gate_chi2)
            & (int_corr >= lc.loop_intensity_min)
            & pcm_ok
        )
        # the PGO solve runs ONLY on acceptance: BoW proposes aggressively
        # and relies on the ICP/chi2 gates to reject
        # (`loop_closure_handler.cpp:142-143` semantics) — solving per
        # CANDIDATE would pay the dense solve on every false proposal
        # (measured: the r3 circuit run spent ~10 s of its 31 s inside
        # rejected-candidate solves before this gate)
        def do_close(gg):
            g2 = g_cand
            if lc.online_pgo:
                g2 = posegraph.optimize(
                    g2, gn_iters=lc.pgo_gn_iters, cg_iters=64,
                    odo_noise=lc.odom_noise, prior_noise=lc.prior_noise,
                    loop_cauchy_c=lc.loop_cauchy_c,
                    drift_rate=lc.loop_drift_rate,
                    drift_rot_rate=lc.loop_drift_rot_rate,
                    loop_active=active,
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
            icp_int_corr=int_corr,
            compacted=need_compact,
        )

    def no_loop(st: SmallState):
        return st, BackendOutput(
            loop_found=jnp.asarray(False), loop_idx=jnp.int32(-1),
            icp_fitness=jnp.asarray(jnp.inf),
            correction=Pose.identity(),
            sc_found=found, sc_dist=sc_dist,
            icp_inlier_frac=jnp.asarray(0.0),
            icp_int_corr=jnp.asarray(-2.0),
            compacted=need_compact,
        )

    small, bout = jax.lax.cond(found, verify_and_close, no_loop, state)
    return small, slot, bout


def backend_step(
    state: BackendState,
    scan_xyz: jax.Array,
    scan_mask: jax.Array,
    desc: jax.Array,
    desc_valid: jax.Array,
    map_pose: Pose,
    timestamp: jax.Array,
    cfg: SlamConfig,
    feat_xyz: jax.Array | None = None,
    ground_pts: jax.Array | None = None,
    ground_mask: jax.Array | None = None,
    corner_pts: jax.Array | None = None,
    corner_mask: jax.Array | None = None,
    scan_int: jax.Array | None = None,
    era_qual: jax.Array | float = 1.0,
) -> tuple[BackendState, BackendOutput]:
    """Whole-state keyframe step: `keyframe_core` + `write_slot`.  The
    fused per-frame program calls the two halves itself so the payload
    writes land outside the keyframe cond; this wrapper is the standalone
    (always-a-keyframe) entry used by tests and benchmarks."""
    small, slot, bout = keyframe_core(
        small_of(state), state, scan_xyz, scan_mask, desc, desc_valid,
        map_pose, timestamp, cfg, feat_xyz=feat_xyz,
        ground_pts=ground_pts, ground_mask=ground_mask,
        corner_pts=corner_pts, corner_mask=corner_mask,
        scan_int=scan_int, era_qual=era_qual,
    )
    return write_slot(state, small, slot), bout


def apply_correction(st, accepted: jax.Array, corr: Pose):
    """Rebase the backend's raw anchors after the LIVE system adopts `corr`
    (the raw->PGO-frame correction of an accepted loop at the CURRENT
    keyframe).  `st` may be a BackendState or a SmallState — only the
    common fields (kf_raw, num_kf, graph) are touched.

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
