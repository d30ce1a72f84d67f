"""Scan-to-map back-end (reference C14, call stack CS-3).

Replicates `mapOptimization::mapOptimizationCallback`
(`src/mapOptimization.cpp:99-505`):

- predict the map-frame pose from the merged odometry via the map<->odom
  anchor: `transformAssociateToMap` (`:730-736`)
- the active residual core (`:364-430`): every voxel-downsampled ground
  point is matched to its 5 nearest map points, a plane is least-squares
  fitted through them, validity-checked at 0.2 m, and contributes a
  `LidarPlaneNormFactor` point-to-plane residual; Ceres DENSE_QR <=10 iters
- on convergence `transformUpdate` re-anchors map<->odom (`:740-746`)
- world-transformed ground and corner points are inserted into the
  incremental map (`:467-479`; ikd-Trees there, voxel grid-hash here)

Sliding-window visual BA (`:295-361`): when `sliding_window_size > 0` the
step also matches the current frame's binary descriptors against each of the
last W mapped frames and adds point-to-point residuals
(`FeatureMatchingResidual`, `lidarFeaturePointsFunction.hpp:61-98`) for
matches that pass the reference's gates — >`window_min_matches` mutual
matches, top `window_keep_frac` by distance, >`window_min_good` survivors,
map-frame pair distance < `window_dist_gate`.  Defaults match the shipped
yaml (`spot.yaml:46`: window 0 = inert).

Dropped reference paths, for the record: the previous-frame ORB BA residuals
are disabled in the reference itself (`&& false`, `:251`).  The corner
ikd-Tree is built and fed but never used in residuals (`:504-505,478-479`) —
we keep a corner map for the same visualization/completeness role.

TPU design: correspondences for the whole scan are one batched 27-cell
k-NN gather; all plane fits are one batched 3x3 normal-equation solve; the
pose solve is the shared robust GN core.  The whole step is a single jitted
program; no host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..ops import features as feat_ops
from ..ops import grid_hash, solver
from ..ops.voxel import voxel_downsample
from ..utils import se3
from ..utils.se3 import Pose


class MappingState(NamedTuple):
    ground_map: grid_hash.VoxelHashMap
    corner_map: grid_hash.VoxelHashMap
    T_map_odom: Pose            # re-anchored map<->odom transform
    initialized: jax.Array      # () bool
    frame_idx: jax.Array        # () int32
    # sliding visual window (`keyframe.h:38-66` SlideWindowKeyframe): ring of
    # the last W mapped frames' descriptors, sensor-frame feature points and
    # refined map poses.  W = sliding_window_size (0 => zero-size arrays,
    # zero compute — the shipped-yaml configuration)
    win_desc: jax.Array         # (W, F, 8) uint32
    win_xyz: jax.Array          # (W, F, 3) sensor-frame feature points
    win_valid: jax.Array        # (W, F) bool
    win_pose: Pose              # [W] map-frame poses
    win_count: jax.Array        # () int32 frames ever inserted


class MappingOutput(NamedTuple):
    pose: Pose                  # refined map-frame pose of this scan
    num_plane_residuals: jax.Array  # () int32
    num_corner_residuals: jax.Array  # () int32 line fits used (r5)
    solve_cost: jax.Array
    converged: jax.Array
    map_points: jax.Array       # () int32 ground-map size
    num_window_residuals: jax.Array  # () int32 sliding-window BA matches used
    # the voxel-downsampled SENSOR-frame clouds this step inserted (the
    # keyframe back-end stores them per keyframe as rebuild_maps raw
    # material)
    ground_ds: jax.Array        # (Pg, 3)
    ground_ds_mask: jax.Array   # (Pg,)
    corner_ds: jax.Array        # (Pc, 3)
    corner_ds_mask: jax.Array   # (Pc,)


def init_state(cfg: SlamConfig) -> MappingState:
    mc = cfg.mapping
    num_sets = mc.map_capacity // (4 * 8)
    W, F = mc.sliding_window_size, cfg.feature.num_features
    return MappingState(
        ground_map=grid_hash.empty(num_sets, 4),
        corner_map=grid_hash.empty(num_sets, 4),
        T_map_odom=Pose.identity(),
        initialized=jnp.asarray(False),
        frame_idx=jnp.asarray(0, jnp.int32),
        win_desc=jnp.zeros((W, F, 8), jnp.uint32),
        win_xyz=jnp.zeros((W, F, 3), jnp.float32),
        win_valid=jnp.zeros((W, F), bool),
        win_pose=Pose.identity((W,)),
        win_count=jnp.asarray(0, jnp.int32),
    )


def _window_residuals(
    state: MappingState,
    feats: feat_ops.Features,
    prior: Pose,
    cfg: SlamConfig,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sliding-window visual BA correspondences (`mapOptimization.cpp:
    295-361`): match the current frame's descriptors against every window
    frame, apply the reference's gates, and return flattened point-to-point
    pairs (src sensor-frame (W*F,3), dst map-frame (W*F,3), weights (W*F,),
    count)."""
    mc, fc = cfg.mapping, cfg.feature
    Wn = mc.sliding_window_size
    fval = feats.valid & feats.xyz_valid
    m = jax.vmap(
        lambda wd, wv: feat_ops.match(
            feats.desc, fval, wd, wv, mc.window_keep_frac, fc.max_hamming
        )
    )(state.win_desc, state.win_valid)
    # frame gates (`:308` matches > 100, `:330` good > 50) + live slots
    slot_live = jnp.arange(Wn) < jnp.minimum(state.win_count, Wn)
    frame_ok = (
        slot_live
        & (m.num_mutual > mc.window_min_matches)
        & (m.num_good > mc.window_min_good)
    )
    src = feats.xyz[m.src_idx]                         # (W, F, 3) sensor
    dst = jnp.take_along_axis(state.win_xyz, m.dst_idx[..., None], axis=1)
    dst_map = jax.vmap(se3.transform_points)(state.win_pose, dst)
    # map-frame pair distance gate at the prior pose (`:345` < 0.3 m)
    src_map = se3.transform_points(prior, src.reshape(-1, 3)).reshape(src.shape)
    near = jnp.linalg.norm(src_map - dst_map, axis=-1) < mc.window_dist_gate
    mask = (m.valid & near & frame_ok[:, None]).astype(jnp.float32)
    # block weight = squared sqrt-information (see config.window_sqrt_info)
    w = mask * mc.window_sqrt_info**2
    return (src.reshape(-1, 3), dst_map.reshape(-1, 3), w.reshape(-1),
            jnp.sum(mask).astype(jnp.int32))


def _solve3x3(A: jax.Array, b: jax.Array) -> jax.Array:
    """Batched 3x3 linear solve by Cramer's rule: A (..., 3, 3) symmetric
    positive(ish)-definite, b (..., 3)."""
    c12 = jnp.cross(A[..., :, 1], A[..., :, 2], axis=-1)
    det = jnp.sum(A[..., :, 0] * c12, axis=-1)
    x0 = jnp.sum(b * c12, axis=-1)
    x1 = jnp.sum(A[..., :, 0] * jnp.cross(b, A[..., :, 2], axis=-1), axis=-1)
    x2 = jnp.sum(A[..., :, 0] * jnp.cross(A[..., :, 1], b, axis=-1), axis=-1)
    safe = jnp.where(jnp.abs(det) > 1e-20, det, 1.0)
    return jnp.stack([x0, x1, x2], axis=-1) / safe[..., None]


def fit_lines(neigh: jax.Array, nvalid: jax.Array, eig_ratio: float = 3.0):
    """Batched corner line fit (`laserMapping.cpp:665-723`).

    neigh (Q, k, 3), nvalid (Q, k).  Returns line endpoints a/b (Q, 3) and a
    validity flag: all k neighbors present and lambda_max > eig_ratio *
    lambda_mid of the neighborhood covariance (the reference's
    SelfAdjointEigenSolver line-ness check).  Shared by the always-on
    corner residuals here and the A-LOAM mapping pipeline
    (`pipeline/laser_mapping.py`)."""
    k = neigh.shape[1]
    center = jnp.mean(neigh, axis=1)                       # (Q, 3)
    d = neigh - center[:, None, :]
    cov = jnp.einsum("qki,qkj->qij", d, d) / k
    evals, evecs = jnp.linalg.eigh(cov)                    # ascending
    is_line = evals[:, 2] > eig_ratio * evals[:, 1]
    direction = evecs[:, :, 2]
    a = center + 0.1 * direction
    b = center - 0.1 * direction
    ok = is_line & jnp.all(nvalid, axis=-1)
    return a, b, ok


def _fit_planes(neigh: jax.Array, nvalid: jax.Array, threshold: float):
    """Batched plane fit through k neighbors (reference `:377-430`).

    Solves X n = -1 per query via 3x3 normal equations; returns unit normal
    (Q, 3), offset d (Q,), and validity (all k neighbors within `threshold`
    of the fitted plane, and all k present).
    """
    ones = -jnp.ones(neigh.shape[:2], neigh.dtype)
    XtX = jnp.einsum("qki,qkj->qij", neigh, neigh)
    Xt1 = jnp.einsum("qki,qk->qi", neigh, ones)
    # regularize to keep the solve finite for degenerate neighborhoods;
    # validity gating rejects those fits anyway
    XtX = XtX + 1e-8 * jnp.eye(3, dtype=neigh.dtype)
    # closed-form 3x3 solve (Cramer): jnp.linalg.solve lowers to a vmapped
    # LU that costs ~3 ms/frame on TPU for these 4096 tiny systems
    n_raw = _solve3x3(XtX, Xt1)
    norm = jnp.linalg.norm(n_raw, axis=-1)
    good_norm = norm > 1e-6
    n = n_raw / jnp.maximum(norm, 1e-6)[:, None]
    d = 1.0 / jnp.maximum(norm, 1e-6)
    # plane validity: every neighbor within threshold (reference `:406-414`)
    dist = jnp.abs(jnp.einsum("qki,qi->qk", neigh, n) + d[:, None])
    all_near = jnp.all(jnp.where(nvalid, dist <= threshold, False), axis=-1)
    have_all = jnp.all(nvalid, axis=-1)
    return n, d, good_norm & all_near & have_all


def mapping_step(
    state: MappingState,
    ground_pts: jax.Array,      # (N, 3) sensor-frame ground points (masked)
    ground_mask: jax.Array,     # (N,) bool
    corner_pts: jax.Array,      # (Nc, 3) sensor-frame corner/edge points
    corner_mask: jax.Array,     # (Nc,) bool
    odom_pose: Pose,            # merged odometry pose (odom frame)
    cfg: SlamConfig,
    features: feat_ops.Features | None = None,  # current-frame features for
    # the sliding-window visual BA (required when sliding_window_size > 0)
    surf_pts: jax.Array | None = None,   # (Ns, 3) smooth-surface points
    surf_mask: jax.Array | None = None,  # (the A-LOAM less-flat cloud):
    # walls/planes beyond the RANSAC ground band.  The plane core is
    # orientation-agnostic (fit + point-to-plane work for any normal), so
    # folding them in gives scan-to-map x/y/yaw observations from every
    # structural plane — the surf half of the reference's OWN laserMapping
    # design (C15, `laserMapping.cpp:745-796`) that its launched
    # ground-only mapOptimization lacks.
) -> tuple[MappingState, MappingOutput]:
    mc = cfg.mapping
    ground_cell = 2.0 * mc.ground_voxel   # octant resolution = ground_voxel
    corner_cell = 2.0 * mc.corner_voxel

    # --- pose prior: T_w_sensor = T_map_odom o odom_pose (`:730-736`)
    prior = se3.compose(state.T_map_odom, odom_pose)

    # --- downsample the scan's ground (+ surf) points (PCL voxel filter).
    # Surf FIRST: the downsample's compaction prefilter keeps the first
    # `downsample_prefilter` masked points, and the raw ground mask alone
    # can exceed it (27k points on the +-45 table) — surf points at the
    # tail would never survive.
    if surf_pts is not None:
        ground_pts = jnp.concatenate([surf_pts, ground_pts])
        ground_mask = jnp.concatenate([surf_mask, ground_mask])
    q_pts, q_mask = voxel_downsample(
        ground_pts, ground_mask, mc.ground_voxel, mc.max_query_points,
        prefilter=mc.downsample_prefilter,
    )

    # --- correspondences at the prior pose: 5-NN in the ground map
    q_world = se3.transform_points(prior, q_pts)
    neigh, sq, nvalid = grid_hash.knn(
        state.ground_map, q_world, ground_cell, k=mc.knn,
        neighborhood=mc.knn_neighborhood,
    )
    n, d, plane_ok = _fit_planes(neigh, nvalid, mc.plane_valid_threshold)
    w = (q_mask & plane_ok).astype(jnp.float32)
    num_res = jnp.sum(w).astype(jnp.int32)

    # --- corner point-to-line residuals (config.use_corner_residuals): the
    # x/y/yaw observations the reference's active core lacks — its corner
    # tree is fed but unused (`mapOptimization.cpp:478-479,504-505`); the
    # line-fit residual comes from its own A-LOAM mapping path
    # (`laserMapping.cpp:665-723`)
    c_pts, c_mask = voxel_downsample(
        corner_pts, corner_mask, mc.corner_voxel, mc.max_query_points // 2
    )
    if mc.use_corner_residuals:
        c_world_prior = se3.transform_points(prior, c_pts)
        cn, _, cnv = grid_hash.knn(
            state.corner_map, c_world_prior, corner_cell, k=mc.knn,
            neighborhood=mc.knn_neighborhood,
        )
        la, lb, line_ok = fit_lines(cn, cnv, mc.corner_eig_ratio)
        w_c = ((c_mask & line_ok).astype(jnp.float32)
               * jnp.float32(mc.corner_sqrt_info) ** 2)
        num_corner = jnp.sum(c_mask & line_ok).astype(jnp.int32)
    else:
        num_corner = jnp.asarray(0, jnp.int32)

    # --- robust GN solve from the prior (`:432-442`), anchored by a
    # per-axis prior factor: the ground-plane core observes z/roll/pitch;
    # with enough corner line fits the x/y/yaw prior drops to its weak
    # setting so the line residuals govern those axes — otherwise x/y/yaw
    # stay near the odometry prediction
    enough = num_res >= 16
    corner_enough = num_corner >= mc.min_corner_residuals
    # plane-normal diversity: the surf planes observe x/y (and jointly
    # yaw) only when enough plane normals have lateral components in BOTH
    # axes — a pure-ground scene (all normals ~z) or one long wall (one
    # lateral direction) must keep the strong odometry prior on the
    # unobserved axes
    nx2 = jnp.sum(w * n[:, 0] ** 2)
    ny2 = jnp.sum(w * n[:, 1] ** 2)
    plane_xy_obs = (nx2 >= 32.0) & (ny2 >= 32.0)
    obs_enough = corner_enough | plane_xy_obs
    prior_sqrt_info = jnp.where(
        obs_enough,
        jnp.asarray(mc.prior_sqrt_info_corner, jnp.float32),
        jnp.asarray(mc.prior_sqrt_info, jnp.float32),
    )
    residual_sets = [
        (solver.point_to_plane_nd(
            q_pts, n, d, w * enough.astype(jnp.float32)), 1),
        (solver.pose_prior(prior, prior_sqrt_info), 6),
    ]
    if mc.use_corner_residuals:
        residual_sets.append(
            (solver.point_to_line(
                c_pts, la, lb, w_c * corner_enough.astype(jnp.float32)), 3)
        )
    # --- sliding-window visual BA residuals (`:295-361`); the window size is
    # a compile-time constant, so the shipped 0 costs nothing
    if mc.sliding_window_size > 0:
        if features is None:
            raise ValueError(
                "mapping_step needs current-frame features when "
                "sliding_window_size > 0"
            )
        ba_src, ba_dst, ba_w, num_window = _window_residuals(
            state, features, prior, cfg
        )
        residual_sets.append(
            (solver.point_to_point(ba_src, ba_dst, ba_w), 3)
        )
    else:
        num_window = jnp.asarray(0, jnp.int32)
    fn = solver.concat_residuals(*residual_sets)
    res = solver.solve_pose(
        prior,
        fn,
        iters=mc.gn_iters,
        robust="huber",
        robust_scale=0.2,
    )
    # keep the prior when the map is empty / not enough structure
    do_solve = state.initialized & (enough | (num_window >= 16))
    pose = jax.tree.map(
        lambda s, p: jnp.where(do_solve, s, p), res.pose, prior
    )

    # --- re-anchor map<->odom (`transformUpdate`, `:740-746`)
    T_mo = se3.compose(pose, se3.inverse(odom_pose))
    T_map_odom = jax.tree.map(
        lambda new, old: jnp.where(do_solve, new, old), T_mo, state.T_map_odom
    )

    # --- map insert: world-transformed ground + corner points (`:467-479`).
    # The reference inserts the voxel-DOWNSAMPLED clouds; inserting the raw
    # 65k scan would also cost 16x more scatter traffic per frame.
    g_world = se3.transform_points(pose, q_pts)
    ground_map = grid_hash.insert(state.ground_map, g_world, q_mask,
                                  ground_cell)
    c_world = se3.transform_points(pose, c_pts)
    corner_map = grid_hash.insert(state.corner_map, c_world, c_mask,
                                  corner_cell)

    # --- capacity policy: near-full maps evict points far from the sensor
    # (rolling-cube-map recentering, `laserMapping.cpp:330-565`)
    S, W = ground_map.way_keys.shape
    cap = S * W * 8
    thresh = jnp.int32(mc.map_evict_frac * cap)
    ground_map = jax.lax.cond(
        ground_map.num_points > thresh,
        lambda mm: grid_hash.evict_far(mm, pose.t, mc.map_keep_radius),
        lambda mm: mm, ground_map,
    )
    corner_map = jax.lax.cond(
        corner_map.num_points > thresh,
        lambda mm: grid_hash.evict_far(mm, pose.t, mc.map_keep_radius),
        lambda mm: mm, corner_map,
    )

    # --- sliding-window ring update: this frame's features + refined pose
    # enter the window (`:203` cur_keyframe pushed after the solve)
    if mc.sliding_window_size > 0:
        slot = state.frame_idx % mc.sliding_window_size
        fval = features.valid & features.xyz_valid
        win_desc = state.win_desc.at[slot].set(features.desc)
        win_xyz = state.win_xyz.at[slot].set(features.xyz)
        win_valid = state.win_valid.at[slot].set(fval)
        win_pose = jax.tree.map(
            lambda a, v: a.at[slot].set(v), state.win_pose, pose
        )
        win_count = state.win_count + 1
    else:
        win_desc, win_xyz, win_valid = (
            state.win_desc, state.win_xyz, state.win_valid)
        win_pose, win_count = state.win_pose, state.win_count

    new_state = MappingState(
        ground_map=ground_map,
        corner_map=corner_map,
        T_map_odom=T_map_odom,
        initialized=state.initialized | (jnp.sum(ground_mask) > 0),
        frame_idx=state.frame_idx + 1,
        win_desc=win_desc,
        win_xyz=win_xyz,
        win_valid=win_valid,
        win_pose=win_pose,
        win_count=win_count,
    )
    out = MappingOutput(
        pose=pose,
        num_plane_residuals=num_res,
        num_corner_residuals=num_corner,
        solve_cost=res.final_cost,
        converged=res.converged,
        map_points=ground_map.num_points,
        num_window_residuals=num_window,
        ground_ds=q_pts,
        ground_ds_mask=q_mask,
        corner_ds=c_pts,
        corner_ds_mask=c_mask,
    )
    return new_state, out


def apply_correction(state: MappingState, corr: Pose) -> MappingState:
    """Re-base the live mapping frame by a raw->PGO-frame loop correction:
    T_map_odom <- corr o T_map_odom, so every subsequent mapped pose lands
    in the corrected graph frame (the reference's tf map->pgo_odom,
    `intensity_feature_tracker.cpp:555-582`).  The maps themselves are NOT
    rigidly moved — a single rigid transform cannot un-smear geometry that
    accumulated across the whole drifted trajectory; pair with
    `rebuild_maps` (config `rebuild_on_loop`) for a consistent map."""
    return state._replace(T_map_odom=se3.compose(corr, state.T_map_odom))


def rebuild_maps(
    state: MappingState,
    kf_ground: jax.Array,       # (K, Pg, 3) sensor-frame keyframe clouds
    kf_ground_mask: jax.Array,  # (K, Pg)
    kf_corner: jax.Array,       # (K, Pc, 3)
    kf_corner_mask: jax.Array,  # (K, Pc)
    kf_poses: Pose,             # [K] OPTIMIZED keyframe poses (graph frame)
    num_kf: jax.Array,          # () int32
    cfg: SlamConfig,
) -> MappingState:
    """Rebuild both voxel maps from the per-keyframe downsampled clouds at
    the optimized graph poses — one batched transform + one scatter insert
    per map.

    This is the map half of a loop closure the reference never does: its
    ikd-tree keeps every point at the (drifted) pose it was inserted at
    (`mapOptimization.cpp:467-479` — inserts are permanent), so on a second
    lap the scan-to-map step matches against smeared lap-1+lap-2 geometry.
    A device-resident map makes the full rebuild a single fused pass (~ms),
    so the map snaps to the corrected trajectory along with the poses.
    Non-keyframe frames' points are dropped — keyframes are gated at 0.3 m
    spacing (`spot.yaml:35-36`), denser than both voxel resolutions."""
    mc = cfg.mapping
    K = kf_ground.shape[0]
    live = (jnp.arange(K) < num_kf)[:, None]
    g_world = jax.vmap(se3.transform_points)(kf_poses, kf_ground)
    c_world = jax.vmap(se3.transform_points)(kf_poses, kf_corner)
    num_sets, ways = state.ground_map.way_keys.shape
    ground = grid_hash.insert(
        grid_hash.empty(num_sets, ways),
        g_world.reshape(-1, 3),
        (kf_ground_mask & live).reshape(-1),
        2.0 * mc.ground_voxel,
    )
    corner = grid_hash.insert(
        grid_hash.empty(num_sets, ways),
        c_world.reshape(-1, 3),
        (kf_corner_mask & live).reshape(-1),
        2.0 * mc.corner_voxel,
    )
    return state._replace(ground_map=ground, corner_map=corner)
