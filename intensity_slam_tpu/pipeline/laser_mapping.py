"""A-LOAM scan-to-map mapping (reference C15, `src/laserMapping.cpp`).

The reference builds this node but does not launch it (`spot.launch:14`
comments it out) — it is the classic A-LOAM mapping back-end, kept for
completeness and as an alternative to the intensity pipeline's ground-plane
back-end (C14, `pipeline/mapping.py`).  We replicate its full behavior:

- pose prediction `q_wmap_wodom (x) odom` (`laserMapping.cpp:170-177`)
- corner residuals (`:665-723`): each voxel-downsampled corner point takes
  its 5 nearest map corner points; the neighborhood covariance is
  eigen-decomposed (`SelfAdjointEigenSolver`) and if the largest eigenvalue
  dominates (`lambda_2 > 3 lambda_1`) the neighborhood is a line — the point
  contributes a `LidarEdgeFactor` point-to-line residual against the two
  virtual endpoints `center +- 0.1 * dir`
- surf residuals (`:745-796`): 5-NN plane fit (`X n = -1` least squares),
  validity-checked at 0.2 m, -> `LidarPlaneNormFactor` point-to-plane
- 2 outer correspondence iterations x Ceres <=4 iterations (`:640,836-850`)
- map insert with per-cube voxel downsampling (`:877-1002`): world-
  transformed corner/surf clouds at line/plane resolution (0.4 / 0.8 m,
  `spot.launch:4-5`)

Replaced, not ported: the 21x21x11 rolling grid of 50 m cubes with
recentering shifts (`:330-565`) and the 5x5x3 submap gather (`:572-603`)
exist only to bound the PCL kd-trees' rebuild cost and keep the map array
centered on the robot.  The voxel grid-hash (`ops/grid_hash.py`) is
translation-invariant and needs no recentering, and its 27-cell k-NN gather
IS the submap restriction — so both mechanisms disappear by design.

TPU design: the two correspondence searches are batched 27-cell k-NN
gathers; all eigen/plane fits are batched 3x3 problems; the pose solve is
the shared robust GN core; the whole step is one jitted program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..ops import grid_hash, solver
from ..ops.curvature import FeatureClouds
from ..ops.voxel import voxel_downsample
from ..utils import se3
from ..utils.se3 import Pose
from .mapping import fit_lines as _fit_lines
from .mapping import _fit_planes


# Weak uniform anchor to the odometry prediction.  Unlike the ground-only
# back-end (C14), corner + surf residuals observe all 6 DoF, so this exists
# only to regularize genuinely structure-less scans — the reference relies
# on Ceres's trust region for the same effect (`laserMapping.cpp:836-850`).
_PRIOR_SQRT_INFO = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0)


class LaserMappingState(NamedTuple):
    corner_map: grid_hash.VoxelHashMap
    surf_map: grid_hash.VoxelHashMap
    T_map_odom: Pose            # `q/t_wmap_wodom` anchor (`laserMapping.cpp:80-85`)
    initialized: jax.Array      # () bool
    frame_idx: jax.Array        # () int32


class LaserMappingOutput(NamedTuple):
    pose: Pose                  # `/aft_mapped_to_init` map-frame pose
    num_corner_residuals: jax.Array  # () int32
    num_surf_residuals: jax.Array    # () int32
    solve_cost: jax.Array
    converged: jax.Array


def init_state(cfg: SlamConfig) -> LaserMappingState:
    mc = cfg.mapping
    num_sets = mc.map_capacity // (4 * 8)
    return LaserMappingState(
        corner_map=grid_hash.empty(num_sets, 4),
        surf_map=grid_hash.empty(num_sets, 4),
        T_map_odom=Pose.identity(),
        initialized=jnp.asarray(False),
        frame_idx=jnp.asarray(0, jnp.int32),
    )


def laser_mapping_step(
    state: LaserMappingState,
    fc: FeatureClouds,          # curvature features of this scan (sensor frame)
    odom_pose: Pose,            # scan-to-scan odometry pose (odom frame)
    cfg: SlamConfig,
) -> tuple[LaserMappingState, LaserMappingOutput]:
    mc = cfg.mapping
    corner_cell = 2.0 * mc.corner_voxel
    surf_cell = 2.0 * mc.ground_voxel

    # --- prediction: T_w_sensor = T_map_odom o odom (`:170-177`)
    prior = se3.compose(state.T_map_odom, odom_pose)

    # --- voxel-downsample the scan's features (`:610-626`)
    c_pts, c_mask = voxel_downsample(
        fc.less_sharp, fc.less_sharp_mask, mc.corner_voxel,
        mc.max_query_points // 2,
    )
    s_pts, s_mask = voxel_downsample(
        fc.less_flat, fc.less_flat_mask, mc.ground_voxel,
        mc.max_query_points,
    )

    def outer(pose, _):
        # correspondences are re-gathered at the current estimate each outer
        # iteration (`:640`), exactly like the reference's 2x loop
        c_world = se3.transform_points(pose, c_pts)
        cn, _, cnv = grid_hash.knn(
            state.corner_map, c_world, corner_cell, k=mc.knn,
            neighborhood=mc.knn_neighborhood,
        )
        la, lb, line_ok = _fit_lines(cn, cnv)
        cw = (c_mask & line_ok).astype(jnp.float32)

        s_world = se3.transform_points(pose, s_pts)
        sn, _, snv = grid_hash.knn(
            state.surf_map, s_world, surf_cell, k=mc.knn,
            neighborhood=mc.knn_neighborhood,
        )
        n, d, plane_ok = _fit_planes(sn, snv, mc.plane_valid_threshold)
        sw = (s_mask & plane_ok).astype(jnp.float32)

        num_res = jnp.sum(cw).astype(jnp.int32) + jnp.sum(sw).astype(jnp.int32)
        enough = num_res >= 50                              # `:831-834` gate
        gate = enough.astype(jnp.float32)
        fn = solver.concat_residuals(
            (solver.point_to_line(c_pts, la, lb, cw * gate), 3),
            (solver.point_to_plane_nd(s_pts, n, d, sw * gate), 1),
            (solver.pose_prior(
                prior, jnp.asarray(_PRIOR_SQRT_INFO, jnp.float32)), 6),
        )
        res = solver.solve_pose(
            pose, fn, iters=4, robust="huber", robust_scale=0.1,
        )
        do = state.initialized & enough
        new_pose = jax.tree.map(
            lambda s_, p_: jnp.where(do, s_, p_), res.pose, pose
        )
        return new_pose, (jnp.sum(cw).astype(jnp.int32),
                          jnp.sum(sw).astype(jnp.int32),
                          res.final_cost, res.converged & do)

    pose, (ncs, nss, costs, convs) = jax.lax.scan(
        outer, prior, None, length=2
    )

    # --- re-anchor map<->odom (`transformUpdate`, `:203-207`)
    T_mo = se3.compose(pose, se3.inverse(odom_pose))
    T_map_odom = jax.tree.map(
        lambda new, old: jnp.where(state.initialized, new, old),
        T_mo, state.T_map_odom,
    )

    # --- map insert with voxel dedup (`:877-1002`)
    c_world = se3.transform_points(pose, c_pts)
    s_world = se3.transform_points(pose, s_pts)
    corner_map = grid_hash.insert(state.corner_map, c_world, c_mask,
                                  corner_cell)
    surf_map = grid_hash.insert(state.surf_map, s_world, s_mask, surf_cell)

    new_state = LaserMappingState(
        corner_map=corner_map,
        surf_map=surf_map,
        T_map_odom=T_map_odom,
        initialized=state.initialized | (jnp.sum(s_mask) > 0),
        frame_idx=state.frame_idx + 1,
    )
    out = LaserMappingOutput(
        pose=pose,
        num_corner_residuals=ncs[-1],
        num_surf_residuals=nss[-1],
        solve_cost=costs[-1],
        converged=convs[-1],
    )
    return new_state, out


def map_snapshot(m: grid_hash.VoxelHashMap) -> tuple[jax.Array, jax.Array]:
    """Flatten a map to (P, 3) points + (P,) validity — the analogue of the
    reference's periodic surround/full map publishing (`laserMapping.cpp:
    1009-1048`, every 5/20 frames) and ikd-Tree `flatten`."""
    return m.pts.reshape(-1, 3), m.valid.reshape(-1)
