"""Geometric-only SLAM pipeline for unorganized scans (KITTI-style).

The reference supports Velodyne-style sensors through its ring-assignment
ladder (`src/scanRegistration.cpp:290-325`: 16/32/64/128-line elevation
binning) feeding the A-LOAM pipeline; with no usable intensity channel the
intensity front-end contributes nothing and the system reduces to
scanRegistration -> laserOdometry -> laserMapping (C11, C12, C15).  This
module is that configuration end to end (BASELINE.json config #2):

    unorganized (N, 3[+i]) scan
      -> spherical projection / ring binning (`ops.projection.
         project_unorganized`, the scatter-min analogue of `:290-325`)
      -> curvature features (C11, `ops.curvature`)
      -> A-LOAM scan-to-scan odometry EVERY frame (C12,
         `pipeline.geometric` — in the organized pipeline it is the
         degeneracy fallback; here it is the only odometry)
      -> A-LOAM scan-to-map refinement (C15, `pipeline.laser_mapping`)

One jitted step per frame; `run_sequence` replays under `lax.scan`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..ops import curvature, projection
from ..utils import se3
from ..utils.se3 import Pose
from . import geometric, laser_mapping


class GeoSlamState(NamedTuple):
    geo: geometric.GeometricState
    lmap: laser_mapping.LaserMappingState
    odom_pose: Pose             # integrated scan-to-scan odometry


class GeoSlamOutput(NamedTuple):
    pose: Pose                  # map-refined pose (`/aft_mapped_to_init`)
    odom_pose: Pose             # raw odometry pose (`/laser_odom_to_init_aloam`)
    num_corner_residuals: jax.Array
    num_surf_residuals: jax.Array
    num_sharp: jax.Array        # () int32 sharp features this frame
    converged: jax.Array


def init_state(cfg: SlamConfig) -> GeoSlamState:
    gc, sc = cfg.geometric, cfg.sensor
    num_less_sharp = sc.image_height * gc.num_segments * gc.less_sharp_per_segment
    return GeoSlamState(
        geo=geometric.init_state(cfg, num_less_sharp, gc.max_surf_points),
        lmap=laser_mapping.init_state(cfg),
        odom_pose=Pose.identity(),
    )


def geo_slam_step(
    state: GeoSlamState,
    xyz: jax.Array,             # (N, 3) unorganized scan, zero-padded
    intensity: jax.Array,       # (N,) (unused by the solves; carried for
    #                             projection-image completeness)
    cfg: SlamConfig,
    fov_up_deg: float | None = None,
    fov_down_deg: float | None = None,
) -> tuple[GeoSlamState, GeoSlamOutput]:
    # FOV defaults come from the sensor config (ADVICE r4: hard-coded
    # +-16.6 here silently cropped +-45 OS0 points when paired with
    # os0_64_config); explicit arguments still override for sensors whose
    # spherical binning differs from the render table
    scan = projection.project_unorganized(
        xyz, intensity, cfg.sensor,
        cfg.sensor.fov_up if fov_up_deg is None else fov_up_deg,
        cfg.sensor.fov_down if fov_down_deg is None else fov_down_deg,
    )
    fc = curvature.extract_features(scan, cfg.sensor, cfg.geometric)

    # scan-to-scan solve EVERY frame (`laserOdometry.cpp:417` — in this
    # configuration there is no intensity stream to defer to)
    delta = jax.lax.cond(
        state.geo.has_prev,
        lambda: geometric.geometric_delta(state.geo, fc, cfg),
        lambda: Pose.identity(),
    )
    odom_pose = se3.compose(state.odom_pose, delta)
    geo_state = geometric.update_state(state.geo, fc, delta)

    lmap_state, lout = laser_mapping.laser_mapping_step(
        state.lmap, fc, odom_pose, cfg
    )

    new_state = GeoSlamState(geo=geo_state, lmap=lmap_state,
                             odom_pose=odom_pose)
    out = GeoSlamOutput(
        pose=lout.pose,
        odom_pose=odom_pose,
        num_corner_residuals=lout.num_corner_residuals,
        num_surf_residuals=lout.num_surf_residuals,
        num_sharp=jnp.sum(fc.sharp_mask).astype(jnp.int32),
        converged=lout.converged,
    )
    return new_state, out


def run_sequence(
    xyz_seq: jax.Array,         # (T, N, 3) unorganized scans (zero-padded)
    inten_seq: jax.Array,       # (T, N)
    cfg: SlamConfig,
    fov_up_deg: float | None = None,
    fov_down_deg: float | None = None,
) -> GeoSlamOutput:
    """Replay a whole unorganized sequence under one `lax.scan`."""

    def step(state, inp):
        x, i = inp
        state, out = geo_slam_step(state, x, i, cfg, fov_up_deg, fov_down_deg)
        return state, out

    _, outs = jax.lax.scan(step, init_state(cfg), (xyz_seq, inten_seq))
    return outs
