"""Full SLAM pipeline: odometry stream + scan-to-map back-end in one step.

Composes the stages the reference runs as five OS processes connected by ROS
topics (SURVEY §3 topic graph) into a single jitted per-frame program:

    scan -> project (C1) -> intensity odometry (C3-C6)
         -> ground extraction (C2)
         -> odometry mux (C13): intensity delta unless skipped
         -> scan-to-map refine + map insert (C14)

The mux contract (`odom_handler_node.cpp:96-131`): per frame, compose the
incremental delta from the intensity stream when it is valid, else from the
geometric fallback stream.  The geometric A-LOAM pipeline (C11/C12) plugs in
via the `fallback_delta` argument; until a frame provides one, a skipped
frame contributes an identity delta (constant-position fallback).

Pose graph + loop closure (C7-C10) consume the keyframe outputs downstream
(pipeline.posegraph / pipeline.loop).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..ops import curvature, ground, projection
from ..utils import se3
from ..utils.se3 import Pose
from . import geometric, mapping, odometry


class SlamState(NamedTuple):
    odo: odometry.OdometryState
    geo: geometric.GeometricState
    mapping: mapping.MappingState
    merged_pose: Pose           # mux-integrated odometry (odom frame)
    rng: jax.Array
    last_delta: Pose            # VELOCITY estimate: EMA (0.5 mix) of the
    # per-frame mux deltas, used as the constant-velocity prediction for
    # motion undistortion (sensor.undistort).  Why an EMA and not the raw
    # previous delta: undistorting frame k with delta_{k-1} closes a
    # feedback loop whose error gain is ~1 — a prediction error shears the
    # cloud, biasing the NEXT delta the opposite way, and the estimate
    # ping-pongs around the truth with GROWING amplitude (measured: +-0.07 m
    # oscillation after 15 frames, 16 m ATE over a 200-frame circuit).  The
    # 0.5 mix has zero gain at exactly that alternating (Nyquist) mode.


class SlamOutput(NamedTuple):
    pose: Pose                  # final map-frame pose (mapping-refined)
    odom_pose: Pose             # merged odometry pose (before mapping)
    skip: jax.Array
    is_keyframe: jax.Array
    num_good: jax.Array
    num_plane_residuals: jax.Array
    num_window_residuals: jax.Array  # sliding-window BA matches (0 if off)
    ground_ok: jax.Array
    map_points: jax.Array
    desc: jax.Array             # (K, 8) uint32 frame descriptors (for the
    # keyframe store / BoW loop channel); None inside lax.scan replays
    desc_valid: jax.Array
    feat_xyz: jax.Array         # (K, 3) sensor-frame feature points (for the
    # keyframe store / distributed BA); None inside lax.scan replays
    # downsampled sensor-frame ground/corner clouds this frame inserted
    # (keyframe store -> loop-closure map rebuild); zeros in scan replays
    ground_ds: jax.Array        # (Pg, 3)
    ground_ds_mask: jax.Array   # (Pg,)
    corner_ds: jax.Array        # (Pc, 3)
    corner_ds_mask: jax.Array   # (Pc,)


def init_state(cfg: SlamConfig, seed: int = 0) -> SlamState:
    gc, sc = cfg.geometric, cfg.sensor
    num_less_sharp = sc.image_height * gc.num_segments * gc.less_sharp_per_segment
    return SlamState(
        odo=odometry.init_state(cfg),
        geo=geometric.init_state(cfg, num_less_sharp, gc.max_surf_points),
        mapping=mapping.init_state(cfg),
        merged_pose=Pose.identity(),
        rng=jax.random.PRNGKey(seed),
        last_delta=Pose.identity(),
    )


def undistort_scan(xyz: jax.Array, delta: Pose, cfg: SlamConfig) -> jax.Array:
    """Move every point to the scan-START frame under a constant-velocity
    model (A-LOAM TransformToStart, `laserOdometry.cpp:147-194`): a point
    fired at intra-scan fraction a is corrected by delta^a — slerp on the
    rotation, linear on the translation.  The fraction is the column index
    over the width (Ouster columns are firing instants).  One batched slerp
    + rotate over all H*W points; the reference's DISTORTION flag ships 0,
    so this is config-gated (`sensor.undistort`)."""
    sc = cfg.sensor
    col = (jnp.arange(xyz.shape[0]) % sc.image_width).astype(jnp.float32)
    alpha = (col / sc.image_width)[:, None]
    ident = jnp.array([1.0, 0.0, 0.0, 0.0], xyz.dtype)
    q_a = se3.slerp(ident, delta.q, alpha)
    return se3.quat_rotate(q_a, xyz) + alpha * delta.t


def slam_step(
    state: SlamState,
    xyz: jax.Array,            # (H*W, 3) organized scan
    inten: jax.Array,          # (H*W,)
    timestamp: jax.Array,
    detect_mask: jax.Array,
    cfg: SlamConfig,
    fallback_delta: Pose | None = None,
) -> tuple[SlamState, SlamOutput]:
    if cfg.sensor.undistort:
        xyz = undistort_scan(xyz, state.last_delta, cfg)
    scan = projection.project_organized(xyz, inten, cfg.sensor)

    # --- intensity odometry (CS-1)
    odo_state, odo_out = odometry.odometry_step(
        state.odo, scan, timestamp, detect_mask, cfg
    )

    # --- geometric features every frame (scanRegistration runs per scan);
    # the fallback SOLVE only on skip (`laserOdometry.cpp:406-417`)
    fc = curvature.extract_features(scan, cfg.sensor, cfg.geometric)
    if fallback_delta is None:
        fallback_delta = jax.lax.cond(
            odo_out.skip & state.geo.has_prev,
            lambda: geometric.geometric_delta(state.geo, fc, cfg),
            lambda: Pose.identity(),
        )
    # --- mux (C13): intensity delta unless skipped
    delta = jax.tree.map(
        lambda a, b: jnp.where(odo_out.skip, b, a), odo_out.delta, fallback_delta
    )
    merged = se3.compose(state.merged_pose, delta)
    # the mux delta (whichever stream produced it) is the best velocity
    # estimate — warm-starts the next geometric solve
    geo_state = geometric.update_state(state.geo, fc, delta)

    # --- ground extraction (C2)
    rng, sub = jax.random.split(state.rng)
    gres = ground.extract_ground(sub, xyz, scan.valid.reshape(-1), cfg.ground)

    # --- scan-to-map (C14); corners = less-sharp cloud (the reference feeds
    # its corner ikd-tree with the less-sharp features, `:478-479`); surf =
    # less-flat cloud so wall planes observe x/y/yaw (r5, see mapping_step)
    map_state, map_out = mapping.mapping_step(
        state.mapping,
        xyz, gres.ground_mask,
        fc.less_sharp, fc.less_sharp_mask,
        merged, cfg,
        features=odo_out.features,
        surf_pts=fc.less_flat, surf_mask=fc.less_flat_mask,
    )

    # velocity EMA for the next frame's undistortion prediction (see
    # SlamState.last_delta)
    vel = Pose(
        q=se3.quat_normalize(
            se3.slerp(state.last_delta.q, delta.q, jnp.float32(0.5))),
        t=0.5 * (state.last_delta.t + delta.t),
    )
    new_state = SlamState(
        odo=odo_state, geo=geo_state, mapping=map_state,
        merged_pose=merged, rng=rng, last_delta=vel,
    )
    out = SlamOutput(
        pose=map_out.pose,
        odom_pose=merged,
        skip=odo_out.skip,
        is_keyframe=odo_out.is_keyframe,
        num_good=odo_out.num_good,
        num_plane_residuals=map_out.num_plane_residuals,
        num_window_residuals=map_out.num_window_residuals,
        ground_ok=gres.ok,
        map_points=map_out.map_points,
        desc=odo_out.features.desc,
        desc_valid=odo_out.features.valid & odo_out.features.xyz_valid,
        feat_xyz=odo_out.features.xyz,
        ground_ds=map_out.ground_ds,
        ground_ds_mask=map_out.ground_ds_mask,
        corner_ds=map_out.corner_ds,
        corner_ds_mask=map_out.corner_ds_mask,
    )
    return new_state, out


def run_sequence(
    xyz_seq: jax.Array, inten_seq: jax.Array, times: jax.Array, cfg: SlamConfig
) -> SlamOutput:
    """Replay a sequence through the full pipeline under lax.scan."""
    mask = projection.detection_mask(cfg.sensor)

    def step(state, inp):
        x, i, t = inp
        state, out = slam_step(state, x, i, t, mask, cfg)
        # descriptors/clouds are per-frame bulk data — drop them from the
        # stacked replay output to bound memory
        z = jnp.zeros(0, jnp.float32)
        return state, out._replace(desc=jnp.zeros(0, jnp.uint32),
                                   desc_valid=jnp.zeros(0, bool),
                                   feat_xyz=z, ground_ds=z,
                                   ground_ds_mask=jnp.zeros(0, bool),
                                   corner_ds=z,
                                   corner_ds_mask=jnp.zeros(0, bool))

    _, outs = jax.lax.scan(step, init_state(cfg), (xyz_seq, inten_seq, times))
    return outs
