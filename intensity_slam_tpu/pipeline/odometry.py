"""Intensity scan-to-scan odometry stream (reference CS-1, components C3-C6).

Replicates the behavioral contract of `feature_tracker::detectfeatures`
(`src/intensity_feature_tracker.cpp:597-739`):

- detect + describe on the intensity image with the crop mask
- mutual-NN Hamming match vs the previous frame, keep top 30% by distance
- good-frame gate: previous frame exists AND good >= 4 AND good != all
  (`:693`)
- good -> robust point-to-point GN solve for T_s2s (Huber 0.1, <=20 iters,
  `:880-928`); bad -> T_s2s = I and the skip flag raises (`:722-730`),
  which downstream muxes to the geometric pipeline (C13 contract: the
  reference encodes this as `child_frame_id == "/odom_skip"`,
  `odom_handler_node.cpp:100-106` — here it is an explicit boolean)
- pose integration T_s2m *= T_s2s (`:817-877`)
- keyframe gate: first frame, or (dt > 0.3 s AND dist > 0.3 m) (`:741-815`,
  `config/spot.yaml:35-36`)

The whole per-frame step is one jitted program; frame-to-frame state is a
pytree carried through `lax.scan` (sequence replay) or across step calls
(streaming).  The reference's 2x-feature re-detect fallback (`:652-692`)
becomes a second match pass with a looser keep fraction, branchlessly
selected when the first pass fails — detection is already top-K so
re-detection with more features adds nothing on TPU (we always detect the
full K budget; the reference re-detects because OpenCV ORB truncates).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..ops import features as F
from ..ops import projection, solver
from ..utils import se3
from ..utils.se3 import Pose


class OdometryState(NamedTuple):
    pose: Pose                 # T_s2m: sensor->odometry-map, integrated
    prev_desc: jax.Array       # (K, 8) uint32
    prev_xyz: jax.Array        # (K, 3)
    prev_xyz_valid: jax.Array  # (K,) bool
    has_prev: jax.Array        # () bool
    last_kf_time: jax.Array    # () f32
    last_kf_pos: jax.Array     # (3,) f32
    frame_idx: jax.Array       # () int32
    # NOTE: a constant-velocity warm start of the solve (previous delta as
    # init) was tried and REVERTED: under motion undistortion the scan is
    # already corrected with a velocity prediction (slam.SlamState
    # .last_delta EMA), and warm-starting the solve from the previous
    # estimate re-couples consecutive frames through that feedback loop —
    # circuit ATE degraded 0.56 m -> 0.77 m (3.49 m with full-20-iter LM).
    # Identity init + the consecutive-rejection LM exit is both faster and
    # more accurate.


class OdometryOutput(NamedTuple):
    pose: Pose                 # integrated odometry pose after this frame
    delta: Pose                # T_s2s this frame (identity when skipped)
    skip: jax.Array            # () bool — intensity odometry degenerate
    is_keyframe: jax.Array     # () bool
    num_good: jax.Array        # () int32 matches used
    num_mutual: jax.Array      # () int32
    solve_cost: jax.Array      # () f32 final robust cost
    features: F.Features       # current-frame features (for keyframe store)


def init_state(cfg: SlamConfig) -> OdometryState:
    K = cfg.feature.num_features
    return OdometryState(
        pose=Pose.identity(),
        prev_desc=jnp.zeros((K, 8), jnp.uint32),
        prev_xyz=jnp.zeros((K, 3), jnp.float32),
        prev_xyz_valid=jnp.zeros((K,), bool),
        has_prev=jnp.asarray(False),
        last_kf_time=jnp.asarray(-1e9, jnp.float32),
        last_kf_pos=jnp.zeros(3, jnp.float32),
        frame_idx=jnp.asarray(0, jnp.int32),
    )


def odometry_step(
    state: OdometryState,
    scan: projection.ScanImage,
    timestamp: jax.Array,
    detect_mask: jax.Array,
    cfg: SlamConfig,
) -> tuple[OdometryState, OdometryOutput]:
    fc, oc = cfg.feature, cfg.odometry
    feats = F.extract(scan, detect_mask, fc)

    # --- match current -> previous (src = current, dst = previous so the
    # solved transform maps current-frame points into the previous frame,
    # i.e. T_prev<-cur = T_s2s as integrated by the reference).  The retry
    # contract (`:652-692`: re-detect with detect_multiplier x features,
    # keep top 20%) is a second, looser rank cut on the SAME match matrix —
    # one pass computes both (ops.features.match_retry).
    m = F.match_retry(
        feats.desc, feats.xyz_valid, state.prev_desc, state.prev_xyz_valid,
        fc.match_keep_frac, fc.match_keep_frac_retry * fc.detect_multiplier,
        fc.min_good_matches, fc.max_hamming,
    )

    src = feats.xyz[m.src_idx]
    dst = state.prev_xyz[m.dst_idx]
    w = (m.valid & feats.xyz_valid[m.src_idx]
         & state.prev_xyz_valid[m.dst_idx]).astype(jnp.float32)
    num_good = jnp.sum(w).astype(jnp.int32)

    # good-frame gate (`:693`): prev exists, good >= 4, good != all-mutual
    pre_good = (
        state.has_prev
        & (num_good >= fc.min_good_matches)
        & (num_good != m.num_mutual)
    )

    res = solver.solve_pose(
        Pose.identity(),
        solver.point_to_point(src, dst, w * state.has_prev.astype(jnp.float32)),
        iters=oc.gn_iters,
        robust="huber",
        robust_scale=oc.huber_delta,
        lm_lambda0=oc.lm_lambda0,
    )
    # degeneracy gate: a handful of distant/aliased matches can pass the
    # count gate yet leave pose directions unobserved (e.g. silhouette
    # corners on a far wall).  The smallest Hessian eigenvalue measures the
    # weakest-direction information; below threshold the frame is degenerate
    # and the geometric fallback takes over.
    good_frame = pre_good & (res.min_hessian_eig >= oc.min_hessian_eig)
    ident = Pose.identity()
    delta = jax.tree.map(
        lambda g, i: jnp.where(good_frame, g, i), res.pose, ident
    )
    skip = ~good_frame

    new_pose = se3.compose(state.pose, delta)

    # --- keyframe gate (`:741-815`)
    dt = timestamp - state.last_kf_time
    dist = jnp.linalg.norm(new_pose.t - state.last_kf_pos)
    is_first = state.frame_idx == 0
    is_kf = is_first | (
        (dt > oc.keyframe_time_interval) & (dist > oc.keyframe_distance_interval)
    )

    new_state = OdometryState(
        pose=new_pose,
        prev_desc=feats.desc,
        prev_xyz=feats.xyz,
        prev_xyz_valid=feats.xyz_valid,
        has_prev=jnp.asarray(True),
        last_kf_time=jnp.where(is_kf, timestamp, state.last_kf_time),
        last_kf_pos=jnp.where(is_kf, new_pose.t, state.last_kf_pos),
        frame_idx=state.frame_idx + 1,
    )
    out = OdometryOutput(
        pose=new_pose,
        delta=delta,
        skip=skip,
        is_keyframe=is_kf,
        num_good=num_good,
        num_mutual=m.num_mutual,
        solve_cost=res.final_cost,
        features=feats,
    )
    return new_state, out


def run_sequence(
    xyz_seq: jax.Array,       # (T, H*W, 3)
    inten_seq: jax.Array,     # (T, H*W)
    times: jax.Array,         # (T,)
    cfg: SlamConfig,
) -> OdometryOutput:
    """Replay a whole sequence under one `lax.scan` — the benchmark path.

    Returns stacked per-frame outputs (features omitted to bound memory).
    """
    mask = projection.detection_mask(cfg.sensor)

    def step(state, inp):
        xyz, inten, t = inp
        scan = projection.project_organized(xyz, inten, cfg.sensor)
        state, out = odometry_step(state, scan, t, mask, cfg)
        return state, out._replace(features=None)

    _, outs = jax.lax.scan(step, init_state(cfg), (xyz_seq, inten_seq, times))
    return outs


def ate_rmse(est_pos: jax.Array, gt_pos: jax.Array) -> jax.Array:
    """Absolute trajectory error after Umeyama-free alignment of the first
    pose (both trajectories start at identity in our tests)."""
    d = est_pos - gt_pos
    return jnp.sqrt(jnp.mean(jnp.sum(d * d, axis=-1)))
