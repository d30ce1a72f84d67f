"""Geometric (A-LOAM) scan-to-scan odometry — the degeneracy fallback (C12).

Replicates `src/laserOdometry.cpp`: when the intensity tracker raises the
skip flag, 2 outer iterations of correspondence + Ceres solve (<=4 iters
each) estimate the frame delta from curvature features (`:406-417,703-710`):

- edge: each sharp point matches its nearest less-sharp point j of the
  previous frame, plus a second point l on a different ring within
  NEARBY_SCAN (2.5) rings, both inside DIST_SQ_THRESHOLD (25) ->
  point-to-line residual (`LidarEdgeFactor`, `:446-563`)
- plane: each flat point matches 3 previous less-flat points spanning a
  plane -> point-to-3pt-plane residual (`LidarPlaneFactor`, `:568-687`)
- DISTORTION=0 in the reference (`:82`), so TransformToStart is the plain
  delta — no slerp interpolation needed.

TPU design: previous-frame clouds are small fixed buffers (<=8k points), so
correspondence search is a dense distance matrix + masked argmin — exact,
no kd-tree, one fused kernel per correspondence type.  Deviation from the
reference, for the record: less-flat points lose their ring id in voxel
downsampling, so plane correspondences take the 3 nearest neighbors with a
non-collinearity gate instead of the ring-stratified (j, l, m) pick — the
fitted plane is the same where the reference's pick succeeds.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..ops import solver
from ..ops.curvature import FeatureClouds
from ..utils import se3
from ..utils.se3 import Pose


class GeometricState(NamedTuple):
    last_less_sharp: jax.Array      # (Nl, 3)
    last_less_sharp_mask: jax.Array
    last_less_sharp_ring: jax.Array # (Nl,) int32
    last_less_flat: jax.Array       # (Nd, 3)
    last_less_flat_mask: jax.Array
    last_delta: Pose                # warm start (the reference's para_q/
    # para_t persist across frames, laserOdometry.cpp:97-103 — a constant-
    # velocity prior that matters at 0.3 m/frame steps)
    has_prev: jax.Array             # () bool


def init_state(cfg: SlamConfig, num_less_sharp: int, num_less_flat: int
               ) -> GeometricState:
    return GeometricState(
        last_less_sharp=jnp.zeros((num_less_sharp, 3), jnp.float32),
        last_less_sharp_mask=jnp.zeros((num_less_sharp,), bool),
        last_less_sharp_ring=jnp.zeros((num_less_sharp,), jnp.int32),
        last_less_flat=jnp.zeros((num_less_flat, 3), jnp.float32),
        last_less_flat_mask=jnp.zeros((num_less_flat,), bool),
        last_delta=Pose.identity(),
        has_prev=jnp.asarray(False),
    )


def _edge_correspondences(
    q: jax.Array, q_mask: jax.Array, q_ring: jax.Array,
    last: jax.Array, last_mask: jax.Array, last_ring: jax.Array,
    dist_sq_threshold: float, nearby_scan: float,
):
    """For each query: nearest previous point j, plus nearest l on a
    different-but-nearby ring (`laserOdometry.cpp:446-563`)."""
    d = jnp.sum((q[:, None, :] - last[None, :, :]) ** 2, axis=-1)
    d = jnp.where(last_mask[None, :], d, jnp.inf)
    j = jnp.argmin(d, axis=1)
    dj = jnp.take_along_axis(d, j[:, None], axis=1)[:, 0]
    ring_j = last_ring[j]
    ring_diff = jnp.abs(last_ring[None, :] - ring_j[:, None])
    l_elig = (ring_diff >= 1) & (ring_diff <= nearby_scan)
    dl_m = jnp.where(l_elig, d, jnp.inf)
    l = jnp.argmin(dl_m, axis=1)
    dl = jnp.take_along_axis(dl_m, l[:, None], axis=1)[:, 0]
    ok = (q_mask & (dj < dist_sq_threshold) & (dl < dist_sq_threshold))
    return last[j], last[l], ok


def _plane_correspondences(
    q: jax.Array, q_mask: jax.Array,
    last: jax.Array, last_mask: jax.Array,
    dist_sq_threshold: float,
):
    """3-NN previous surface points spanning a non-degenerate plane."""
    d = jnp.sum((q[:, None, :] - last[None, :, :]) ** 2, axis=-1)
    d = jnp.where(last_mask[None, :], d, jnp.inf)
    neg, idx = jax.lax.top_k(-d, 3)
    dists = -neg                                   # (Q, 3)
    a, b, c = last[idx[:, 0]], last[idx[:, 1]], last[idx[:, 2]]
    area2 = jnp.sum(jnp.cross(b - a, c - a) ** 2, axis=-1)
    ok = (
        q_mask
        & jnp.all(dists < dist_sq_threshold, axis=-1)
        & (area2 > 1e-6)
    )
    return a, b, c, ok


def geometric_delta(
    state: GeometricState, fc: FeatureClouds, cfg: SlamConfig
) -> Pose:
    """Estimate the frame delta T_prev<-cur from curvature features."""
    gc = cfg.geometric
    delta = state.last_delta  # constant-velocity warm start

    def outer(delta, _):
        # transform current features into the previous frame at the current
        # delta estimate (TransformToStart with DISTORTION=0)
        s_cur = se3.transform_points(delta, fc.sharp)
        f_cur = se3.transform_points(delta, fc.flat)
        ea, eb, e_ok = _edge_correspondences(
            s_cur, fc.sharp_mask, fc.sharp_ring,
            state.last_less_sharp, state.last_less_sharp_mask,
            state.last_less_sharp_ring,
            gc.dist_sq_threshold, gc.nearby_scan,
        )
        pa, pb, pc, p_ok = _plane_correspondences(
            f_cur, fc.flat_mask,
            state.last_less_flat, state.last_less_flat_mask,
            gc.dist_sq_threshold,
        )
        fn = solver.concat_residuals(
            (solver.point_to_line(fc.sharp, ea, eb,
                                  e_ok.astype(jnp.float32)), 3),
            (solver.point_to_plane_3pt(fc.flat, pa, pb, pc,
                                       p_ok.astype(jnp.float32)), 1),
        )
        res = solver.solve_pose(
            delta, fn, iters=gc.odom_gn_iters,
            robust="huber", robust_scale=0.1,
        )
        enough = (jnp.sum(e_ok) + jnp.sum(p_ok)) >= 10
        new_delta = jax.tree.map(
            lambda n_, o: jnp.where(state.has_prev & enough, n_, o),
            res.pose, delta,
        )
        return new_delta, None

    delta, _ = jax.lax.scan(outer, delta, None, length=gc.odom_outer_iters)
    return delta


def update_state(state: GeometricState, fc: FeatureClouds,
                 delta: Pose) -> GeometricState:
    """Swap current less-sharp/less-flat into 'last' (`:793-808`) and keep
    the frame delta as the next warm start."""
    return GeometricState(
        last_less_sharp=fc.less_sharp,
        last_less_sharp_mask=fc.less_sharp_mask,
        last_less_sharp_ring=fc.less_sharp_ring,
        last_less_flat=fc.less_flat,
        last_less_flat_mask=fc.less_flat_mask,
        last_delta=delta,
        has_prev=jnp.asarray(True),
    )
