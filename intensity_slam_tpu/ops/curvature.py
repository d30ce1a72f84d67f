"""A-LOAM curvature feature extraction (reference C11).

Replicates `src/scanRegistration.cpp`:

- curvature per point: squared norm of the sum of coordinate differences to
  the +/-5 same-ring neighbors (`:397-412`)
- per ring, 6 azimuth segments (`:437`); per segment, by curvature: 2 sharp
  corners + 20 less-sharp (curv > 0.1, `:456,472-500`), 4 flat (curv < 0.1,
  `:521-536`), remaining flat-ish points voxel-downsampled 0.2 into
  less-flat (`:560-565`)
- neighbor suppression: picking a feature blocks its +/-5 same-ring
  neighbors (`:476-485`)
- points closer than the removal radius are dropped (`removeClosedPointCloud`,
  `:241,695`)

TPU design: rings are image rows, so curvature is a 1-D convolution along
the row axis (wrapping azimuth), validity is a box-filter of the valid mask,
and neighbor suppression becomes local-max NMS before per-segment top-K.
Everything emits fixed-capacity point buffers + masks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GeometricConfig, SensorConfig
from . import conv2d
from .projection import ScanImage
from .voxel import voxel_downsample


class FeatureClouds(NamedTuple):
    sharp: jax.Array          # (Ns, 3) corner points (strongest)
    sharp_mask: jax.Array     # (Ns,)
    sharp_ring: jax.Array     # (Ns,) int32 ring index
    less_sharp: jax.Array     # (Nl, 3)
    less_sharp_mask: jax.Array
    less_sharp_ring: jax.Array
    flat: jax.Array           # (Nf, 3)
    flat_mask: jax.Array
    flat_ring: jax.Array
    less_flat: jax.Array      # (Nd, 3) downsampled surface points
    less_flat_mask: jax.Array


def _row_conv_sum(x: jax.Array, half: int) -> jax.Array:
    """Sum over a +/-half window along the last axis with wraparound —
    a circulant banded matmul on the MXU (ops.conv2d)."""
    return conv2d.filter_cols(x, np.ones(2 * half + 1, np.float32), "wrap")


def compute_curvature(scan: ScanImage, half: int = 5):
    """Returns (curvature (H, W), window_valid (H, W))."""
    # one batched pass over 4 channels: x, y, z, validity count
    chans = jnp.concatenate(
        [jnp.moveaxis(scan.xyz, -1, 0), scan.valid[None].astype(jnp.float32)]
    )
    sums = _row_conv_sum(chans, half)
    diff = sums[:3] - (2 * half + 1) * jnp.moveaxis(scan.xyz, -1, 0)
    curv = jnp.sum(diff * diff, axis=0)
    # a window is only meaningful if every contributing point is valid
    window_valid = scan.valid & (sums[3] >= (2 * half + 1) - 0.5)
    return curv, window_valid


def _nms_row(score: jax.Array, radius: int) -> jax.Array:
    """True where score is the max of its +/-radius row neighborhood."""
    k = 2 * radius + 1
    sp = jnp.pad(score, ((0, 0), (radius, radius)), mode="wrap")
    pooled = jax.lax.reduce_window(
        sp, -jnp.inf, jax.lax.max, (1, k), (1, 1), "VALID"
    )
    return score >= pooled


def _topk_per_segment(score: jax.Array, eligible: jax.Array,
                      num_segments: int, k_per: int):
    """score (H, W) -> per (ring, segment) top-k flat indices + validity."""
    H, W = score.shape
    seg_w = W // num_segments
    s = jnp.where(eligible, score, -jnp.inf)
    s = s[:, : seg_w * num_segments].reshape(H, num_segments, seg_w)
    val, idx = jax.lax.top_k(s, k_per)                    # (H, S, k)
    col = idx + jnp.arange(num_segments)[None, :, None] * seg_w
    row = jnp.broadcast_to(jnp.arange(H)[:, None, None], col.shape)
    ok = jnp.isfinite(val)
    return (row.reshape(-1), col.reshape(-1), ok.reshape(-1))


@partial(jax.jit, static_argnames=("sensor_cfg", "cfg"))
def extract_features(
    scan: ScanImage, sensor_cfg: SensorConfig, cfg: GeometricConfig
) -> FeatureClouds:
    H, W, _ = scan.xyz.shape
    curv, wvalid = compute_curvature(scan)
    # removal radius (`remove_radius` 0.3, scanRegistration.cpp:695)
    far_enough = scan.range > cfg.min_range
    base_ok = wvalid & far_enough

    # ---- corners: high curvature, locally maximal (declustering stands in
    # for the reference's +/-5 neighbor-picked suppression)
    corner_elig = base_ok & (curv > cfg.curvature_threshold)
    nms = _nms_row(jnp.where(corner_elig, curv, -jnp.inf), 5)
    sharp_r, sharp_c, sharp_ok = _topk_per_segment(
        curv, corner_elig & nms, cfg.num_segments, cfg.sharp_per_segment
    )
    ls_r, ls_c, ls_ok = _topk_per_segment(
        curv, corner_elig, cfg.num_segments, cfg.less_sharp_per_segment
    )

    # ---- flats: lowest curvature (top-k of negated score)
    flat_elig = base_ok & (curv < cfg.curvature_threshold)
    fl_r, fl_c, fl_ok = _topk_per_segment(
        -curv, flat_elig, cfg.num_segments, cfg.flat_per_segment
    )

    def gather(r, c, ok):
        pts = scan.xyz[r, c]
        return pts, ok & scan.valid[r, c], r.astype(jnp.int32)

    sharp, sharp_m, sharp_ring = gather(sharp_r, sharp_c, sharp_ok)
    less_sharp, less_sharp_m, ls_ring = gather(ls_r, ls_c, ls_ok)
    flat, flat_m, flat_ring = gather(fl_r, fl_c, fl_ok)

    # ---- less-flat: every flat-eligible point, voxel-downsampled 0.2
    # (`:560-565`); capacity bounds the buffer
    all_flat_pts = scan.xyz.reshape(-1, 3)
    all_flat_mask = flat_elig.reshape(-1)
    less_flat, less_flat_m = voxel_downsample(
        all_flat_pts, all_flat_mask, cfg.less_flat_voxel, cfg.max_surf_points
    )
    return FeatureClouds(
        sharp, sharp_m, sharp_ring,
        less_sharp, less_sharp_m, ls_ring,
        flat, flat_m, flat_ring,
        less_flat, less_flat_m,
    )
