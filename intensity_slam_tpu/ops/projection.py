"""Organized cloud -> intensity/range/xyz image tensors (reference C1).

The reference's `intensity_slam::ImageHandler::cloud_handler`
(`src/image_handler.h_ouster:103-140`) walks a 64x1024 organized Ouster cloud
row by row (OpenMP over rows) producing a `CV_8UC1` intensity image (clamped
at 255), a range image scaled by 20, and a `cloud_track` lookup cloud whose
points are zeroed when range < 0.1.

TPU design: the organized cloud is already a dense (H*W) tensor, so projection
is a pure reshape + elementwise pass that XLA fuses into one VPU sweep — no
scatter needed.  We keep intensity/range in float32 (images feed the feature
detector; u8 quantization would only lose information), keep the xyz lookup as
a (H, W, 3) tensor (the uv->3D lift of C3 is then a gather), and carry an
explicit validity mask instead of the reference's zeroed-point sentinel
(`extractPointsAndFilterZeroValue`, `intensity_feature_tracker.cpp:1071-1099`).

Unorganized input (e.g. KITTI Velodyne) is handled by `project_unorganized`,
which bins points by elevation/azimuth with a scatter — the TPU analogue of
the ring assignment in `src/scanRegistration.cpp:290-325`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SensorConfig


class ScanImage(NamedTuple):
    """Projected scan: all fields (H, W[, C]) fixed-shape device tensors."""

    intensity: jax.Array  # (H, W) float32, clamped to [0, 255]
    range: jax.Array      # (H, W) float32 metres (0 where invalid)
    xyz: jax.Array        # (H, W, 3) float32 (0 where invalid)
    valid: jax.Array      # (H, W) bool


def project_organized(
    xyz: jax.Array, intensity: jax.Array, cfg: SensorConfig
) -> ScanImage:
    """Project an organized row-major cloud to image tensors.

    Args:
      xyz: (H*W, 3) or (H, W, 3) point coordinates, row-major by ring
        (matches the reference's `cloud_track[row*W + col]` layout,
        `intensity_feature_tracker.cpp:1082`).
      intensity: matching (H*W,) or (H, W) per-point intensity.
    """
    H, W = cfg.image_height, cfg.image_width
    xyz = xyz.reshape(H, W, 3)
    inten = intensity.reshape(H, W)
    rng = jnp.linalg.norm(xyz, axis=-1)
    valid = rng >= cfg.min_range  # image_handler.h_ouster:126 zeroes closer points
    xyz = jnp.where(valid[..., None], xyz, 0.0)
    rng = jnp.where(valid, rng, 0.0)
    inten = jnp.clip(jnp.where(valid, inten, 0.0), 0.0, 255.0)
    return ScanImage(inten.astype(jnp.float32), rng.astype(jnp.float32),
                     xyz.astype(jnp.float32), valid)


def detection_mask(cfg: SensorConfig) -> jax.Array:
    """(H, W) bool mask for feature detection.

    Mirrors `feature_tracker::setMask` (`intensity_feature_tracker.cpp:1126-1136`):
    when hand_held, columns j < crop or j > W - crop are excluded (operator
    shadow at the azimuth seam).
    """
    H, W = cfg.image_height, cfg.image_width
    col = jnp.arange(W)
    ok = (col >= cfg.image_crop) & (col <= W - cfg.image_crop)
    if not cfg.hand_held:
        ok = jnp.ones_like(ok)
    return jnp.broadcast_to(ok[None, :], (H, W))


def project_unorganized(
    xyz: jax.Array,
    intensity: jax.Array,
    cfg: SensorConfig,
    fov_up_deg: float | None = None,
    fov_down_deg: float | None = None,
) -> ScanImage:
    """Spherical projection for unorganized clouds (KITTI-style HDL-64).

    Elevation binning replaces the per-ring angle ladders of
    `scanRegistration.cpp:290-325`; collisions resolve to the nearer point
    (scatter-min on range), matching a LiDAR's physical occlusion order.
    `xyz` is (N, 3) padded with zeros; zero-range points are dropped.
    FOV defaults to the sensor config's beam table (ADVICE r4).
    """
    if fov_up_deg is None:
        fov_up_deg = cfg.fov_up
    if fov_down_deg is None:
        fov_down_deg = cfg.fov_down
    H, W = cfg.image_height, cfg.image_width
    rng = jnp.linalg.norm(xyz, axis=-1)
    ok = rng >= cfg.min_range
    elev = jnp.degrees(jnp.arcsin(jnp.where(ok, xyz[:, 2] / jnp.maximum(rng, 1e-6), 0.0)))
    azim = jnp.degrees(jnp.arctan2(xyz[:, 1], xyz[:, 0]))  # [-180, 180)
    row = jnp.clip(
        ((fov_up_deg - elev) / (fov_up_deg - fov_down_deg) * (H - 1)).round().astype(jnp.int32),
        0, H - 1,
    )
    col = jnp.clip(
        (((azim + 180.0) / 360.0) * W).astype(jnp.int32) % W, 0, W - 1
    )
    flat = row * W + col
    flat = jnp.where(ok, flat, H * W)  # invalid -> overflow slot
    # scatter-min on range to keep the nearest point per pixel
    big = jnp.float32(1e9)
    rng_img = jnp.full((H * W + 1,), big).at[flat].min(jnp.where(ok, rng, big))
    # winner-take-all gather: a point owns its pixel iff its range equals the min
    is_winner = ok & (rng <= rng_img[flat] + 1e-6)
    order = jnp.where(is_winner, jnp.arange(xyz.shape[0]), jnp.iinfo(jnp.int32).max)
    owner = jnp.full((H * W + 1,), jnp.iinfo(jnp.int32).max).at[flat].min(order)
    owner = owner[: H * W]
    has_pt = owner < jnp.iinfo(jnp.int32).max
    safe_owner = jnp.where(has_pt, owner, 0)
    xyz_img = jnp.where(has_pt[:, None], xyz[safe_owner], 0.0).reshape(H, W, 3)
    inten_img = jnp.where(has_pt, intensity[safe_owner], 0.0).reshape(H, W)
    rng_out = jnp.where(has_pt, rng[safe_owner], 0.0).reshape(H, W)
    return ScanImage(
        jnp.clip(inten_img, 0.0, 255.0).astype(jnp.float32),
        rng_out.astype(jnp.float32),
        xyz_img.astype(jnp.float32),
        has_pt.reshape(H, W),
    )


def lift_uv_to_3d(scan: ScanImage, uv: jax.Array) -> tuple[jax.Array, jax.Array]:
    """uv (K, 2) int pixel coords -> (K, 3) points + (K,) validity.

    Replaces `extractPointsAndFilterZeroValue`
    (`intensity_feature_tracker.cpp:1071-1099`): the reference drops keypoints
    whose looked-up point is (0,0,0); here validity is an explicit mask.
    """
    r = uv[:, 1]
    c = uv[:, 0]
    pts = scan.xyz[r, c]
    ok = scan.valid[r, c]
    return pts, ok
