"""Batched RANSAC ground-plane extraction (reference C2).

The reference (`src/image_handler.h_ouster:41-100`) prefilters points to a
height band (-2.0 <= z <= -0.45, `:51`), runs PCL SAC-RANSAC
(`SACMODEL_PERPENDICULAR_PLANE`, z-axis prior +/-15 deg, distance threshold
0.01, `:58-67`), then keeps points within 0.03 m of the fitted plane with
z < 0 (`:86`).

TPU design: RANSAC's hypothesis loop is embarrassingly parallel, so instead of
PCL's sequential sampling we draw all K hypotheses at once (mask-weighted index
sampling via cumsum + searchsorted), score all K x N point-plane distances in
one fused broadcast (a few MFLOPs — VPU noise), argmax inlier counts, and
refine with one closed-form least-squares fit (smallest eigenvector of the
inlier covariance).  Everything is fixed-shape; the output is a mask over the
full scan rather than a compacted cloud.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import GroundConfig


class GroundResult(NamedTuple):
    plane: jax.Array        # (4,) [nx, ny, nz, d] with n unit, nz > 0; n.p + d = 0
    ground_mask: jax.Array  # (N,) bool — final keep band (0.03 m, z < 0)
    inlier_count: jax.Array # () int32 — RANSAC inliers of the best hypothesis
    ok: jax.Array           # () bool — enough candidates and a valid plane found


def _sample_valid_indices(key: jax.Array, mask: jax.Array, shape) -> jax.Array:
    """Sample indices uniformly from the True entries of `mask` (with
    replacement).  cumsum + searchsorted keeps it O(N + S log N) instead of a
    full categorical over N categories."""
    cdf = jnp.cumsum(mask.astype(jnp.float32))
    total = cdf[-1]
    u = jax.random.uniform(key, shape) * jnp.maximum(total, 1.0)
    idx = jnp.searchsorted(cdf, u, side="right")
    return jnp.clip(idx, 0, mask.shape[0] - 1)


def _fit_plane_lsq(xyz: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted least-squares plane through points: returns (4,) [n, d].

    Smallest eigenvector of the weighted covariance — the same math PCL's
    coefficient refinement performs.
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    centroid = jnp.sum(xyz * w[:, None], axis=0) / wsum
    centered = (xyz - centroid) * jnp.sqrt(w)[:, None]
    cov = centered.T @ centered / wsum
    _, vecs = jnp.linalg.eigh(cov)
    n = vecs[:, 0]  # smallest eigenvalue -> plane normal
    n = n * jnp.where(n[2] < 0, -1.0, 1.0)
    d = -jnp.dot(n, centroid)
    return jnp.concatenate([n, jnp.array([d], n.dtype)])


def extract_ground(
    key: jax.Array,
    xyz: jax.Array,
    valid: jax.Array,
    cfg: GroundConfig,
) -> GroundResult:
    """Args: xyz (N, 3) flat scan points, valid (N,) bool."""
    N = xyz.shape[0]
    z = xyz[:, 2]
    candidate = valid & (z >= cfg.z_min) & (z <= cfg.z_max)  # height band, :51
    num_candidates = jnp.sum(candidate)

    # --- hypothesis generation: K triples from the candidate set
    K = cfg.ransac_iters
    idx = _sample_valid_indices(key, candidate, (K, 3))
    p0, p1, p2 = xyz[idx[:, 0]], xyz[idx[:, 1]], xyz[idx[:, 2]]
    n = jnp.cross(p1 - p0, p2 - p0)
    n_norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(n_norm, 1e-9)
    n = n * jnp.where(n[:, 2:3] < 0, -1.0, 1.0)  # orient +z
    d = -jnp.sum(n * p0, axis=-1)  # (K,)

    # z-axis prior: angle(n, z) <= eps (SACMODEL_PERPENDICULAR_PLANE, :64-65)
    cos_eps = jnp.cos(jnp.deg2rad(cfg.axis_max_angle_deg))
    axis_ok = n[:, 2] >= cos_eps
    degenerate = n_norm[:, 0] < 1e-9

    # --- score: |x.n + d| < tau over candidates, all K at once
    dist = jnp.abs(xyz @ n.T + d[None, :])  # (N, K)
    inl = (dist < cfg.dist_threshold) & candidate[:, None]
    counts = jnp.where(axis_ok & ~degenerate, jnp.sum(inl, axis=0), -1)
    best = jnp.argmax(counts)
    best_count = counts[best]

    # --- refine on the best hypothesis' inliers (PCL optimizeCoefficients),
    # iterating re-inlier -> refit so a slightly tilted winning hypothesis
    # converges onto the true plane
    raw = jnp.concatenate([n[best], d[best][None]])

    def _refine(plane, tau):
        dist_p = jnp.abs(xyz @ plane[:3] + plane[3])
        w = ((dist_p < tau) & candidate).astype(xyz.dtype)
        new = _fit_plane_lsq(xyz, w)
        ok_axis = new[2] >= cos_eps
        return jnp.where(ok_axis, new, plane), None

    # progressively tighten: the wide first band captures the whole plane
    # extent (so a tilted winning hypothesis can't lock onto a strip), the
    # final band matches the reference's 0.01 threshold
    taus = jnp.array([4.0, 2.0, 1.0], xyz.dtype) * cfg.dist_threshold
    plane, _ = jax.lax.scan(_refine, raw, taus)

    # --- final keep band: within 0.03 m of plane and z < 0 (:86)
    final_dist = jnp.abs(xyz @ plane[:3] + plane[3])
    ground_mask = valid & (final_dist < cfg.keep_threshold) & (z < 0.0)

    ok = (num_candidates >= 16) & (best_count > 0)
    ground_mask = ground_mask & ok
    return GroundResult(plane, ground_mask, best_count.astype(jnp.int32), ok)
