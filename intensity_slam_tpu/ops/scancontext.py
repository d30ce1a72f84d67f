"""ScanContext place-recognition descriptor (reference C9).

Replicates `src/Scancontext.cpp` / `include/Scancontext.h`:

- descriptor: polar 20-ring x 60-sector grid of max point height, with a
  +2 m LIDAR_HEIGHT offset and 80 m max radius (`Scancontext.cpp:160-204`,
  params `Scancontext.h:77-95`)
- ring key: row means, used for KNN candidate retrieval over history
  (`:263-296`: nanoflann tree, 10 candidates, excluding 50 most recent)
- distance: best circular column shift, seeded by the sector-key alignment
  and searched +/-10% of the columns; per-shift distance is the mean cosine
  distance between corresponding columns (`:104-157`); accept < 0.13

TPU design: the descriptor is one scatter-max; ring-key retrieval over the
whole keyframe history is one (K, R) distance matrix + top-k; and the
shift search evaluates ALL candidate x shift pairs in a single broadcast
(candidates x shifts x rings x sectors fits easily in VMEM) — the
sector-key seeding exists only to save CPU work and is unnecessary here.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import LoopConfig


@partial(jax.jit, static_argnames=("cfg",))
def make_scancontext(
    pts: jax.Array, mask: jax.Array, cfg: LoopConfig
) -> jax.Array:
    """(N, 3) sensor-frame points -> (R, S) max-height descriptor."""
    R, S = cfg.sc_num_ring, cfg.sc_num_sector
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    rho = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(y, x)  # [-pi, pi)
    ring = jnp.floor(rho / cfg.sc_max_radius * R).astype(jnp.int32)
    sector = jnp.floor((theta + jnp.pi) / (2 * jnp.pi) * S).astype(jnp.int32)
    sector = jnp.clip(sector, 0, S - 1)
    ok = mask & (ring >= 0) & (ring < R) & (rho > 1e-3)
    flat = jnp.where(ok, ring * S + sector, R * S)
    h = jnp.where(ok, z + cfg.sc_lidar_height, -jnp.inf)
    desc = jnp.full((R * S + 1,), -jnp.inf).at[flat].max(h)
    desc = desc[: R * S].reshape(R, S)
    return jnp.where(jnp.isfinite(desc), desc, 0.0)


def ring_key(desc: jax.Array) -> jax.Array:
    """(..., R, S) -> (..., R) row means (`Scancontext.cpp:210-230`)."""
    return jnp.mean(desc, axis=-1)


def sc_distance_all_shifts(a: jax.Array, b: jax.Array) -> jax.Array:
    """Column-shift-minimized cosine distance between two descriptors.

    a, b: (R, S).  Returns (dist (), argmin shift ()).
    Distance at a shift = mean over non-empty column pairs of
    1 - cos(col_a, col_b) (`distDirectSC`, `Scancontext.cpp:104-132`).
    """
    R, S = a.shape
    shifts = jnp.arange(S)
    # all circular shifts of b: (S, R, S)
    idx = (jnp.arange(S)[None, :] + shifts[:, None]) % S
    b_sh = b[:, idx]                    # (R, Sshift, S) -> transpose
    b_sh = jnp.moveaxis(b_sh, 1, 0)     # (S, R, S)
    dot = jnp.einsum("rs,krs->ks", a, b_sh)
    na = jnp.linalg.norm(a, axis=0)     # (S,)
    nb = jnp.linalg.norm(b_sh, axis=1)  # (S, S)
    valid = (na[None, :] > 1e-6) & (nb > 1e-6)
    cos = jnp.where(valid, dot / jnp.maximum(na[None, :] * nb, 1e-9), 0.0)
    per_shift = jnp.where(
        jnp.sum(valid, axis=1) > 0,
        jnp.sum(jnp.where(valid, 1.0 - cos, 0.0), axis=1)
        / jnp.maximum(jnp.sum(valid, axis=1), 1),
        2.0,
    )
    best = jnp.argmin(per_shift)
    return per_shift[best], best


def detect_loop(
    cur_desc: jax.Array,          # (R, S)
    cur_ring_key: jax.Array,      # (R,)
    hist_desc: jax.Array,         # (K, R, S) keyframe descriptor history
    hist_ring_key: jax.Array,     # (K, R)
    hist_valid: jax.Array,        # (K,) bool
    cur_idx: jax.Array,           # () int32 current keyframe index
    cfg: LoopConfig,
):
    """Returns (loop_idx (), yaw (), dist (), found ()).

    Candidate retrieval = ring-key L2 top-k excluding the most recent
    `sc_num_exclude_recent` keyframes; then the full shift-distance on each
    candidate; accept the best under `sc_dist_threshold`
    (`detectLoopClosureID`, `Scancontext.cpp:263-342`).
    """
    K = hist_desc.shape[0]
    S = cur_desc.shape[1]
    eligible = hist_valid & (
        jnp.arange(K) < cur_idx - cfg.sc_num_exclude_recent
    )
    d_rk = jnp.linalg.norm(hist_ring_key - cur_ring_key[None, :], axis=-1)
    d_rk = jnp.where(eligible, d_rk, jnp.inf)
    _, cand = jax.lax.top_k(-d_rk, min(cfg.sc_num_candidates, K))
    cand_ok = jnp.isfinite(d_rk[cand])

    dists, shifts = jax.vmap(
        lambda c: sc_distance_all_shifts(cur_desc, hist_desc[c])
    )(cand)
    dists = jnp.where(cand_ok, dists, jnp.inf)
    best = jnp.argmin(dists)
    best_dist = dists[best]
    found = best_dist < cfg.sc_dist_threshold
    loop_idx = cand[best]
    yaw = shifts[best].astype(jnp.float32) / S * 2.0 * jnp.pi
    # shifts > half a turn wrap negative
    yaw = jnp.where(yaw > jnp.pi, yaw - 2 * jnp.pi, yaw)
    return loop_idx, yaw, best_dist, found
