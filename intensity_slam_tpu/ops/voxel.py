"""Fixed-capacity voxel downsampling (the PCL VoxelGrid replacement).

The reference voxel-filters clouds before expensive stages: less-flat clouds
at 0.2 m (`scanRegistration.cpp:560-565`), mapping inputs at the line/plane
resolutions (`spot.launch:4-5`), loop clouds at 0.25 m
(`intensity_feature_tracker.cpp:266-283`).  PCL emits variable-length
clouds; here the output is a fixed-capacity (M, 3) buffer + mask so it can
live inside jit.

Selection keeps the point nearest its voxel center (same dedup rule as the
grid-hash map) and compacts winners to the front deterministically.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .grid_hash import _mix, _pack, _voxel_coord


@partial(jax.jit, static_argnames=("voxel", "capacity", "table_size"))
def voxel_downsample(
    pts: jax.Array,
    mask: jax.Array,
    voxel: float,
    capacity: int,
    table_size: int = 1 << 16,
) -> tuple[jax.Array, jax.Array]:
    """Returns (out (capacity, 3), out_mask (capacity,)).

    Hash-table scatter-min: one winner per voxel (nearest voxel center, ties
    by index).  Distinct voxels hashing to the same table slot keep only one
    winner — with table_size >> #occupied voxels the loss is <1%, matching
    the grid-hash map's collision policy.
    """
    N = pts.shape[0]
    c = _voxel_coord(pts, voxel)
    key = _pack(c)
    # full avalanche mix before the modulus: a plain multiplicative hash mod
    # 2^16 would discard every key bit above 16 (x/y live in bits 10-30)
    slot = (_mix(key) % jnp.uint32(table_size)).astype(jnp.int32)
    center = (c.astype(jnp.float32) + 0.5) * voxel
    d = jnp.sum((pts - center) ** 2, axis=-1)
    d = jnp.where(mask, d, jnp.inf)

    best = jnp.full((table_size,), jnp.inf).at[slot].min(d)
    cand = mask & (d <= best[slot]) & jnp.isfinite(d)
    order = jnp.where(cand, jnp.arange(N, dtype=jnp.int32), jnp.iinfo(jnp.int32).max)
    first = jnp.full((table_size,), jnp.iinfo(jnp.int32).max).at[slot].min(order)

    # compact by TABLE-SLOT order, not point order: slots are hash-mixed, so
    # when winners exceed `capacity` the kept subset is spatially unbiased.
    # Point-order compaction would keep only the first image rows of a scan
    # — a catastrophically biased subsample for ICP/loop clouds.
    occupied = first < jnp.iinfo(jnp.int32).max
    rank = jnp.cumsum(occupied) - 1
    out_idx = jnp.where(occupied & (rank < capacity), rank, capacity)
    src_idx = jnp.minimum(first, N - 1)
    out = jnp.zeros((capacity + 1, 3)).at[out_idx].set(pts[src_idx])[:capacity]
    out_mask = jnp.zeros((capacity + 1,), bool).at[out_idx].set(occupied)[:capacity]
    return out, out_mask
