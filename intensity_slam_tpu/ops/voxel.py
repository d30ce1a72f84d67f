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


def compact(pts: jax.Array, mask: jax.Array, capacity: int, aux=None):
    """Public alias of `_compact`: masked front-compaction WITHOUT voxel
    dedup — the `use_voxel: false` path of the loop-cloud filter
    (`config/spot.yaml:31`; `intensity_feature_tracker.cpp:266-283` only
    voxel-filters when USE_VOXEL_FILTER is set)."""
    return _compact(pts, mask, capacity, aux)


def _compact(pts: jax.Array, mask: jax.Array, capacity: int, aux=None):
    """Pack masked points to the front of a (capacity, 3) buffer.

    Conflict-free scatter (each input writes a unique slot), so it costs one
    cumsum + one scatter — far cheaper than carrying the full padded cloud
    through the dedup sort.  Overflow beyond `capacity` is dropped.
    `aux` (N,) optionally rides along (per-point intensity), returned as a
    third output.
    """
    N = pts.shape[0]
    cum = jnp.cumsum(mask.astype(jnp.int32))
    rank = cum - 1
    out_idx = jnp.where(mask & (rank < capacity), rank, capacity)
    # losers share the single out-of-bounds index `capacity`: drop-mode
    # scatters skip OOB updates outright (no write, no collision
    # serialization), so the scatter materializes only `capacity` rows —
    # measured 0.33 ms -> ~0.05 ms vs the old discard-region scheme that
    # wrote all N losers into a (capacity + N) buffer
    out = jnp.zeros((capacity, 3)).at[out_idx].set(pts, mode="drop")
    have = jnp.arange(capacity) < cum[-1]
    out = jnp.where(have[:, None], out, 0.0)
    if aux is None:
        return out, have
    aout = jnp.zeros((capacity,), aux.dtype).at[out_idx].set(aux, mode="drop")
    return out, have, jnp.where(have, aout, 0)


@partial(jax.jit, static_argnames=("voxel", "capacity", "prefilter"))
def voxel_downsample(
    pts: jax.Array,
    mask: jax.Array,
    voxel: float,
    capacity: int,
    prefilter: int | None = None,
    aux: jax.Array | None = None,
) -> tuple[jax.Array, ...]:
    """Returns (out (capacity, 3), out_mask (capacity,)[, aux_out]).

    Sort-based dedup: points are sorted by (mixed voxel key, distance to
    voxel center) and the first point of each key run wins — exact (no hash
    collisions) and fully vectorized.  A scatter-min table was ~5x slower on
    TPU here: real scans concentrate tens of points per voxel and the
    colliding scatter updates serialize.

    Compaction keeps winners in MIXED-key order: the murmur finalizer is a
    bijection on the key space, so dedup is exact while the kept subset under
    capacity overflow is spatially unbiased (raw-key order would keep a
    spatially contiguous — catastrophically biased — subset).
    """
    if prefilter is not None and prefilter < pts.shape[0]:
        # sparse mask (e.g. ground bands select ~10% of a scan): compact
        # first so the O(N log N) dedup sort runs on the short buffer
        if aux is None:
            pts, mask = _compact(pts, mask, prefilter)
        else:
            pts, mask, aux = _compact(pts, mask, prefilter, aux)
    N = pts.shape[0]
    c = _voxel_coord(pts, voxel)
    key = _mix(_pack(c)).astype(jnp.int32)  # bijective mix, any int32 value
    center = (c.astype(jnp.float32) + 0.5) * voxel
    d = jnp.sum((pts - center) ** 2, axis=-1)
    INVALID = jnp.int32(jnp.iinfo(jnp.int32).max)
    key = jnp.where(mask, key, INVALID)
    sk, _, si = jax.lax.sort(
        (key, d, jnp.arange(N, dtype=jnp.int32)), num_keys=2
    )
    prev = jnp.concatenate([jnp.array([jnp.iinfo(jnp.int32).min], jnp.int32),
                            sk[:-1]])
    winner = (sk != prev) & (sk != INVALID)
    # compaction scatter: the r-th winner writes slot r; losers share the
    # single OOB index `capacity`, which drop-mode scatters skip outright
    # (no write, no collision serialization — unlike in-bounds colliding
    # writes, which serialize on TPU and cost ~0.8 ms; XLA's searchsorted
    # lowers to a 17-step while loop, ~1 ms).
    cum = jnp.cumsum(winner.astype(jnp.int32))
    rank = cum - 1
    out_idx = jnp.where(winner & (rank < capacity), rank, capacity)
    out = jnp.zeros((capacity, 3)).at[out_idx].set(pts[si], mode="drop")
    have = jnp.arange(capacity) < cum[-1]
    out = jnp.where(have[:, None], out, 0.0)
    if aux is None:
        return out, have
    # aux output is the per-VOXEL MEAN, not the winner point's sample:
    # every sorted point scatter-adds into its run's output slot (run id =
    # winner-count prefix at its position).  Averaging ~10-30 points per
    # cell suppresses both sensor speckle and sub-voxel texture sampling
    # offsets — measured on the loop intensity-verification gate, true
    # revisits under 25 % speckle correlate at ~0.06 on winner samples vs
    # ~0.4+ on cell means, while wrong-place pairs stay ~0.
    run = cum - 1                     # run id of each sorted point
    svalid = sk != INVALID
    add_idx = jnp.where(svalid & (run < capacity), run, capacity)
    ssum = jnp.zeros((capacity,), jnp.float32).at[add_idx].add(
        aux[si].astype(jnp.float32), mode="drop")
    scnt = jnp.zeros((capacity,), jnp.float32).at[add_idx].add(
        jnp.where(svalid, 1.0, 0.0), mode="drop")
    aout = (ssum / jnp.maximum(scnt, 1.0)).astype(aux.dtype)
    return out, have, jnp.where(have, aout, 0)
