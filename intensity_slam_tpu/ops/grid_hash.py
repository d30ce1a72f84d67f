"""Device-resident voxel grid-hash map — the ikd-Tree replacement (C17-C19).

The reference maintains its map in an incremental k-d tree
(`src/ikd-Tree/ikd_Tree.{h,cpp}`: lazy deletes, alpha-balance criteria, a
background pthread rebuild with an operation-replay queue, reader/writer
latches, and on-insert box downsampling keeping the point nearest each voxel
center) plus per-frame-rebuilt PCL KdTreeFLANN trees (`laserOdometry.cpp:
793-808`) and nanoflann for ScanContext ring keys.  All of that machinery
exists to make pointer-chasing trees safe under concurrent mutation — a
problem a TPU program simply does not have.

TPU design: a set-associative voxel hash with octant point slots.

- geometry: space is cut into cells of edge `cell_size`; each cell stores at
  most 8 points, one per half-cell octant, keeping the point nearest the
  octant center.  This reproduces the ikd-Tree's box-downsample-on-insert
  semantics (`ikd_Tree.cpp:570-707`) with effective resolution cell_size/2.
- addressing: packed 30-bit voxel coordinate -> murmur-mixed set index into
  `num_sets` sets x `ways` ways.  Lookup compares packed keys across ways.
- insertion is batched and deterministic: scatter-min claims cells and
  octant slots (ties broken by point order), so inserting the same batch
  twice is idempotent and there is no rebalancing, no rebuild thread, no
  latch — the whole structure is a pytree of dense arrays updated inside
  jit.
- queries: k-NN gathers the 3x3x3 neighbor cells (27 x 8 = 216 candidates)
  and top-ks by distance — one gather + one sort, no traversal.

Capacity management: when a set's ways are exhausted (hash collision) or an
octant is taken by a nearer point, the new point is dropped — statistically
<1% at the default load factor, and harmless for scan-to-map residuals
which only need local density.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_COORD_BITS = 10
_COORD_OFF = 1 << (_COORD_BITS - 1)          # 512: coords in [-512, 511] cells
_COORD_MASK = (1 << _COORD_BITS) - 1
EMPTY_KEY = jnp.int32(-1)


class VoxelHashMap(NamedTuple):
    way_keys: jax.Array   # (S, W) int32 packed voxel coords; -1 = empty
    pts: jax.Array        # (S*W + 1, 8, 3) f32 cell-blocked point slots; the
    #                       final cell is a write-off overflow slot so inserts
    #                       never need concatenate/slice copies of the map,
    #                       and kNN gathers whole (8, 3) slabs with no reshape
    valid: jax.Array      # (S*W + 1, 8) bool
    num_points: jax.Array # () int32 (approximate: wins counted per insert)


def empty(num_sets: int, ways: int = 4) -> VoxelHashMap:
    return VoxelHashMap(
        way_keys=jnp.full((num_sets, ways), EMPTY_KEY),
        pts=jnp.zeros((num_sets * ways + 1, 8, 3), jnp.float32),
        valid=jnp.zeros((num_sets * ways + 1, 8), bool),
        num_points=jnp.int32(0),
    )


def _voxel_coord(p: jax.Array, cell_size: float) -> jax.Array:
    return jnp.floor(p / cell_size).astype(jnp.int32)


def _pack(c: jax.Array) -> jax.Array:
    """(..., 3) int32 cell coords -> (...,) int32 packed key (>= 0)."""
    cc = jnp.clip(c + _COORD_OFF, 0, _COORD_MASK)
    return (cc[..., 0] << (2 * _COORD_BITS)) | (cc[..., 1] << _COORD_BITS) | cc[..., 2]


def _mix(k: jax.Array) -> jax.Array:
    """murmur3 finalizer on uint32."""
    h = k.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _set_index(key: jax.Array, num_sets: int) -> jax.Array:
    return (_mix(key) % jnp.uint32(num_sets)).astype(jnp.int32)


def _octant(p: jax.Array, c: jax.Array, cell_size: float) -> jax.Array:
    """Octant slot [0, 8) of point p inside cell c."""
    frac = p / cell_size - c.astype(p.dtype)
    bits = (frac >= 0.5).astype(jnp.int32)
    return (bits[..., 0] << 2) | (bits[..., 1] << 1) | bits[..., 2]


def _octant_center(c: jax.Array, oct_idx: jax.Array, cell_size: float) -> jax.Array:
    bits = jnp.stack(
        [(oct_idx >> 2) & 1, (oct_idx >> 1) & 1, oct_idx & 1], axis=-1
    ).astype(jnp.float32)
    return (c.astype(jnp.float32) + 0.25 + 0.5 * bits) * cell_size


@partial(jax.jit, static_argnames=("cell_size",))
def insert(
    m: VoxelHashMap, pts: jax.Array, mask: jax.Array, cell_size: float
) -> VoxelHashMap:
    """Insert a masked batch of points (N, 3).  Deterministic, idempotent."""
    S, W = m.way_keys.shape
    N = pts.shape[0]
    c = _voxel_coord(pts, cell_size)                 # (N, 3)
    key = _pack(c)                                   # (N,)
    sidx = _set_index(key, S)                        # (N,)
    mask = mask & jnp.all(jnp.abs(c) < _COORD_OFF, axis=-1)

    # --- resolve/claim a way per point: up to W rounds of scatter-min claims
    way_keys = m.way_keys
    way = jnp.full((N,), -1, jnp.int32)
    BIGI = jnp.int32(jnp.iinfo(jnp.int32).max)
    # W claim rounds: round 1 claims, round 2 lets same-key losers match the
    # winner's key, rounds 3..W resolve distinct new keys contending for the
    # same set's remaining ways (a few per batch at our load factors).
    # Fewer rounds would drop those points and break insert idempotency.
    for _ in range(W):
        # match existing ways
        wk = way_keys[sidx]                          # (N, W)
        hit = wk == key[:, None]
        has_hit = jnp.any(hit, axis=-1)
        hit_way = jnp.argmax(hit, axis=-1).astype(jnp.int32)
        way = jnp.where((way < 0) & has_hit & mask, hit_way, way)
        # claim the first empty way of each set for the unresolved points
        unresolved = mask & (way < 0)
        empty_ways = wk == EMPTY_KEY
        has_empty = jnp.any(empty_ways, axis=-1)
        tgt_way = jnp.argmax(empty_ways, axis=-1).astype(jnp.int32)
        wants = unresolved & has_empty
        slot = sidx * W + tgt_way
        # one winner per (set, way): lowest point index
        claim = jnp.full((S * W,), BIGI).at[jnp.where(wants, slot, S * W - 1)].min(
            jnp.where(wants, jnp.arange(N, dtype=jnp.int32), BIGI)
        )
        winner = wants & (claim[slot] == jnp.arange(N, dtype=jnp.int32))
        # winners write their key; losers retry next round (their key may now
        # match the winner's if identical, else they probe the next empty way).
        # Non-winners scatter to a dummy overflow row so they can't race the
        # winner's write.
        wk_flat = jnp.concatenate([way_keys.reshape(-1), jnp.array([EMPTY_KEY])])
        wk_flat = wk_flat.at[jnp.where(winner, slot, S * W)].set(
            jnp.where(winner, key, EMPTY_KEY)
        )
        way_keys = wk_flat[:-1].reshape(S, W)
        way = jnp.where(winner, tgt_way, way)

    placed = mask & (way >= 0)

    # --- octant slot insert: keep the point nearest the octant center
    oct_idx = _octant(pts, c, cell_size)             # (N,)
    centers = _octant_center(c, oct_idx, cell_size)
    d_new = jnp.sum((pts - centers) ** 2, axis=-1)
    cellw = sidx * W + way                           # (N,) cell index
    cellw = jnp.where(placed, cellw, S * W)          # overflow cell
    flat = cellw * 8 + oct_idx                       # (N,) for conflict keys

    # current occupant distance (inf if empty)
    safe_cell = jnp.minimum(cellw, S * W - 1)
    occ_center = m.pts[safe_cell, oct_idx]
    # distance of current occupant to ITS octant center == distance to the
    # same center (same octant)
    was_valid = m.valid[safe_cell, oct_idx]
    d_occ = jnp.where(was_valid,
                      jnp.sum((occ_center - centers) ** 2, axis=-1), jnp.inf)
    # candidate wins if nearer than occupant; among candidates, scatter-min
    d_eff = jnp.where(placed & (d_new < d_occ), d_new, jnp.inf)
    best = jnp.full(((S * W + 1) * 8,), jnp.inf).at[flat].min(d_eff)
    is_winner = placed & jnp.isfinite(d_eff) & (d_eff <= best[flat])
    # break exact ties by point index
    order = jnp.where(is_winner, jnp.arange(N, dtype=jnp.int32), BIGI)
    first = jnp.full(((S * W + 1) * 8,), BIGI).at[flat].min(order)
    is_winner = is_winner & (first[flat] == jnp.arange(N, dtype=jnp.int32))

    # losers write to the dedicated overflow cell — no concatenate/slice
    # copies of the (multi-MB) map arrays
    wcell = jnp.where(is_winner, cellw, S * W)
    new_pts = m.pts.at[wcell, oct_idx].set(pts).at[S * W].set(0.0)
    new_valid = m.valid.at[wcell, oct_idx].set(True).at[S * W].set(False)
    added = jnp.sum(is_winner & ~was_valid).astype(jnp.int32)

    return VoxelHashMap(
        way_keys=way_keys,
        pts=new_pts,
        valid=new_valid,
        num_points=m.num_points + added,
    )


_NEIGH = jnp.stack(
    jnp.meshgrid(jnp.arange(-1, 2), jnp.arange(-1, 2), jnp.arange(-1, 2),
                 indexing="ij"),
    axis=-1,
).reshape(27, 3)
_NEIGH8 = jnp.stack(
    jnp.meshgrid(jnp.arange(2), jnp.arange(2), jnp.arange(2), indexing="ij"),
    axis=-1,
).reshape(8, 3)


@partial(jax.jit, static_argnames=("cell_size", "k", "neighborhood"))
def knn(
    m: VoxelHashMap, queries: jax.Array, cell_size: float, k: int = 5,
    neighborhood: int = 27,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """k nearest map points for each query (Q, 3).

    Returns (pts (Q, k, 3), sq_dists (Q, k), valid (Q, k)).

    neighborhood=27: full 3x3x3 cell block — exact within cell_size.
    neighborhood=8: the 2x2x2 cell block nearest the query — exact within
    cell_size/2, with 3.4x less gather traffic (the dominant cost).  The
    reference's correspondence gates are far tighter than either bound
    (5-NN plane fits gate at 0.2 m, `mapOptimization.cpp:406-414`).
    """
    S, W = m.way_keys.shape
    Q = queries.shape[0]
    if neighborhood == 27:
        c0 = _voxel_coord(queries, cell_size)        # (Q, 3)
        cn = c0[:, None, :] + _NEIGH[None, :, :]     # (Q, 27, 3)
    else:
        assert neighborhood == 8, neighborhood
        base = jnp.floor(queries / cell_size - 0.5).astype(jnp.int32)
        cn = base[:, None, :] + _NEIGH8[None, :, :]  # (Q, 8, 3)
    keys = _pack(cn)                                 # (Q, NB)
    sidx = _set_index(keys, S)                       # (Q, 27)
    NB = cn.shape[1]
    wk = m.way_keys[sidx]                            # (Q, NB, W)
    hit = wk == keys[..., None]                      # (Q, NB, W)
    has = jnp.any(hit, axis=-1)
    wayi = jnp.argmax(hit, axis=-1)                  # (Q, NB)
    cell = sidx * W + wayi                           # (Q, NB)
    # gather whole (8, 3) cell slabs (one gather of Q*NB slabs): per-slot
    # row indexing would issue Q*NB*8 scalar-row gathers and runs ~7x slower
    cand_pts = m.pts[cell].reshape(Q, NB * 8, 3)
    cand_ok = (m.valid[cell] & has[..., None]).reshape(Q, NB * 8)
    d = jnp.sum((cand_pts - queries[:, None, :]) ** 2, axis=-1)
    d = jnp.where(cand_ok, d, jnp.inf)
    neg_d, idx = jax.lax.top_k(-d, k)                # smallest distances
    sel = jnp.take_along_axis(cand_pts, idx[..., None], axis=1)
    sq = -neg_d
    return sel, sq, jnp.isfinite(sq)


@jax.jit
def evict_far(m: VoxelHashMap, center: jax.Array, radius: float | jax.Array
              ) -> VoxelHashMap:
    """Drop every map point farther than `radius` from `center` (3,).

    The TPU counterpart of the reference's rolling-cube map recentering
    (`laserMapping.cpp:330-565`: the 21x21x11 grid of 50 m cubes is shifted
    to keep the sensor centered, discarding cubes that fall off the edge)
    and of ikd-Tree box deletion (`ikd_Tree.cpp:570-707`) — one masked pass,
    no rebuild.  Ways whose cell becomes empty are freed for reuse.
    """
    S, W = m.way_keys.shape
    d2 = jnp.sum((m.pts - center[None, None, :]) ** 2, axis=-1)  # (S*W+1, 8)
    keep = m.valid & (d2 <= jnp.asarray(radius) ** 2)
    removed = jnp.sum(m.valid & ~keep).astype(jnp.int32)
    cell_occupied = jnp.any(keep[: S * W], axis=-1).reshape(S, W)
    return VoxelHashMap(
        way_keys=jnp.where(cell_occupied, m.way_keys, EMPTY_KEY),
        pts=m.pts,
        valid=keep,
        num_points=m.num_points - removed,
    )


@partial(jax.jit, static_argnames=("cell_size",))
def radius_count(
    m: VoxelHashMap, queries: jax.Array, cell_size: float, radius: float
) -> jax.Array:
    """Number of map points within `radius` (<= cell_size) per query."""
    _, sq, ok = knn(m, queries, cell_size, k=32)
    return jnp.sum(ok & (sq <= radius * radius), axis=-1)
