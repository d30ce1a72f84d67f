"""Fused brute-force nearest-neighbor Pallas kernel (TPU).

Replaces the dense (P, M) squared-distance matrix + argmin that ICP
(`ops/icp.py`, reference C10: PCL ICP in `intensity_feature_tracker.cpp:
216-316`) runs every iteration: for 2k x 2k keyframe clouds XLA materializes
a 16 MB f32 matrix per iteration, 33 times per alignment.  This kernel tiles
the target cloud through VMEM, computes each distance block as
|s|^2 + |t|^2 - 2 s.t (the cross term on the MXU) and folds a running
(min-distance, argmin-index) pair — the full matrix never exists.

Falls back to Pallas interpreter mode off-TPU so the CPU test mesh runs the
same code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SRC_TILE = 256
_TGT_TILE = 1024
_BIG = 1e30  # python float: jnp scalars would be captured consts in-kernel


def _nn_kernel(src_ref, tgt_ref, tmask_ref, dist_ref, idx_ref):
    """One src tile vs the whole target: fold running argmin over tgt tiles.

    src_ref:   (Ts, 8)  f32 (xyz padded to 8 lanes-of-sublane alignment)
    tgt_ref:   (M, 8)   f32
    tmask_ref: (1, M)   f32 (1 = valid, 0 = masked; padded cols are 0)
    dist_ref:  (1, Ts)  f32 out (2-D so the tile layout matches XLA's)
    idx_ref:   (1, Ts)  i32 out
    """
    M = tgt_ref.shape[0]
    Ts = src_ref.shape[0]
    src = src_ref[:]                                      # (Ts, 8)
    num_tiles = M // _TGT_TILE

    def body(tile, carry):
        best_d, best_i = carry
        off = tile * _TGT_TILE
        tgt = tgt_ref[pl.ds(off, _TGT_TILE), :]            # (Tm, 8)
        tm = tmask_ref[0, pl.ds(off, _TGT_TILE)]           # (Tm,)
        # exact per-coordinate squared differences on the VPU.  The matmul
        # form |s|^2+|t|^2-2 s.t would engage the MXU, but TPU matmuls run
        # bf16 inputs by default — enough cancellation error to flip argmins
        # — and a K=3 contraction wastes the systolic array anyway.
        tx = tgt[:, 0][None, :]
        ty = tgt[:, 1][None, :]
        tz = tgt[:, 2][None, :]
        d = ((src[:, 0:1] - tx) ** 2 + (src[:, 1:2] - ty) ** 2
             + (src[:, 2:3] - tz) ** 2)                    # (Ts, Tm)
        d = jnp.where(tm[None, :] > 0.5, d, _BIG)
        tile_min = jnp.min(d, axis=1)                      # (Ts,)
        tile_arg = jnp.argmin(d, axis=1).astype(jnp.int32) + off
        take = tile_min < best_d
        return (jnp.where(take, tile_min, best_d),
                jnp.where(take, tile_arg, best_i))

    init = (jnp.full((Ts,), _BIG), jnp.zeros((Ts,), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, num_tiles, body, init)
    row = pl.program_id(0)
    dist_ref[row, :] = jnp.maximum(best_d, 0.0)  # clamp fp cancellation
    idx_ref[row, :] = best_i


def _pad_rows(x: jax.Array, mult: int, fill: float = 0.0) -> jax.Array:
    n = x.shape[0]
    pad = (-n) % mult
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_neighbor(
    src: jax.Array,        # (P, 3) f32 query points
    tgt: jax.Array,        # (M, 3) f32 target points
    tgt_mask: jax.Array,   # (M,) bool
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """For each src point: (index of nearest valid tgt point, squared dist).

    Returns (idx (P,) int32, sqdist (P,) f32); sqdist is +big where no valid
    target exists.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    P = src.shape[0]
    src_p = _pad_rows(src, _SRC_TILE)
    tgt_p = _pad_rows(tgt, _TGT_TILE)
    mask_p = _pad_rows(tgt_mask.astype(jnp.float32), _TGT_TILE)
    Pp, M = src_p.shape[0], tgt_p.shape[0]
    # pad xyz to 8 lanes so the MXU contraction is tile-aligned
    src8 = jnp.pad(src_p, ((0, 0), (0, 5)))
    tgt8 = jnp.pad(tgt_p, ((0, 0), (0, 5)))

    dist, idx = pl.pallas_call(
        _nn_kernel,
        grid=(Pp // _SRC_TILE,),
        in_specs=[
            pl.BlockSpec((_SRC_TILE, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # whole output resident per program (few KB); each program writes
            # its own row — a (1, Ts) block would violate the (8, 128) tile
            pl.BlockSpec((Pp // _SRC_TILE, _SRC_TILE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Pp // _SRC_TILE, _SRC_TILE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Pp // _SRC_TILE, _SRC_TILE), jnp.float32),
            jax.ShapeDtypeStruct((Pp // _SRC_TILE, _SRC_TILE), jnp.int32),
        ],
        interpret=interpret,
    )(src8, tgt8, mask_p.reshape(1, M))
    return idx.reshape(Pp)[:P], dist.reshape(Pp)[:P]
