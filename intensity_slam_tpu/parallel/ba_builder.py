"""Build a bundle-adjustment problem from the LIVE keyframe store.

The reference never runs BA (its `mapOptimization.cpp:251` BA residuals are
disabled with `&& false`), but it KEEPS everything BA needs on every
keyframe: descriptor sets and 3-D feature points (`keyframe.h:71-113`).
This module turns that live state (`pipeline.loop.BackendState`) into the
`parallel.dist_ba.BAProblem` the distributed Schur solver consumes — the
BASELINE.json north-star scale-out component.

Track formation, TPU-style (no host loops, no union-find):

1. consecutive keyframe pairs are matched with the same mutual-NN Hamming
   matcher as the front-end (`ops.features.match`) inside one `lax.scan`
   over the keyframe axis (one F x F popcount matrix alive at a time);
2. every (keyframe, feature-slot) gets a ROOT id: its own flat index if the
   slot starts a track, else the id propagated through the match from the
   previous keyframe — after the scan, all observations of one physical
   landmark share the root id of its first observation;
3. roots ARE the landmark indices (L = K*F, sparse); per-root observation
   counts come from one segment-sum, observations of singleton tracks are
   weighted out, and landmark positions initialize to the mean of their
   world-frame observations under the current graph poses.

Everything is fixed-shape and jittable; padding keyframes (slots beyond
`num_kf`) carry zero weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..ops import features as feat_ops
from ..pipeline.loop import BackendState
from ..utils import se3
from .dist_ba import BAProblem


def build_problem(
    state: BackendState,
    cfg: SlamConfig,
) -> BAProblem:
    """BAProblem from the live keyframe store (fixed shapes: M = K*F
    observations, L = K*F landmark slots, most weighted out)."""
    pc, fc = cfg.parallel, cfg.feature
    K, F = state.kf_feat_valid.shape
    # feature payloads live at PHYSICAL slots in the live state; index
    # through kf_slot to get logical keyframe order (identity after
    # logical_view / shard_backend_state)
    sl = state.kf_slot
    desc, xyz = state.kf_feat_desc[sl], state.kf_feat_xyz[sl]
    kf_live = jnp.arange(K) < state.num_kf
    valid = state.kf_feat_valid[sl] & kf_live[:, None]

    # --- root-id propagation over consecutive matches (one scan)
    def step(carry, inp):
        prev_desc, prev_valid, prev_ids, k = carry
        d, v = inp
        m = feat_ops.match(
            d, v, prev_desc, prev_valid, pc.ba_keep_frac, fc.max_hamming
        )
        own = k * F + jnp.arange(F, dtype=jnp.int32)
        ids = jnp.where(m.valid, prev_ids[m.dst_idx], own)
        return (d, v, ids, k + 1), ids

    ids0 = jnp.arange(F, dtype=jnp.int32)
    _, ids_rest = jax.lax.scan(
        step,
        (desc[0], valid[0], ids0, jnp.int32(1)),
        (desc[1:], valid[1:]),
    )
    obs_lm = jnp.concatenate([ids0[None], ids_rest], axis=0)    # (K, F)

    # --- observation weights: valid slots on tracks seen >= 2 times
    w_slot = valid.reshape(-1).astype(jnp.float32)               # (K*F,)
    lm_flat = obs_lm.reshape(-1)
    count = jax.ops.segment_sum(w_slot, lm_flat, num_segments=K * F)
    obs_w = w_slot * (count[lm_flat] >= 2.0)

    # --- landmark init: mean world-frame observation under graph poses
    world = jax.vmap(se3.transform_points)(state.graph.poses, xyz)
    wsum = jax.ops.segment_sum(
        w_slot[:, None] * world.reshape(-1, 3), lm_flat, num_segments=K * F
    )
    landmarks = wsum / jnp.maximum(count, 1.0)[:, None]

    idx = jnp.arange(K)
    fixed = (idx == 0) | (idx >= state.num_kf)
    return BAProblem(
        poses=state.graph.poses,
        landmarks=landmarks,
        obs_pose=jnp.repeat(jnp.arange(K, dtype=jnp.int32), F),
        obs_lm=lm_flat,
        obs_z=xyz.reshape(-1, 3),
        obs_w=obs_w,
        fixed_poses=fixed,
    )


def track_stats(prob: BAProblem) -> dict:
    """Host-side diagnostics: observation / track counts (for tests, logs)."""
    L = prob.landmarks.shape[0]
    cnt = jax.ops.segment_sum(prob.obs_w, prob.obs_lm, num_segments=L)
    n_lm = int(jnp.sum(cnt >= 2.0))
    return {
        "num_obs": int(jnp.sum(prob.obs_w > 0)),
        "num_landmarks": n_lm,
        "max_track_len": int(cnt.max()),
    }
