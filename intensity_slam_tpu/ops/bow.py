"""Appearance loop detection from binary descriptors — the DBoW3
replacement (C8).

The reference's launched loop strategy queries a DBoW3 database of ORB
descriptors (`loop_closure_handler.cpp:94-96,127-188`: top-4 candidates,
excluding the last MIN_LOOP_SEARCH_GAP frames, accept score >
MIN_LOOP_BOW_TH 0.013, then `db_.add`).  DBoW3's hierarchical vocabulary
is a CPU pointer-chasing structure; rounds 1-3 replaced it with a
random-codebook histogram (LSH), which round 4's evaluation battery
measured to be pure noise on this data: true-revisit pair scores 0.741 vs
false 0.724 — zero recall at any usable threshold.

The TPU-native design that DOES work is to skip vocabulary quantization
entirely and score candidate pairs by EXACT mutual descriptor matching —
the computation DBoW exists to approximate, affordable here because the
(S x K*S) Hamming tensor is one fused popcount pass on the VPU:

- signature: the S strongest descriptors of the keyframe (detection is
  top-k by corner response, so the strongest = the most re-detectable),
  with a validity word appended.
- score(cur, hist_k) = fraction of cur's descriptors with a MUTUAL
  nearest neighbor in hist_k at Hamming <= MUT_HAMMING bits.  Mutality +
  the tight bit budget is what separates: one-way sub-64-bit matches
  exist by chance anywhere (measured: 0.89 true vs 0.87 false), mutual
  sub-24-bit matches almost only at true revisits (circuit, 5 noise
  seeds: detector precision 0.94 / recall 0.94 at threshold 0.04).
- the ICP + drift-envelope + chi2 gates downstream kill the residual
  false accepts, as they do for ScanContext.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import LoopConfig

SIG_FEATURES = 256    # strongest descriptors kept per keyframe
MUT_HAMMING = 24      # max bits (of 256) for a mutual match to count
VOCAB_SIZE = SIG_FEATURES  # retained name: historical (histogram era)


@jax.jit
def signature(desc: jax.Array, valid: jax.Array) -> jax.Array:
    """(F, 8) uint32 descriptors + (F,) mask -> (S, 9) uint32 signature:
    the S strongest descriptors (detection order is strength order) with
    their validity packed as a 9th word."""
    F = desc.shape[0]
    S = SIG_FEATURES
    if F >= S:
        d, v = desc[:S], valid[:S]
    else:
        d = jnp.zeros((S, 8), jnp.uint32).at[:F].set(desc)
        v = jnp.zeros((S,), bool).at[:F].set(valid)
    return jnp.concatenate([d, v.astype(jnp.uint32)[:, None]], axis=-1)


def _chunk_scores(cd, cv, hd, hv):
    """cur (S,8)+(S,) vs hist chunk (C,S,8)+(C,S) -> (C,) mutual-match
    fraction."""
    S = cd.shape[0]
    x = jnp.bitwise_xor(cd[None, :, None, :], hd[:, None, :, :])
    h = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
    h = jnp.where(hv[:, None, :], h, 4096)
    h = jnp.where(cv[None, :, None], h, 4096)
    best = jnp.min(h, axis=2)                      # (C, S)
    fwd = jnp.argmin(h, axis=2)
    bwd = jnp.argmin(h, axis=1)                    # (C, S)
    mutual = jnp.take_along_axis(bwd, fwd, axis=1) == jnp.arange(S)[None, :]
    ok = cv[None, :] & (best <= MUT_HAMMING) & mutual
    return jnp.sum(ok, axis=1) / jnp.maximum(jnp.sum(cv), 1)


@partial(jax.jit, static_argnames=("cfg",))
def detect_loop(
    cur_sig: jax.Array,      # (S, 9) uint32
    hist_sig: jax.Array,     # (K, S, 9)
    hist_valid: jax.Array,   # (K,)
    cur_idx: jax.Array,      # ()
    cfg: LoopConfig,
):
    """Returns (loop_idx (), score (), found ()).

    Candidates exclude the most recent `min_loop_search_gap` keyframes
    (`spot.yaml:39`); accept when the best mutual-match fraction exceeds
    `bow_score_threshold`."""
    K, S = hist_sig.shape[0], hist_sig.shape[1]
    cd, cv = cur_sig[:, :8], cur_sig[:, 8] > 0
    hd, hv = hist_sig[:, :, :8], hist_sig[:, :, 8] > 0
    C = min(128, K)   # bound the (C, S, S) Hamming transient to ~33 MB
    if K % C == 0 and K > C:
        hd_c = hd.reshape(K // C, C, S, 8)
        hv_c = hv.reshape(K // C, C, S)
        s = jax.lax.map(
            lambda ch: _chunk_scores(cd, cv, ch[0], ch[1]), (hd_c, hv_c)
        ).reshape(K)
    else:
        s = _chunk_scores(cd, cv, hd, hv)
    eligible = hist_valid & (
        jnp.arange(K) < cur_idx - cfg.min_loop_search_gap
    )
    s = jnp.where(eligible, s, -jnp.inf)
    best = jnp.argmax(s)
    best_score = s[best]
    found = best_score > cfg.bow_score_threshold
    return best.astype(jnp.int32), best_score, found
