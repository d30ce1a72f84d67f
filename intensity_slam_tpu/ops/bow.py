"""Bag-of-binary-words image signatures — the DBoW3 replacement (C8).

The reference's launched loop strategy queries a DBoW3 database of ORB
descriptors (`loop_closure_handler.cpp:94-96,127-188`: top-4 candidates,
excluding the last MIN_LOOP_SEARCH_GAP frames, accept score >
MIN_LOOP_BOW_TH 0.013, then `db_.add`).  DBoW3's vocabulary is a
hierarchically-clustered tree walked per descriptor on the CPU — pointer
chasing the TPU replaces with dense similarity:

- vocabulary: a FIXED random codebook of V 256-bit words (deterministic
  seed).  Random codebooks are the standard LSH degeneration of learned
  vocabularies; at V=256 the quantization statistics are comparable for
  matching purposes.
- signature: histogram of nearest-word assignments over the keyframe's
  descriptors, L1-normalized — computed as one (K_feat x V) Hamming matrix
  + argmin + one scatter.
- score: DBoW L1 score s(v, w) = 1 - 0.5 * |v - w|_1 on normalized
  signatures (range [0, 1], higher = more similar), evaluated against the
  WHOLE keyframe history in one (K_hist, V) pass.

Reference quirk recorded, not replicated: `detectLoop` only returns a
candidate when `min_index < 6` (`loop_closure_handler.cpp:179-184`), which
restricts loops to the first six keyframes of the map.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LoopConfig

VOCAB_SIZE = 256


def _make_codebook(seed: int = 7, vocab: int = VOCAB_SIZE) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 1 << 32, size=(vocab, 8), dtype=np.uint64).astype(np.uint32)


_CODEBOOK = jnp.asarray(_make_codebook())  # (V, 8) uint32


@jax.jit
def signature(desc: jax.Array, valid: jax.Array) -> jax.Array:
    """(K, 8) uint32 descriptors + (K,) mask -> (V,) L1-normalized histogram."""
    x = jnp.bitwise_xor(desc[:, None, :], _CODEBOOK[None, :, :])
    d = jnp.sum(jax.lax.population_count(x), axis=-1)      # (K, V)
    word = jnp.argmin(d, axis=-1)                          # (K,)
    w = valid.astype(jnp.float32)
    hist = jnp.zeros((VOCAB_SIZE,), jnp.float32).at[word].add(w)
    return hist / jnp.maximum(jnp.sum(hist), 1e-6)


def l1_score(a: jax.Array, b: jax.Array) -> jax.Array:
    """DBoW L1 similarity: 1 - 0.5 |a - b|_1; broadcasts over leading dims."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(a - b), axis=-1)


@partial(jax.jit, static_argnames=("cfg",))
def detect_loop(
    cur_sig: jax.Array,      # (V,)
    hist_sig: jax.Array,     # (K, V)
    hist_valid: jax.Array,   # (K,)
    cur_idx: jax.Array,      # ()
    cfg: LoopConfig,
):
    """Returns (loop_idx (), score (), found ()).

    Candidates exclude the most recent `min_loop_search_gap` keyframes
    (`spot.yaml:39`); accept when the best score exceeds
    `bow_score_threshold` (our signature scale; the reference's 0.013 is on
    the DBoW raw-score scale, `spot.yaml:38`).
    """
    K = hist_sig.shape[0]
    eligible = hist_valid & (
        jnp.arange(K) < cur_idx - cfg.min_loop_search_gap
    )
    s = l1_score(hist_sig, cur_sig[None, :])
    s = jnp.where(eligible, s, -jnp.inf)
    best = jnp.argmax(s)
    best_score = s[best]
    found = best_score > cfg.bow_score_threshold
    return best.astype(jnp.int32), best_score, found
