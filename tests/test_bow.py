"""Mutual-match descriptor loop channel (ops.bow, the DBoW3 replacement).

The round-4 redesign scores candidate keyframes by exact mutual Hamming
matching of the strongest descriptors (the histogram LSH it replaced
measured as non-discriminative — see ops/bow.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np

from intensity_slam_tpu import config
from intensity_slam_tpu.ops import bow

LCFG = config.LoopConfig()


def _rand_desc(key, k=256):
    return jax.random.randint(key, (k, 8), 0, 2**31 - 1,
                              dtype=jnp.int32).astype(jnp.uint32)


def test_signature_shape_and_determinism():
    d = _rand_desc(jax.random.PRNGKey(0), 1000)
    v = jnp.ones(1000, bool)
    s1 = bow.signature(d, v)
    s2 = bow.signature(d, v)
    assert s1.shape == (bow.SIG_FEATURES, 9)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    # strongest-first subset: the first SIG_FEATURES descriptors
    np.testing.assert_array_equal(
        np.asarray(s1[:, :8]), np.asarray(d[: bow.SIG_FEATURES]))
    assert bool((s1[:, 8] == 1).all())


def test_signature_pads_short_descriptor_sets():
    d = _rand_desc(jax.random.PRNGKey(1), 64)
    s = bow.signature(d, jnp.ones(64, bool))
    assert s.shape == (bow.SIG_FEATURES, 9)
    assert int(jnp.sum(s[:, 8])) == 64


def test_identical_frames_score_one():
    d = _rand_desc(jax.random.PRNGKey(2))
    sig = bow.signature(d, jnp.ones(256, bool))
    K = 32
    hist = jnp.zeros((K, bow.SIG_FEATURES, 9), jnp.uint32).at[5].set(sig)
    valid = jnp.zeros(K, bool).at[5].set(True)
    idx, score, found = bow.detect_loop(sig, hist, valid, jnp.int32(30),
                                        LCFG)
    assert bool(found) and int(idx) == 5
    assert float(score) > 0.99


def test_random_frames_do_not_fire():
    """Independent random 256-bit descriptors mutually match within 24
    bits with probability ~0 — the detector must stay silent."""
    keys = jax.random.split(jax.random.PRNGKey(3), 33)
    sigs = jnp.stack([
        bow.signature(_rand_desc(k), jnp.ones(256, bool)) for k in keys[:-1]
    ])
    q = bow.signature(_rand_desc(keys[-1]), jnp.ones(256, bool))
    idx, score, found = bow.detect_loop(q, sigs, jnp.ones(32, bool),
                                        jnp.int32(32), LCFG)
    assert not bool(found)
    assert float(score) < LCFG.bow_score_threshold


def test_noisy_revisit_fires():
    """A revisit = same descriptors with a few bits flipped + partial
    overlap; must score above threshold."""
    key = jax.random.PRNGKey(4)
    d = _rand_desc(key)
    # flip ~8 random bits in each descriptor (within the 24-bit budget)
    noise_words = jax.random.randint(key, (256, 8), 0, 2**31 - 1,
                                     dtype=jnp.int32).astype(jnp.uint32)
    few_bits = noise_words & noise_words >> 1 & noise_words >> 2 & jnp.uint32(
        0x11111111)
    d_noisy = jnp.bitwise_xor(d, few_bits)
    # half the features not re-detected
    v_noisy = jnp.arange(256) % 2 == 0
    sig_a = bow.signature(d, jnp.ones(256, bool))
    sig_b = bow.signature(d_noisy, v_noisy)
    K = 64
    hist = jnp.zeros((K, bow.SIG_FEATURES, 9), jnp.uint32).at[3].set(sig_a)
    valid = jnp.zeros(K, bool).at[3].set(True)
    idx, score, found = bow.detect_loop(sig_b, hist, valid, jnp.int32(60),
                                        LCFG)
    assert bool(found) and int(idx) == 3
    assert float(score) > 0.2


def test_detect_loop_gap_exclusion():
    d = _rand_desc(jax.random.PRNGKey(5))
    sig = bow.signature(d, jnp.ones(256, bool))
    K = 64
    hist = jnp.zeros((K, bow.SIG_FEATURES, 9), jnp.uint32).at[5].set(sig)
    valid = jnp.zeros(K, bool).at[5].set(True)
    idx, score, found = bow.detect_loop(
        sig, hist, valid, jnp.int32(5 + LCFG.min_loop_search_gap), LCFG)
    assert not bool(found)
