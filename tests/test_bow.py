import jax
import jax.numpy as jnp
import numpy as np

from intensity_slam_tpu import config
from intensity_slam_tpu.ops import bow

LCFG = config.LoopConfig()


def _rand_desc(key, k=256):
    return jax.random.randint(key, (k, 8), 0, 2**31 - 1,
                              dtype=jnp.int32).astype(jnp.uint32)


def test_signature_normalized_and_deterministic():
    d = _rand_desc(jax.random.PRNGKey(0))
    v = jnp.ones(256, bool)
    s1 = bow.signature(d, v)
    s2 = bow.signature(d, v)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))
    assert abs(float(s1.sum()) - 1.0) < 1e-5


def test_identical_frames_score_one():
    d = _rand_desc(jax.random.PRNGKey(1))
    s = bow.signature(d, jnp.ones(256, bool))
    assert abs(float(bow.l1_score(s, s)) - 1.0) < 1e-6


def test_masked_descriptors_ignored():
    d = _rand_desc(jax.random.PRNGKey(2))
    full = bow.signature(d, jnp.ones(256, bool))
    # poison second half, mask it out
    d2 = d.at[128:].set(0)
    half = bow.signature(d2, jnp.arange(256) < 128)
    ref = bow.signature(d, jnp.arange(256) < 128)
    np.testing.assert_allclose(np.asarray(half), np.asarray(ref))


def test_detect_loop_gap_and_threshold():
    K = 64
    sigs = jax.vmap(lambda k: bow.signature(_rand_desc(k), jnp.ones(256, bool)))(
        jax.random.split(jax.random.PRNGKey(3), K))
    valid = jnp.ones(K, bool)
    # make keyframe 5 identical to the query
    q = sigs[5]
    idx, score, found = bow.detect_loop(q, sigs, valid, jnp.int32(40), LCFG)
    assert bool(found) and int(idx) == 5 and float(score) > 0.99
    # recency exclusion: same query, but 5 is within the gap
    idx2, score2, found2 = bow.detect_loop(
        q, sigs, valid, jnp.int32(5 + LCFG.min_loop_search_gap), LCFG)
    assert int(idx2) != 5 or not bool(found2)
