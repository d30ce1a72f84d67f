"""Fused Pallas nearest-neighbor kernel vs brute force (interpret on CPU)."""

import jax.numpy as jnp
import numpy as np

from intensity_slam_tpu.ops import pallas_nn


def _ref(src, tgt, mask):
    d = jnp.sum((src[:, None, :] - tgt[None, :, :]) ** 2, -1)
    d = jnp.where(mask[None, :], d, jnp.inf)
    return np.asarray(jnp.argmin(d, 1)), np.asarray(jnp.min(d, 1))


def test_matches_bruteforce_multi_tile():
    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.randn(600, 3).astype(np.float32) * 5)
    tgt = jnp.asarray(rng.randn(2048, 3).astype(np.float32) * 5)
    mask = jnp.asarray(rng.rand(2048) < 0.9)
    idx, d = pallas_nn.nearest_neighbor(src, tgt, mask)
    jr, dr = _ref(src, tgt, mask)
    np.testing.assert_array_equal(np.asarray(idx), jr)
    np.testing.assert_allclose(np.asarray(d), dr, rtol=1e-6)


def test_unpadded_sizes_and_full_mask():
    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.randn(37, 3).astype(np.float32))
    tgt = jnp.asarray(rng.randn(513, 3).astype(np.float32))
    mask = jnp.ones(513, bool)
    idx, d = pallas_nn.nearest_neighbor(src, tgt, mask)
    jr, dr = _ref(src, tgt, mask)
    np.testing.assert_array_equal(np.asarray(idx), jr)
    np.testing.assert_allclose(np.asarray(d), dr, rtol=1e-6)


def test_all_masked_targets():
    src = jnp.zeros((8, 3))
    tgt = jnp.zeros((16, 3))
    mask = jnp.zeros(16, bool)
    _, d = pallas_nn.nearest_neighbor(src, tgt, mask)
    assert bool((np.asarray(d) >= 1e29).all())
