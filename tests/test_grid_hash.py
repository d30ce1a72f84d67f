import jax
import jax.numpy as jnp
import numpy as np

from intensity_slam_tpu.ops import grid_hash

CELL = 0.8  # 0.4 m effective resolution (octants)


def _brute_knn(map_pts, queries, k):
    d = np.linalg.norm(
        np.asarray(queries)[:, None, :] - np.asarray(map_pts)[None, :, :], axis=-1
    )
    idx = np.argsort(d, axis=1)[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def test_insert_and_knn_exact():
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (2000, 3), minval=-20, maxval=20)
    m = grid_hash.empty(1 << 14, 4)
    m = grid_hash.insert(m, pts, jnp.ones(2000, bool), CELL)
    assert int(m.num_points) > 1000  # some dedup at 0.4 m resolution expected

    # query near inserted points: the returned neighbors must match brute
    # force over the RETAINED map points (dedup drops some originals)
    retained = np.asarray(m.pts.reshape(-1, 3))[np.asarray(m.valid.reshape(-1))]
    queries = pts[:100] + 0.05
    sel, sq, ok = grid_hash.knn(m, queries, CELL, k=3)
    bd, _ = _brute_knn(retained, queries, 3)
    # first neighbor distance must agree with brute force wherever brute
    # force's neighbor is within one cell (grid-hash is exact inside 1 cell)
    got = np.sqrt(np.asarray(sq[:, 0]))
    want = bd[:, 0]
    close = want < CELL
    np.testing.assert_allclose(got[close], want[close], atol=1e-5)
    assert ok[:, 0].all()


def test_dedup_keeps_nearest_octant_center():
    # two points in the same octant: the one nearer the octant center stays
    m = grid_hash.empty(1 << 10, 2)
    center = jnp.array([[0.2, 0.2, 0.2]])  # octant center of cell 0, oct 0
    near = center + 0.01
    far = center + 0.15
    m = grid_hash.insert(m, jnp.concatenate([far, near]), jnp.ones(2, bool), CELL)
    assert int(m.num_points) == 1
    sel, sq, ok = grid_hash.knn(m, center, CELL, k=1)
    np.testing.assert_allclose(np.asarray(sel[0, 0]), np.asarray(near[0]), atol=1e-6)


def test_insert_idempotent():
    pts = jax.random.uniform(jax.random.PRNGKey(1), (500, 3), minval=-10, maxval=10)
    m = grid_hash.empty(1 << 12, 4)
    m1 = grid_hash.insert(m, pts, jnp.ones(500, bool), CELL)
    m2 = grid_hash.insert(m1, pts, jnp.ones(500, bool), CELL)
    np.testing.assert_array_equal(np.asarray(m1.valid), np.asarray(m2.valid))
    np.testing.assert_allclose(np.asarray(m1.pts), np.asarray(m2.pts))
    assert int(m1.num_points) == int(m2.num_points)


def test_mask_respected():
    pts = jnp.ones((10, 3))
    mask = jnp.zeros(10, bool).at[0].set(True)
    m = grid_hash.empty(1 << 10, 2)
    m = grid_hash.insert(m, pts, mask, CELL)
    assert int(m.num_points) == 1


def test_incremental_inserts_accumulate():
    m = grid_hash.empty(1 << 14, 4)
    key = jax.random.PRNGKey(2)
    total_pts = []
    for i in range(5):
        pts = jax.random.uniform(jax.random.fold_in(key, i), (400, 3),
                                 minval=-30, maxval=30)
        total_pts.append(pts)
        m = grid_hash.insert(m, pts, jnp.ones(400, bool), CELL)
    # query around each batch: neighbors exist
    q = jnp.concatenate(total_pts)[::50]
    _, sq, ok = grid_hash.knn(m, q, CELL, k=1)
    assert bool(ok[:, 0].all())
    assert float(jnp.sqrt(sq[:, 0]).max()) < CELL  # dedup moves pts < 1 cell


def test_knn_empty_map():
    m = grid_hash.empty(1 << 10, 2)
    sel, sq, ok = grid_hash.knn(m, jnp.zeros((4, 3)), CELL, k=5)
    assert not bool(ok.any())


def test_out_of_range_points_dropped():
    m = grid_hash.empty(1 << 10, 2)
    pts = jnp.array([[1e5, 0.0, 0.0], [1.0, 1.0, 1.0]])
    m = grid_hash.insert(m, pts, jnp.ones(2, bool), CELL)
    assert int(m.num_points) == 1


def test_radius_count_matches_brute_force():
    """grid_hash.radius_count vs brute force (ikd-Tree Radius_Search parity,
    `ikd_Tree.cpp:1607-1718`)."""
    key = jax.random.PRNGKey(3)
    pts = jax.random.uniform(key, (1500, 3), minval=-10, maxval=10)
    m = grid_hash.empty(1 << 14, 4)
    m = grid_hash.insert(m, pts, jnp.ones(1500, bool), CELL)
    retained = np.asarray(m.pts.reshape(-1, 3))[np.asarray(m.valid.reshape(-1))]
    queries = pts[:64]
    radius = 0.6  # must be <= CELL for the 27-cell gather to be exact
    got = np.asarray(grid_hash.radius_count(m, queries, CELL, radius))
    d = np.linalg.norm(
        np.asarray(queries)[:, None, :] - retained[None, :, :], axis=-1
    )
    want = np.minimum((d <= radius).sum(axis=1), 32)  # knn k=32 cap
    np.testing.assert_array_equal(got, want)
