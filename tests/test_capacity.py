"""Long-run capacity semantics (VERDICT r1 item 3).

The reference is unbounded (deques + iSAM2, `intensity_feature_tracker.h:
242-248`; ikd-Tree box deletion `ikd_Tree.cpp:570-707`).  Our fixed-capacity
stores must degrade deliberately, never silently clobber:

- keyframe store + pose graph: decimate-by-2 compaction when full
- loop-edge table: ring overwrite of the oldest edge
- voxel maps: evict points beyond map_keep_radius when near capacity
"""

import dataclasses
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from intensity_slam_tpu import config
from intensity_slam_tpu.ops import grid_hash
from intensity_slam_tpu.pipeline import loop as loop_mod
from intensity_slam_tpu.pipeline import posegraph
from intensity_slam_tpu.utils import se3
from intensity_slam_tpu.utils.se3 import Pose


def _unit_q():
    return jnp.array([1.0, 0.0, 0.0, 0.0])


def _chain(n, cap=16, loops=()):
    g = posegraph.empty(cap, 8)
    pose = Pose.identity()
    step = Pose(_unit_q(), jnp.array([1.0, 0.0, 0.0]))
    for k in range(n):
        if k > 0:
            pose = se3.compose(pose, step)
        g = posegraph.add_node(g, pose)
    for (i, j) in loops:
        Ti = jax.tree.map(lambda a: a[i], g.poses)
        Tj = jax.tree.map(lambda a: a[j], g.poses)
        rel = se3.compose(se3.inverse(Ti), Tj)
        g = posegraph.add_loop(g, jnp.int32(i), jnp.int32(j), rel,
                               jnp.float32(0.01), config.LoopConfig())
    return g


def _loop_residual(g, e):
    Ti = jax.tree.map(lambda a: a[g.loop_i[e]], g.poses)
    Tj = jax.tree.map(lambda a: a[g.loop_j[e]], g.poses)
    rel_est = se3.compose(se3.inverse(Ti), Tj)
    rel_meas = jax.tree.map(lambda a: a[e], g.loop_rel)
    r = se3.se3_log(se3.compose(se3.inverse(rel_meas), rel_est))
    return float(jnp.linalg.norm(r))


def test_compact_half_preserves_chain_and_loops():
    g = _chain(16, cap=16, loops=[(2, 13), (3, 12)])  # odd + even endpoints
    g2 = posegraph.compact_half(g)
    assert int(g2.num_nodes) == 8
    # surviving poses are the even-indexed originals
    np.testing.assert_allclose(np.asarray(g2.poses.t[:8]),
                               np.asarray(g.poses.t[0:16:2]), atol=1e-6)
    # odometry chain recomposes exactly to the surviving poses
    pose = jax.tree.map(lambda a: a[0], g2.poses)
    for k in range(1, 8):
        pose = se3.compose(pose, jax.tree.map(lambda a: a[k], g2.odo_rel))
        np.testing.assert_allclose(np.asarray(pose.t),
                                   np.asarray(g2.poses.t[k]), atol=1e-5)
    # loop measurements stay exactly consistent (zero residual before and
    # after: the rewiring composes in the dropped odometry steps)
    for e in range(2):
        assert bool(g2.loop_valid[e])
        assert _loop_residual(g2, e) < 1e-5, _loop_residual(g2, e)


def test_loop_table_is_a_ring():
    g = _chain(16, cap=16)
    rel = Pose(_unit_q(), jnp.array([1.0, 0.0, 0.0]))
    L = g.loop_valid.shape[0]  # 8
    for k in range(L + 2):
        g = posegraph.add_loop(g, jnp.int32(k), jnp.int32(k + 4), rel,
                               jnp.float32(0.01), config.LoopConfig())
    assert int(g.num_loops) == L + 2
    # slots 0 and 1 hold the two NEWEST edges (oldest overwritten)
    assert int(g.loop_i[0]) == L
    assert int(g.loop_i[1]) == L + 1
    assert int(g.loop_i[2]) == 2


def _small_cfg(max_kf=8):
    base = config.small_test_config()
    lc = dataclasses.replace(base.loop, max_keyframes=max_kf,
                             keyframe_cloud_size=256,
                             use_scancontext=False, use_bow_loop=False,
                             use_radius_search=False)
    return base.replace(loop=lc)


def test_backend_compacts_at_capacity():
    cfg = _small_cfg(max_kf=8)
    state = loop_mod.init_state(cfg)
    cloud = jax.random.uniform(jax.random.PRNGKey(0), (512, 3),
                               minval=-5, maxval=5)
    mask = jnp.ones(512, bool)
    F = cfg.feature.num_features
    desc = jnp.zeros((F, 8), jnp.uint32)
    dv = jnp.zeros((F,), bool)
    step = jax.jit(lambda st, p, t: loop_mod.backend_step(
        st, cloud, mask, desc, dv, Pose(_unit_q(), p), t, cfg))
    fed = []
    n_compact = 0
    for k in range(20):
        p = jnp.array([float(k), 0.0, 0.0])
        fed.append([float(k), 0.0, 0.0])
        state, out = step(state, p, jnp.float32(0.5 * k))
        if bool(out.compacted):
            n_compact += 1
            fed = fed[0::2]
        fed_now = fed  # after potential decimation, this kf appended below
        assert int(state.num_kf) <= cfg.loop.max_keyframes
        assert int(state.num_kf) == len(fed)
    assert n_compact >= 2, n_compact
    # surviving graph poses match the decimated history exactly (no loop
    # solves ran: poses are the ingested map poses)
    n = int(state.num_kf)
    np.testing.assert_allclose(np.asarray(state.graph.poses.t[:n]),
                               np.asarray(fed, np.float32), atol=1e-5)
    # odometry chain recomposition stays consistent after two compactions
    pose = jax.tree.map(lambda a: a[0], state.graph.poses)
    for k in range(1, n):
        pose = se3.compose(pose, jax.tree.map(lambda a: a[k],
                                              state.graph.odo_rel))
    np.testing.assert_allclose(np.asarray(pose.t), fed[-1], atol=1e-4)


def test_evict_far_frees_capacity_for_reuse():
    CELL = 0.8
    m = grid_hash.empty(1 << 10, 2)
    near = jax.random.uniform(jax.random.PRNGKey(1), (500, 3),
                              minval=-3, maxval=3)
    far = near + 100.0
    m = grid_hash.insert(m, near, jnp.ones(500, bool), CELL)
    m = grid_hash.insert(m, far, jnp.ones(500, bool), CELL)
    n_both = int(m.num_points)
    m2 = grid_hash.evict_far(m, jnp.zeros(3), 10.0)
    assert int(m2.num_points) < n_both
    # near points still queryable
    _, sq, ok = grid_hash.knn(m2, near[:32], CELL, k=1)
    assert bool(ok[:, 0].all())
    # far points gone
    _, _, ok_far = grid_hash.knn(m2, far[:32], CELL, k=1)
    assert not bool(ok_far.any())
    # freed ways are reusable: re-insert into the evicted region
    m3 = grid_hash.insert(m2, far, jnp.ones(500, bool), CELL)
    _, _, ok_re = grid_hash.knn(m3, far[:32], CELL, k=1)
    assert bool(ok_re[:, 0].all())


def test_system_survives_2x_keyframe_capacity():
    from intensity_slam_tpu.io import synthetic
    from intensity_slam_tpu.pipeline.system import SlamSystem

    cfg = _small_cfg(max_kf=8)
    # force a keyframe nearly every frame
    cfg = cfg.replace(odometry=dataclasses.replace(
        cfg.odometry, keyframe_time_interval=0.05,
        keyframe_distance_interval=0.05))
    world = synthetic.corridor_world()
    T = 24
    poses = synthetic.corridor_trajectory(T, speed=0.5, yaw_rate=0.0)
    xyz, inten = jax.jit(lambda q, t: synthetic.render_sequence(
        se3.Pose(q, t), world, cfg.sensor))(poses.q, poses.t)
    sys_ = SlamSystem(cfg)
    for k in range(T):
        sys_.process(xyz[k], inten[k], 0.1 * k)
    # the device decimated the store (and remapped the log's governing-
    # keyframe ids) in-graph; the host mirrors lazily through accessors
    assert sys_.num_keyframes > cfg.loop.max_keyframes // 2
    assert len(sys_.kf_map_pose) == int(sys_.bstate.num_kf)
    assert len(sys_.kf_map_pose) <= cfg.loop.max_keyframes
    # every logged frame's governing keyframe id must be a live slot
    log_kf = np.asarray(sys_.state.log.kf[:T])
    assert (log_kf >= 0).all() and (log_kf < int(sys_.bstate.num_kf)).all()
    traj = sys_.trajectory()
    assert np.isfinite(traj).all()
    assert traj.shape[0] == T


def test_frame_log_wrap_export_is_chronological():
    """Past log_capacity the device ring wraps.  Two guarantees (ADVICE r3
    + VERDICT r3 missing #4): the live-window export must roll the storage
    rotation away (chronological, never silently rotated), and the FULL
    session trajectory must still be exportable — segments spill to the
    host before the ring overwrites them (runtime.spill.LogSpiller)."""
    from intensity_slam_tpu.io import synthetic
    from intensity_slam_tpu.pipeline import fused
    from intensity_slam_tpu.pipeline.system import SlamSystem

    cfg = _small_cfg(max_kf=16).replace(log_capacity=12)
    world = synthetic.corridor_world()
    T = 20  # > log_capacity: wraps by 8
    poses = synthetic.corridor_trajectory(T, speed=0.5, yaw_rate=0.0)
    xyz, inten = jax.jit(lambda q, t: synthetic.render_sequence(
        se3.Pose(q, t), world, cfg.sensor))(poses.q, poses.t)
    sys_ = SlamSystem(cfg)
    for k in range(T):
        sys_.process(xyz[k], inten[k], 0.1 * k)
    # (a) the raw ring window export is rolled chronological
    q, t, n = jax.jit(lambda st: fused.trajectory(st, cfg))(sys_.state)
    win = np.asarray(t)[: int(n)]
    assert win.shape[0] == cfg.log_capacity
    assert (np.diff(win[:, 0]) > -0.05).all(), f"rotated: {win[:, 0]}"
    # (b) the full-session export covers ALL T frames via host spill
    traj = sys_.trajectory()
    assert traj.shape[0] == T
    xs = traj[:, 0]
    assert np.isfinite(traj).all()
    assert (np.diff(xs) > -0.05).all(), f"not chronological: {xs}"
    # spilled head and live tail agree where they overlap with the window
    np.testing.assert_allclose(traj[-win.shape[0]:], win, atol=1e-5)
    assert xs[-1] > xs[0] + 3.0
