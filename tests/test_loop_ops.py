import jax
import jax.numpy as jnp
import numpy as np

from intensity_slam_tpu import config
from intensity_slam_tpu.ops import icp, scancontext
from intensity_slam_tpu.pipeline import posegraph
from intensity_slam_tpu.utils import se3

LCFG = config.LoopConfig()


def _random_cloud(key, n=512, spread=20.0):
    return jax.random.uniform(key, (n, 3), minval=-spread, maxval=spread)


# ---------------------------------------------------------------- ScanContext

def test_scancontext_matches_naive():
    pts = _random_cloud(jax.random.PRNGKey(0), 2000, 40.0)
    mask = jnp.ones(2000, bool)
    desc = scancontext.make_scancontext(pts, mask, LCFG)
    # naive reference implementation
    R, S = LCFG.sc_num_ring, LCFG.sc_num_sector
    # reference semantics (Scancontext.cpp:160-204): cells start at NO_POINT
    # (-1000), take the max height, and only truly empty cells become 0
    naive = np.full((R, S), -1000.0)
    P = np.asarray(pts)
    for p in P:
        rho = np.hypot(p[0], p[1])
        if rho < 1e-3 or rho >= LCFG.sc_max_radius:
            continue
        r = int(rho / LCFG.sc_max_radius * R)
        s = int((np.arctan2(p[1], p[0]) + np.pi) / (2 * np.pi) * S)
        s = min(s, S - 1)
        naive[r, s] = max(naive[r, s], p[2] + LCFG.sc_lidar_height)
    naive[naive == -1000.0] = 0.0
    np.testing.assert_allclose(np.asarray(desc), naive, atol=1e-5)


def test_scancontext_rotation_shift():
    """Rotating the cloud by k sectors shifts the descriptor columns; the
    shift-distance must stay ~0 and recover the yaw."""
    pts = _random_cloud(jax.random.PRNGKey(1), 3000, 40.0)
    mask = jnp.ones(3000, bool)
    yaw = 2 * jnp.pi * 7 / LCFG.sc_num_sector  # exactly 7 sectors
    q = se3.so3_exp(jnp.array([0.0, 0.0, float(yaw)]))
    pts_rot = se3.quat_rotate(q[None, :], pts)
    d0 = scancontext.make_scancontext(pts, mask, LCFG)
    d1 = scancontext.make_scancontext(pts_rot, mask, LCFG)
    dist, shift = scancontext.sc_distance_all_shifts(d0, d1)
    assert float(dist) < 0.05, float(dist)
    got_yaw = float(shift) / LCFG.sc_num_sector * 2 * np.pi
    got_yaw = got_yaw if got_yaw <= np.pi else got_yaw - 2 * np.pi
    assert abs(abs(got_yaw) - float(yaw)) < 0.2 or \
        abs(2 * np.pi - abs(got_yaw) - float(yaw)) < 0.2


def test_detect_loop_finds_revisit():
    K = 64
    keys = jax.random.split(jax.random.PRNGKey(2), K)
    descs, rks = [], []
    for k in range(K):
        pts = _random_cloud(keys[k], 1500, 40.0)
        d = scancontext.make_scancontext(pts, jnp.ones(1500, bool), LCFG)
        descs.append(d)
        rks.append(scancontext.ring_key(d))
    hist_desc = jnp.stack(descs)
    hist_rk = jnp.stack(rks)
    valid = jnp.ones(K, bool)
    # current = near-copy of keyframe 3 (slight noise)
    cur = hist_desc[3] + jax.random.normal(jax.random.PRNGKey(99), hist_desc[3].shape) * 0.01
    li, yaw, dist, found = scancontext.detect_loop(
        cur, scancontext.ring_key(cur), hist_desc, hist_rk, valid,
        jnp.int32(60), LCFG)
    assert bool(found)
    assert int(li) == 3
    # no loop for a fresh random scene
    fresh = scancontext.make_scancontext(
        _random_cloud(jax.random.PRNGKey(100), 1500, 40.0),
        jnp.ones(1500, bool), LCFG)
    _, _, _, found2 = scancontext.detect_loop(
        fresh, scancontext.ring_key(fresh), hist_desc, hist_rk, valid,
        jnp.int32(60), LCFG)
    assert not bool(found2)


def test_detect_loop_excludes_recent():
    K = 64
    pts = _random_cloud(jax.random.PRNGKey(4), 1500, 40.0)
    d = scancontext.make_scancontext(pts, jnp.ones(1500, bool), LCFG)
    hist = jnp.tile(d[None], (K, 1, 1))
    rk = jnp.tile(scancontext.ring_key(d)[None], (K, 1))
    # identical everywhere, but only indices < cur-50 are eligible
    li, _, _, found = scancontext.detect_loop(
        d, scancontext.ring_key(d), hist, rk, jnp.ones(K, bool),
        jnp.int32(55), LCFG)
    assert bool(found)
    assert int(li) < 5


# ----------------------------------------------------------------------- ICP

def test_icp_recovers_transform():
    src = _random_cloud(jax.random.PRNGKey(5), 512, 10.0)
    gt = se3.se3_exp(jnp.array([0.02, -0.03, 0.1, 0.4, -0.2, 0.15]))
    tgt = se3.transform_points(gt, src)
    res = icp.icp_align(src, jnp.ones(512, bool), tgt, jnp.ones(512, bool),
                        se3.Pose.identity(), iters=32)
    err = se3.se3_log(se3.compose(se3.inverse(gt), res.pose))
    assert float(jnp.linalg.norm(err)) < 1e-3
    assert float(res.fitness) < 1e-6
    assert bool(res.converged)


def test_icp_partial_overlap_and_masks():
    src = _random_cloud(jax.random.PRNGKey(6), 400, 8.0)
    gt = se3.se3_exp(jnp.array([0.0, 0.0, 0.05, 0.3, 0.1, 0.0]))
    tgt_full = se3.transform_points(gt, src)
    # target only keeps 300 points + pad garbage with mask
    tgt = jnp.concatenate([tgt_full[:300], jnp.full((100, 3), 1e3)])
    tmask = jnp.arange(400) < 300
    res = icp.icp_align(src, jnp.ones(400, bool), tgt, tmask,
                        se3.Pose.identity(), iters=32, max_corr_dist=5.0)
    err = se3.se3_log(se3.compose(se3.inverse(gt), res.pose))
    assert float(jnp.linalg.norm(err)) < 0.05


def test_icp_fitness_gates_bad_alignment():
    src = _random_cloud(jax.random.PRNGKey(7), 256, 10.0)
    tgt = _random_cloud(jax.random.PRNGKey(8), 256, 10.0)  # unrelated
    res = icp.icp_align(src, jnp.ones(256, bool), tgt, jnp.ones(256, bool),
                        se3.Pose.identity(), iters=16, max_corr_dist=100.0)
    # the acceptance predicate (fitness gate AND coverage gate) must reject
    rejected = (float(res.fitness) > 0.5) or (float(res.inlier_frac) < 0.3)
    assert rejected, (float(res.fitness), float(res.inlier_frac))


# ---------------------------------------------------------------- Pose graph

def _chain_graph(K_cap, n, drift_per_step, loop=None):
    """Build a graph of n nodes along +x with odometry drift; optional loop."""
    g = posegraph.empty(K_cap, 16)
    true_rel = se3.Pose(jnp.array([1.0, 0, 0, 0]), jnp.array([1.0, 0, 0]))
    meas_rel = se3.Pose(true_rel.q, true_rel.t + jnp.asarray(drift_per_step))
    pose = se3.Pose.identity()
    for k in range(n):
        if k > 0:
            pose = se3.compose(pose, meas_rel)
        g = posegraph.add_node(g, pose)
    if loop is not None:
        i, j, rel, fit = loop
        g = posegraph.add_loop(g, jnp.int32(i), jnp.int32(j), rel, jnp.float32(fit),
                               config.LoopConfig())
    return g


def test_posegraph_consistent_without_loops():
    g = _chain_graph(64, 10, [0.0, 0.0, 0.0])
    g2 = posegraph.optimize(g, gn_iters=4, cg_iters=32)
    np.testing.assert_allclose(np.asarray(g2.poses.t[:10]),
                               np.asarray(g.poses.t[:10]), atol=1e-3)


def test_posegraph_loop_removes_drift():
    # odometry measures 1.05 m per step but the truth is 1.0; a perfect loop
    # i=0 -> j=9 with rel = 9 m pulls the chain back
    g = _chain_graph(64, 10, [0.05, 0.0, 0.0],
                     loop=(0, 9, se3.Pose(jnp.array([1.0, 0, 0, 0]),
                                          jnp.array([9.0, 0.0, 0.0])), 1e-4))
    before_end = float(g.poses.t[9, 0])
    g2 = posegraph.optimize(g, gn_iters=8, cg_iters=64)
    after_end = float(g2.poses.t[9, 0])
    assert abs(before_end - 9.45) < 1e-3
    assert abs(after_end - 9.0) < 0.05, f"end {after_end}"
    # intermediate nodes spread the correction smoothly
    mid = float(g2.poses.t[5, 0])
    assert abs(mid - 5.0) < 0.3


def test_posegraph_cauchy_rejects_false_loop():
    """A grossly inconsistent loop edge (10 m off a drift-free chain) must
    leave the graph essentially untouched under the default Cauchy robust
    model (reference: CauchyEstimator(1) on loop factors,
    `intensity_feature_tracker.cpp:356-363`), but corrupts it when the
    robust model is disabled."""
    bad_rel = se3.Pose(jnp.array([1.0, 0, 0, 0]), jnp.array([19.0, 0.0, 0.0]))
    g = _chain_graph(64, 10, [0.0, 0.0, 0.0], loop=(0, 9, bad_rel, 1e-4))
    g_rob = posegraph.optimize(g, gn_iters=8, cg_iters=64)
    end_rob = float(g_rob.poses.t[9, 0])
    assert abs(end_rob - 9.0) < 0.1, f"cauchy failed to reject: end {end_rob}"
    g_quad = posegraph.optimize(g, gn_iters=8, cg_iters=64, loop_cauchy_c=0.0)
    end_quad = float(g_quad.poses.t[9, 0])
    assert abs(end_quad - 9.0) > 3.0, (
        f"expected corruption without robust model, end {end_quad}")


def test_posegraph_cauchy_keeps_true_loop():
    """The drift-removal case must still converge to the loop's answer with
    the default Cauchy model on (IRLS recovers full weight as the residual
    shrinks)."""
    g = _chain_graph(64, 10, [0.05, 0.0, 0.0],
                     loop=(0, 9, se3.Pose(jnp.array([1.0, 0, 0, 0]),
                                          jnp.array([9.0, 0.0, 0.0])), 1e-4))
    g2 = posegraph.optimize(g, gn_iters=8, cg_iters=64)
    assert abs(float(g2.poses.t[9, 0]) - 9.0) < 0.05


def test_posegraph_odo_edges_raw_after_optimize():
    """Regression: odometry measurements must be differenced in the RAW
    odometry frame, and new nodes must start in the CORRECTED frame.

    After a loop closure rewrites the graph poses, appending new keyframes
    must (a) keep the between measurements equal to the raw map-pose
    increments — differencing against an optimized pose would bake the loop
    correction into the edge as fake motion — and (b) initialize the new
    node chained onto the previous node's optimized estimate, so the
    exported trajectory has no drift-frame jump at the last loop closure."""
    drift = [0.05, 0.0, 0.0]
    g = _chain_graph(64, 10, drift,
                     loop=(0, 9, se3.Pose(jnp.array([1.0, 0, 0, 0]),
                                          jnp.array([9.0, 0.0, 0.0])), 1e-4))
    g = posegraph.optimize(g, gn_iters=8, cg_iters=64)
    # continue the trajectory in the raw (drifting) odometry frame
    raw = se3.Pose(jnp.array([1.0, 0, 0, 0]),
                   jnp.array([9 * 1.05, 0.0, 0.0]))
    meas_rel = se3.Pose(jnp.array([1.0, 0, 0, 0]), jnp.array([1.05, 0, 0]))
    for _ in range(3):
        raw = se3.compose(raw, meas_rel)
        g = posegraph.add_node(g, raw)
    # (a) raw-frame measurements: each new edge is exactly the raw increment
    np.testing.assert_allclose(np.asarray(g.odo_rel.t[10:13, 0]),
                               1.05, atol=1e-4)
    # (b) corrected-frame init: node 12 continues from the optimized node 9
    # (~9.0 m), not from the raw 9.45 m
    assert abs(float(g.poses.t[12, 0]) - (9.0 + 3 * 1.05)) < 0.1, (
        float(g.poses.t[12, 0]))


def test_posegraph_bounded_under_gross_inconsistent_loops():
    """Regression (r4 soak post-mortem): several mutually inconsistent
    high-information loop edges whose residuals dwarf the drift envelope
    must never blow the solve up.

    The undamped full GN step overshot on exactly this configuration —
    one step bent chain rotations past pi (where se3_log wraps), the
    iterate teleported hundreds of meters out, and successive solves
    compounded to 1e12 and NaN (reproduced from the 9000-frame soak).
    With the damping-ladder step control the iteration cost is monotone
    non-increasing, so the poses stay bounded no matter how bad the
    edges are."""
    rng = np.random.default_rng(7)
    g = posegraph.empty(64, 16)
    pose = se3.Pose.identity()
    for k in range(48):
        if k > 0:
            # long, curving odometry steps (5-20 m) like the drifted repro
            step = se3.Pose(
                se3.so3_exp(jnp.asarray([0.0, 0.0, rng.uniform(-0.3, 0.3)],
                                        jnp.float32)),
                jnp.asarray([rng.uniform(5.0, 20.0), 0.0, 0.0], jnp.float32))
            pose = se3.compose(pose, step)
        g = posegraph.add_node(g, pose)
    # four near-identity loop measurements between far-apart estimates:
    # 60-90 m residuals, one with near-perfect "fitness" (sqrt_info ~ 77)
    for (i, j, fit) in [(16, 1, 0.18), (19, 3, 0.42), (22, 4, 1.7e-4),
                        (35, 8, 0.3)]:
        rel = se3.Pose(jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                       jnp.asarray([2.0, -0.5, 0.3], jnp.float32))
        g = posegraph.add_loop(g, jnp.int32(i), jnp.int32(j), rel,
                               jnp.float32(fit), config.LoopConfig())
    before = float(jnp.max(jnp.linalg.norm(g.poses.t, axis=-1)))
    out = posegraph.optimize(g, gn_iters=6, cg_iters=64)
    tt = np.asarray(out.poses.t[:48])
    assert np.isfinite(tt).all()
    after = float(np.linalg.norm(tt, axis=-1).max())
    # bounded: the solve may deform the chain toward the loops, but a
    # sane solution lives within ~2x the original extent (the old solver
    # returned 5-10x and then diverged without bound)
    assert after < 2.0 * before, (before, after)
