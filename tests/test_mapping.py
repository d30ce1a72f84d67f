import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intensity_slam_tpu import config
from intensity_slam_tpu.io import synthetic
from intensity_slam_tpu.ops import voxel
from intensity_slam_tpu.pipeline import mapping, odometry, slam
from intensity_slam_tpu.utils import se3


def test_voxel_downsample_basic():
    pts = jnp.array([
        [0.1, 0.1, 0.1], [0.15, 0.12, 0.11],   # same 0.5-voxel
        [3.0, 3.0, 3.0],
        [10.0, -5.0, 2.0],
    ])
    out, m = voxel.voxel_downsample(pts, jnp.ones(4, bool), 0.5, 8)
    assert int(m.sum()) == 3
    # dedup keeps the point nearest the voxel center (0.25,0.25,0.25)
    kept = np.asarray(out[m])
    assert any(np.allclose(k, [0.15, 0.12, 0.11]) for k in kept)


def test_voxel_downsample_capacity():
    pts = jax.random.uniform(jax.random.PRNGKey(0), (1000, 3), minval=-50, maxval=50)
    out, m = voxel.voxel_downsample(pts, jnp.ones(1000, bool), 0.1, 64)
    assert int(m.sum()) == 64  # capacity-limited


def test_plane_fit():
    # 5 points on plane z = 2 (n=[0,0,1], d=-2 in n.x+d=0 form... reference
    # form solves X n = -1 => n=[0,0,-1/2], d=1/|n|=2, unit n=[0,0,-1])
    neigh = jnp.array([[[0., 0, 2], [1, 0, 2], [0, 1, 2], [1, 1, 2], [.5, .5, 2]]])
    n, d, ok = mapping._fit_planes(neigh, jnp.ones((1, 5), bool), 0.2)
    assert bool(ok[0])
    # n.x + d = 0 for points on the plane
    resid = float(jnp.abs(jnp.dot(n[0], jnp.array([0.3, 0.7, 2.0])) + d[0]))
    assert resid < 1e-4


def test_plane_fit_rejects_nonplanar():
    neigh = jax.random.uniform(jax.random.PRNGKey(1), (4, 5, 3), minval=-1, maxval=1)
    n, d, ok = mapping._fit_planes(neigh, jnp.ones((4, 5), bool), 0.05)
    # random blobs are not planes at 5 cm tolerance (overwhelmingly)
    assert int(ok.sum()) <= 1


def test_mapping_corrects_z_drift():
    """Inject vertical drift into odometry; ground-plane scan-to-map must
    pull z back (the residual core constrains z/roll/pitch)."""
    cfg = config.SlamConfig()
    world = synthetic.corridor_world()
    frames = 8
    poses = synthetic.corridor_trajectory(frames, speed=0.3)
    xyz, inten = synthetic.render_sequence(poses, world, cfg.sensor)

    from intensity_slam_tpu.ops import ground, projection
    state = mapping.init_state(cfg)
    key = jax.random.PRNGKey(0)
    step = jax.jit(lambda s, g, gm, od: mapping.mapping_step(
        s, g, gm, jnp.zeros((8, 3)), jnp.zeros(8, bool), od, cfg))
    p0 = se3.Pose(poses.q[0], poses.t[0])
    zs = []
    for k in range(frames):
        scan = projection.project_organized(xyz[k], inten[k], cfg.sensor)
        key, sub = jax.random.split(key)
        gres = ground.extract_ground(sub, xyz[k], scan.valid.reshape(-1), cfg.ground)
        # odometry with fake z drift: 4 cm per frame
        rel = se3.compose(se3.inverse(p0), se3.Pose(poses.q[k], poses.t[k]))
        drifty = se3.Pose(rel.q, rel.t + jnp.array([0.0, 0.0, -0.04 * k]))
        state, out = step(state, xyz[k], gres.ground_mask, drifty)
        zs.append(float(out.pose.t[2]))
    # true z stays 0 (relative); drifted odometry says -0.28 by frame 7
    assert abs(zs[-1]) < 0.05, f"z not corrected: {zs}"


@pytest.mark.slow
def test_full_slam_ate_beats_pure_odometry():
    cfg = config.SlamConfig()
    world = synthetic.corridor_world()
    frames = 12
    poses = synthetic.corridor_trajectory(frames, speed=0.35, yaw_rate=0.01)
    xyz, inten = synthetic.render_sequence(poses, world, cfg.sensor)
    times = jnp.arange(frames, dtype=jnp.float32) * 0.1
    p0 = se3.Pose(poses.q[0], poses.t[0])
    gt_rel = jax.vmap(
        lambda q, t: se3.compose(se3.inverse(p0), se3.Pose(q, t)).t
    )(poses.q, poses.t)

    slam_outs = slam.run_sequence(xyz, inten, times, cfg)
    ate_slam = float(odometry.ate_rmse(slam_outs.pose.t, gt_rel))
    # z error specifically must be tiny (ground plane constraint)
    z_err = float(jnp.abs(slam_outs.pose.t[:, 2] - gt_rel[:, 2]).max())
    assert z_err < 0.06, f"z err {z_err}"
    assert ate_slam < 0.12, f"slam ATE {ate_slam}"


def _fake_features(cfg, pts, key):
    from intensity_slam_tpu.ops import features as feat_ops

    F = cfg.feature.num_features
    desc = jax.random.bits(key, (F, 8), jnp.uint32)
    return feat_ops.Features(
        uv=jnp.zeros((F, 2), jnp.int32), score=jnp.ones(F),
        angle=jnp.zeros(F), desc=desc, valid=jnp.ones(F, bool),
        xyz=pts, xyz_valid=jnp.ones(F, bool),
    )


def test_sliding_window_ba_pulls_pose_to_visual_matches():
    """With an empty ground map, sliding-window point-to-point residuals
    (`mapOptimization.cpp:295-361`) must dominate the odometry prior and
    recover the window frame's pose for identical feature observations."""
    import dataclasses

    cfg = config.small_test_config()
    cfg = cfg.replace(mapping=dataclasses.replace(
        cfg.mapping, sliding_window_size=2, window_min_matches=16,
        window_min_good=8, window_keep_frac=1.0, window_dist_gate=0.5,
    ))
    F = cfg.feature.num_features
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (F, 3),
                             minval=-5, maxval=5)
    feats = _fake_features(cfg, pts, key)

    st = mapping.init_state(cfg)
    st = st._replace(
        win_desc=st.win_desc.at[0].set(feats.desc),
        win_xyz=st.win_xyz.at[0].set(pts),
        win_valid=st.win_valid.at[0].set(jnp.ones(F, bool)),
        win_count=jnp.int32(1),
        initialized=jnp.asarray(True),
    )
    # true pose = identity (same sensor-frame observations as window frame 0
    # taken at identity); odometry claims a 0.19 m offset
    odom = se3.Pose(jnp.array([1.0, 0, 0, 0]),
                    jnp.array([0.15, 0.10, 0.05]))
    N = 64
    st2, out = jax.jit(lambda s, od: mapping.mapping_step(
        s, jnp.zeros((N, 3)), jnp.zeros(N, bool),
        jnp.zeros((8, 3)), jnp.zeros(8, bool), od, cfg, features=feats
    ))(st, odom)
    assert int(out.num_window_residuals) >= F - 4
    err = float(jnp.linalg.norm(out.pose.t))
    assert err < 0.03, f"visual BA left {err} m of the 0.19 m offset"
    # ring update: this frame entered slot frame_idx % W
    assert int(st2.win_count) == 2
    assert bool(st2.win_valid[0].all())


def test_sliding_window_gates_reject_weak_frames():
    """Below window_min_matches the window frame contributes nothing and the
    pose stays at the prior (`:308` gate)."""
    import dataclasses

    cfg = config.small_test_config()
    cfg = cfg.replace(mapping=dataclasses.replace(
        cfg.mapping, sliding_window_size=1, window_min_matches=10_000,
    ))
    F = cfg.feature.num_features
    pts = jax.random.uniform(jax.random.PRNGKey(1), (F, 3),
                             minval=-5, maxval=5)
    feats = _fake_features(cfg, pts, jax.random.PRNGKey(0))
    st = mapping.init_state(cfg)
    st = st._replace(
        win_desc=st.win_desc.at[0].set(feats.desc),
        win_xyz=st.win_xyz.at[0].set(pts),
        win_valid=st.win_valid.at[0].set(jnp.ones(F, bool)),
        win_count=jnp.int32(1),
        initialized=jnp.asarray(True),
    )
    odom = se3.Pose(jnp.array([1.0, 0, 0, 0]), jnp.array([0.15, 0.10, 0.05]))
    N = 64
    _, out = jax.jit(lambda s, od: mapping.mapping_step(
        s, jnp.zeros((N, 3)), jnp.zeros(N, bool),
        jnp.zeros((8, 3)), jnp.zeros(8, bool), od, cfg, features=feats
    ))(st, odom)
    assert int(out.num_window_residuals) == 0
    np.testing.assert_allclose(np.asarray(out.pose.t), np.asarray(odom.t),
                               atol=1e-5)


def test_full_slam_with_sliding_window_enabled():
    """Corridor replay with the sliding-window visual BA active: window
    residuals must actually fire and the trajectory stays accurate."""
    import dataclasses

    cfg = config.small_test_config()
    cfg = cfg.replace(mapping=dataclasses.replace(
        cfg.mapping, sliding_window_size=2, window_min_matches=10,
        window_min_good=6, window_keep_frac=0.5,
    ))
    world = synthetic.corridor_world()
    frames = 8
    poses = synthetic.corridor_trajectory(frames, speed=0.3)
    xyz, inten = jax.jit(lambda q, t: synthetic.render_sequence(
        se3.Pose(q, t), world, cfg.sensor))(poses.q, poses.t)
    times = jnp.arange(frames, dtype=jnp.float32) * 0.1
    outs = slam.run_sequence(xyz, inten, times, cfg)
    assert int(np.asarray(outs.num_window_residuals)[2:].max()) > 0, (
        "sliding-window BA never engaged")
    p0 = se3.Pose(poses.q[0], poses.t[0])
    gt = jax.vmap(
        lambda q, t: se3.compose(se3.inverse(p0), se3.Pose(q, t)).t
    )(poses.q, poses.t)
    ate = float(odometry.ate_rmse(outs.pose.t, gt))
    assert ate < 0.15, f"ATE with window BA {ate}"
