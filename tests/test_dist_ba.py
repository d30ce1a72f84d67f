"""Distributed Schur-complement BA: correctness on 1 device and identical
results + real sharding on the 8-device CPU mesh (SURVEY §4.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from intensity_slam_tpu.parallel import dist_ba
from intensity_slam_tpu.utils import se3
from intensity_slam_tpu.utils.se3 import Pose


def _make_problem(key, K=8, L=64, noise=0.01, pose_pert=0.05):
    """Ground-truth poses on a line, random landmarks, exact obs + noise;
    initial estimates perturbed."""
    ks = jax.random.split(key, 6)
    gt_t = jnp.stack([jnp.arange(K) * 1.0, jnp.zeros(K), jnp.zeros(K)], -1)
    gt_q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (K, 1))
    gt_poses = Pose(gt_q, gt_t)
    lms = jax.random.uniform(ks[0], (L, 3), minval=-5, maxval=12)

    # observations: every pose sees every landmark
    op = jnp.repeat(jnp.arange(K), L)
    ol = jnp.tile(jnp.arange(L), K)
    z = se3.quat_rotate(se3.quat_conj(gt_q[op]), lms[ol] - gt_t[op])
    z = z + jax.random.normal(ks[1], z.shape) * noise

    pert = jnp.concatenate([
        jax.random.normal(ks[2], (K, 3)) * pose_pert,
        jax.random.normal(ks[3], (K, 3)) * pose_pert * 4,
    ], axis=-1).at[0].set(0.0)  # pose 0 fixed at truth
    init_poses = Pose(
        se3.quat_normalize(se3.quat_mul(gt_q, se3.so3_exp(pert[:, :3]))),
        gt_t + pert[:, 3:],
    )
    init_lms = lms + jax.random.normal(ks[4], lms.shape) * 0.05
    prob = dist_ba.BAProblem(
        poses=init_poses, landmarks=init_lms,
        obs_pose=op, obs_lm=ol, obs_z=z,
        obs_w=jnp.ones(op.shape[0]),
        fixed_poses=jnp.zeros(K, bool).at[0].set(True),
    )
    return prob, gt_poses, lms


def test_ba_converges_to_truth():
    prob, gt_poses, gt_lms = _make_problem(jax.random.PRNGKey(0), noise=0.0)
    res = dist_ba.ba_solve(prob, gn_iters=8, cg_iters=48)
    assert float(res.final_cost) < float(res.initial_cost) * 1e-4
    t_err = jnp.linalg.norm(res.poses.t - gt_poses.t, axis=-1)
    assert float(t_err.max()) < 1e-2, np.asarray(t_err)
    lm_err = jnp.linalg.norm(res.landmarks - gt_lms, axis=-1)
    assert float(lm_err.max()) < 1e-2


def test_ba_noisy_still_improves():
    prob, gt_poses, _ = _make_problem(jax.random.PRNGKey(1), noise=0.01)
    res = dist_ba.ba_solve(prob, gn_iters=8, cg_iters=48)
    before = float(jnp.linalg.norm(prob.poses.t - gt_poses.t, axis=-1).mean())
    after = float(jnp.linalg.norm(res.poses.t - gt_poses.t, axis=-1).mean())
    assert after < before * 0.3, (before, after)


def test_ba_gauge_fixed_pose_untouched():
    prob, _, _ = _make_problem(jax.random.PRNGKey(2))
    res = dist_ba.ba_solve(prob, gn_iters=4)
    np.testing.assert_allclose(np.asarray(res.poses.t[0]),
                               np.asarray(prob.poses.t[0]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.poses.q[0]),
                               np.asarray(prob.poses.q[0]), atol=1e-7)


def test_ba_masked_observations():
    prob, gt_poses, _ = _make_problem(jax.random.PRNGKey(3), noise=0.0)
    # poison half the measurements but zero their weights
    M = prob.obs_z.shape[0]
    bad = jnp.arange(M) % 2 == 0
    z_bad = jnp.where(bad[:, None], prob.obs_z + 100.0, prob.obs_z)
    prob2 = prob._replace(obs_z=z_bad, obs_w=(~bad).astype(jnp.float32))
    res = dist_ba.ba_solve(prob2, gn_iters=8, cg_iters=48)
    t_err = jnp.linalg.norm(res.poses.t - gt_poses.t, axis=-1)
    assert float(t_err.max()) < 2e-2


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_ba_sharded_matches_single_device():
    prob, _, _ = _make_problem(jax.random.PRNGKey(4), K=8, L=128)
    res_single = dist_ba.ba_solve(prob, gn_iters=4, cg_iters=32)

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("data",))
    prob_sh = dist_ba.shard_problem(prob, mesh)
    # verify observations are really sharded
    assert prob_sh.obs_z.sharding.spec == P("data")
    res_sh = dist_ba.ba_solve(prob_sh, gn_iters=4, cg_iters=32)
    np.testing.assert_allclose(np.asarray(res_sh.poses.t),
                               np.asarray(res_single.poses.t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_sh.landmarks),
                               np.asarray(res_single.landmarks), atol=1e-4)
