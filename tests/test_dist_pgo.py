import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from intensity_slam_tpu import config
from intensity_slam_tpu.parallel import dist_pgo
from intensity_slam_tpu.pipeline import posegraph
from intensity_slam_tpu.utils import se3


def _drifted_loop_graph(K_cap=64, n=32):
    g = posegraph.empty(K_cap, 16)
    meas = se3.Pose(jnp.array([1.0, 0, 0, 0]), jnp.array([1.02, 0.005, 0]))
    pose = se3.Pose.identity()
    for k in range(n):
        if k > 0:
            pose = se3.compose(pose, meas)
        g = posegraph.add_node(g, pose)
    g = posegraph.add_loop(
        g, jnp.int32(0), jnp.int32(n - 1),
        se3.Pose(jnp.array([1.0, 0, 0, 0]), jnp.array([float(n - 1), 0, 0])),
        jnp.float32(1e-4), config.LoopConfig())
    return g


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_sharded_pgo_matches_single():
    g = _drifted_loop_graph()
    ref = posegraph.optimize(g, gn_iters=6, cg_iters=64)

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("data",))
    g_sh = dist_pgo.shard_graph(g, mesh)
    assert g_sh.poses.t.sharding.spec == P("data")
    out = dist_pgo.optimize_sharded(g_sh, gn_iters=6, cg_iters=64)
    # float32 CG accumulates in different reduction orders across shards;
    # ~1 cm agreement over a 31 m trajectory is bit-level-equivalent math
    np.testing.assert_allclose(np.asarray(out.poses.t[:32]),
                               np.asarray(ref.poses.t[:32]), atol=0.02)
    # drift removed in the sharded solve too
    assert abs(float(out.poses.t[31, 0]) - 31.0) < 0.1
