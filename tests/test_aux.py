import os

import jax
import jax.numpy as jnp
import numpy as np

from intensity_slam_tpu import config
from intensity_slam_tpu.pipeline import loop as loop_mod
from intensity_slam_tpu.pipeline import slam
from intensity_slam_tpu.utils import checkpoint, metrics


def test_checkpoint_roundtrip_slam_state(tmp_path):
    cfg = config.small_test_config()
    state = slam.init_state(cfg, seed=3)
    # mutate a bit so it isn't all zeros
    state = state._replace(
        merged_pose=state.merged_pose._replace(t=jnp.array([1.0, 2.0, 3.0]))
    )
    p = str(tmp_path / "state.npz")
    checkpoint.save(p, state)
    restored = checkpoint.restore(p, slam.init_state(cfg))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    cfg = config.small_test_config()
    state = slam.init_state(cfg)
    p = str(tmp_path / "state.npz")
    checkpoint.save(p, state)
    other = slam.init_state(config.SlamConfig())  # different shapes
    try:
        checkpoint.restore(p, other)
        assert False, "expected shape mismatch error"
    except ValueError:
        pass


def test_checkpoint_backend_state(tmp_path):
    cfg = config.small_test_config()
    b = loop_mod.init_state(cfg)
    p = str(tmp_path / "backend.npz")
    checkpoint.save(p, b)
    r = checkpoint.restore(p, loop_mod.init_state(cfg))
    assert int(r.num_kf) == 0


def test_stage_timer_and_metrics():
    t = metrics.StageTimer()
    for _ in range(3):
        with t.stage("work"):
            sum(range(1000))
    s = t.summary()
    assert s["work"]["count"] == 3
    assert "work" in t.report()

    class FakeOut:
        skip = jnp.asarray(False)
        is_keyframe = jnp.asarray(True)
        num_good = jnp.asarray(42)
        num_plane_residuals = jnp.asarray(10)
        ground_ok = jnp.asarray(True)
        map_points = jnp.asarray(100)

    m = metrics.FrameMetrics()
    m.add(FakeOut())
    m.add(FakeOut())
    assert m.summary()["num_good"]["mean"] == 42.0
