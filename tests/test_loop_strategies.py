"""Loop-detection strategy channels (reference C8: the three hard-switched
strategies of `loop_closure_handler.cpp:94-96`) + the ICP crop option.

Each channel is independently config-gated in our backend; these tests drive
`backend_step` directly with structured synthetic keyframes.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from intensity_slam_tpu import config
from intensity_slam_tpu.pipeline import loop as loop_mod
from intensity_slam_tpu.utils.se3 import Pose


def _room_cloud(key, n=1024):
    """Points on the walls of a 10 m box (structured enough for ICP)."""
    k1, k2, k3 = jax.random.split(key, 3)
    side = jax.random.randint(k1, (n,), 0, 4)
    u = jax.random.uniform(k2, (n,), minval=-5.0, maxval=5.0)
    z = jax.random.uniform(k3, (n,), minval=-1.0, maxval=2.0)
    x = jnp.where(side == 0, 5.0, jnp.where(side == 1, -5.0, u))
    y = jnp.where(side == 2, 5.0, jnp.where(side == 3, -5.0, u))
    return jnp.stack([x, y, z], axis=-1)


def _cfg(**loop_kw):
    base = config.small_test_config()
    lc = dataclasses.replace(
        base.loop,
        max_keyframes=16,
        keyframe_cloud_size=512,
        min_loop_search_gap=2,
        sc_num_exclude_recent=2,
        min_time_gap=3.0,        # shrink the 40 s gap for a short test
        **loop_kw,
    )
    return base.replace(loop=lc)


def _run_keyframes(cfg, poses_t, times, key=0):
    state = loop_mod.init_state(cfg)
    kf = jax.random.PRNGKey(key)
    F = cfg.feature.num_features
    desc = jnp.zeros((F, 8), jnp.uint32)
    dv = jnp.zeros((F,), bool)
    cloud = _room_cloud(kf)
    mask = jnp.ones(cloud.shape[0], bool)
    step = jax.jit(
        lambda st, p, t: loop_mod.backend_step(
            st, cloud, mask, desc, dv, Pose(jnp.array([1.0, 0, 0, 0]), p),
            t, cfg)
    )
    outs = []
    for p, t in zip(poses_t, times):
        state, out = step(state, jnp.asarray(p, jnp.float32),
                          jnp.float32(t))
        outs.append(out)
    return state, outs


def test_radius_channel_fires_on_revisit():
    """kd-radius strategy (`loop_closure_handler.cpp:42-84`): a keyframe
    within 7 m of an old one, > min_time_gap seconds later, proposes it."""
    cfg = _cfg(use_scancontext=False, use_bow_loop=False,
               use_radius_search=True)
    # walk away >7 m then return to the start much later
    poses = [[0, 0, 0], [8, 0, 0], [16, 0, 0], [8, 0, 0], [0.5, 0, 0]]
    times = [0.0, 1.0, 2.0, 3.0, 9.0]
    _, outs = _run_keyframes(cfg, poses, times)
    # no early false fire (time gaps too small)
    assert not any(bool(o.sc_found) for o in outs[:4])
    last = outs[-1]
    assert bool(last.sc_found), "radius channel did not fire on revisit"
    assert int(last.loop_idx) == 0, int(last.loop_idx)


def test_radius_channel_respects_time_gap():
    cfg = _cfg(use_scancontext=False, use_bow_loop=False,
               use_radius_search=True)
    # revisit happens but within the time gap -> no candidate
    poses = [[0, 0, 0], [8, 0, 0], [0.5, 0, 0]]
    times = [0.0, 1.0, 2.0]
    _, outs = _run_keyframes(cfg, poses, times)
    assert not any(bool(o.sc_found) for o in outs)


def test_crop_option_compiles_and_verifies():
    """use_crop masks both map-frame clouds to the +/-crop_size origin box
    (`intensity_feature_tracker.cpp:228-230,266-283`); with a generous box
    the revisit must still verify by ICP."""
    cfg = _cfg(use_scancontext=False, use_bow_loop=False,
               use_radius_search=True, use_crop=True, crop_size=50.0)
    poses = [[0, 0, 0], [8, 0, 0], [16, 0, 0], [8, 0, 0], [0.0, 0, 0]]
    times = [0.0, 1.0, 2.0, 3.0, 9.0]
    _, outs = _run_keyframes(cfg, poses, times)
    last = outs[-1]
    assert bool(last.sc_found)
    # identical static cloud at the same pose: ICP must accept
    assert bool(last.loop_found), float(last.icp_fitness)
    # tight crop box that empties the clouds must NOT accept (and not NaN)
    cfg2 = _cfg(use_scancontext=False, use_bow_loop=False,
                use_radius_search=True, use_crop=True, crop_size=0.05)
    _, outs2 = _run_keyframes(cfg2, poses, times)
    assert not bool(outs2[-1].loop_found)


def test_all_channels_off_never_fires():
    cfg = _cfg(use_scancontext=False, use_bow_loop=False,
               use_radius_search=False)
    poses = [[0, 0, 0], [8, 0, 0], [0.0, 0, 0]]
    times = [0.0, 1.0, 9.0]
    _, outs = _run_keyframes(cfg, poses, times)
    assert not any(bool(o.sc_found) for o in outs)
    assert not any(bool(o.loop_found) for o in outs)
