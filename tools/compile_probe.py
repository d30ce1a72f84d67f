#!/usr/bin/env python
"""Cold-compile breakdown of the fused per-frame program (VERDICT r4
weak #7 / item 9): where do the ~100 s go?

Measures, with the persistent compilation cache DISABLED:
  trace_s     jax.jit(...).lower(...)   — Python tracing + StableHLO emit
  compile_s   lowered.compile()         — XLA passes (on this rig via the
                                          remote axon compile service, so
                                          it includes service round-trip)
and reports StableHLO text size + module instruction counts for the
fused step and its two biggest sub-programs, so regressions can be
attributed to a specific stage's emitted program rather than guessed.
Writes RESULTS_compile.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from intensity_slam_tpu.utils.platform import honor_env_platform

honor_env_platform()

# no persistent cache: measure the true cold path
jax.config.update("jax_compilation_cache_dir", None)

from intensity_slam_tpu import config
from intensity_slam_tpu.ops import projection
from intensity_slam_tpu.pipeline import fused, loop as loop_mod, slam
from intensity_slam_tpu.utils.se3 import Pose


def probe(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t_trace = time.perf_counter() - t0
    txt = lowered.as_text()
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    row = {
        "trace_s": round(t_trace, 1),
        "compile_s": round(t_compile, 1),
        "stablehlo_mb": round(len(txt) / 1e6, 2),
        "stablehlo_lines": txt.count("\n"),
    }
    print(f"{name:28s} trace {t_trace:6.1f}s  compile {t_compile:6.1f}s  "
          f"hlo {row['stablehlo_mb']:.2f} MB / {row['stablehlo_lines']} "
          f"lines")
    return row


def main() -> int:
    cfg = config.os0_64_config()
    mask = projection.detection_mask(cfg.sensor)
    n = cfg.sensor.num_points
    x = jnp.ones((n, 3), jnp.float32)
    i = jnp.ones((n,), jnp.float32)
    t = jnp.float32(0.0)

    res = {}
    fstate = fused.init_state(cfg)
    res["fused_step"] = probe(
        "fused_step (full program)",
        lambda fs, xx, ii, tt: fused.fused_step(fs, xx, ii, tt, mask, cfg),
        fstate, x, i, t)

    sstate = slam.init_state(cfg)
    res["slam_step"] = probe(
        "slam_step (front-end)",
        lambda s_, xx, ii, tt: slam.slam_step(s_, xx, ii, tt, mask, cfg),
        sstate, x, i, t)

    bstate = loop_mod.init_state(cfg)
    res["backend_step"] = probe(
        "backend_step (kf back-end)",
        lambda bs, xx, m, tt: loop_mod.backend_step(
            bs, xx, m, jnp.zeros((cfg.feature.num_features, 8), jnp.uint32),
            jnp.zeros((cfg.feature.num_features,), bool),
            Pose.identity(), tt, cfg),
        bstate, x, jnp.ones((n,), bool), t)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "RESULTS_compile.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
