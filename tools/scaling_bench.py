#!/usr/bin/env python
"""Scaling sweep: distributed BA + PGO throughput at 1..N devices.

Measures the north-star metric (BASELINE.md: >=80% frames/s scaling
efficiency) on whatever devices are available — the real pod slice in
production, the virtual CPU mesh in CI:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_bench.py --devices 1 2 4 8
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from intensity_slam_tpu.utils.platform import honor_env_platform

honor_env_platform()

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from intensity_slam_tpu.parallel import dist_ba
from intensity_slam_tpu.utils import se3
from intensity_slam_tpu.utils.se3 import Pose


def make_problem(K=64, L=4096, obs_per_pose=2048):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    gt_t = jnp.stack([jnp.arange(K) * 0.5, jnp.zeros(K), jnp.zeros(K)], -1)
    gt_q = jnp.tile(jnp.array([1.0, 0, 0, 0.0]), (K, 1))
    lms = jax.random.uniform(ks[0], (L, 3), minval=-10, maxval=40)
    op = jnp.repeat(jnp.arange(K), obs_per_pose)
    ol = jax.random.randint(ks[1], (K * obs_per_pose,), 0, L)
    z = se3.quat_rotate(se3.quat_conj(gt_q[op]), lms[ol] - gt_t[op])
    z = z + jax.random.normal(ks[2], z.shape) * 0.01
    return dist_ba.BAProblem(
        poses=Pose(gt_q, gt_t + 0.05), landmarks=lms + 0.05,
        obs_pose=op, obs_lm=ol, obs_z=z,
        obs_w=jnp.ones(op.shape[0]),
        fixed_poses=jnp.zeros(K, bool).at[0].set(True),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, len(jax.devices())])
    ap.add_argument("--poses", type=int, default=64)
    ap.add_argument("--landmarks", type=int, default=4096)
    ap.add_argument("--obs-per-pose", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", type=str, default=None,
                    help="write the sweep as a JSON artifact")
    args = ap.parse_args()

    if jax.devices()[0].platform == "cpu":
        print("NOTE: virtual CPU mesh — all devices share the same physical "
              "cores, so ms/solve validates correctness and sharding only; "
              "scaling efficiency is only meaningful on real chips.")
    prob = make_problem(args.poses, args.landmarks, args.obs_per_pose)
    M = prob.obs_z.shape[0]
    results = {}
    for n in args.devices:
        if n > len(jax.devices()):
            print(f"skip n={n}: only {len(jax.devices())} devices")
            continue
        mesh = Mesh(np.array(jax.devices()[:n]), axis_names=("data",))
        p = dist_ba.shard_problem(prob, mesh)
        res = dist_ba.ba_solve(p, gn_iters=3, cg_iters=16)
        jax.block_until_ready(res.poses.t)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            res = dist_ba.ba_solve(p, gn_iters=3, cg_iters=16)
        jax.block_until_ready(res.poses.t)
        dt = (time.perf_counter() - t0) / args.reps
        results[n] = dt
        eff = results[min(results)] / dt / (n / min(results)) * 100 if results else 100
        print(f"devices={n}: {dt*1e3:.1f} ms/solve  ({M/dt/1e6:.2f} Mobs/s)  "
              f"scaling-eff vs n={min(results)}: {eff:.0f}%")

    if args.out:
        import json

        base = min(results)
        with open(args.out, "w") as f:
            json.dump({
                "platform": jax.devices()[0].platform,
                "virtual_mesh": jax.devices()[0].platform == "cpu",
                "note": ("virtual CPU mesh shares physical cores: validates "
                         "sharded correctness at each device count, NOT "
                         "scaling efficiency" if jax.devices()[0].platform
                         == "cpu" else "real devices"),
                "poses": args.poses, "landmarks": args.landmarks,
                "observations": M,
                "ms_per_solve": {str(n): dt * 1e3 for n, dt in results.items()},
                "scaling_eff_pct": {
                    str(n): 100.0 * results[base] / dt / (n / base)
                    for n, dt in results.items()},
            }, f, indent=1)
        print(f"results -> {args.out}")


if __name__ == "__main__":
    main()
