#!/usr/bin/env python
"""Multi-process (multi-controller) dryrun of the distributed back-end.

The BASELINE.md north star requires scaling "1 chip -> 1 host -> N>=2
hosts"; everything up to round 3 ran in ONE process.  This tool crosses
the process boundary for real: it spawns N OS processes on localhost,
joins them with `jax.distributed.initialize` (JAX's multi-controller
runtime — the same API that joins N TPU hosts over DCN; on CPU the
collectives ride Gloo), forms one global mesh over all processes'
devices, and runs the live system's global solves across it:

  1. builds IDENTICAL live SLAM state in every process (the replicated
     state each host of a real deployment maintains),
  2. `dist_pgo.optimize_shmap` — SPMD pose-graph solve, loop edges
     sharded ACROSS PROCESSES, one cross-process psum of the (6K, 6K)
     normal equations per GN iteration,
  3. `dist_backend.refine` — sharded keyframe store + Schur-complement
     BA with observations sharded across processes,
  4. checks both against the single-process dense reference computed
     locally, and writes MULTIPROC_r04.json (launcher mode, process 0).

Usage:
  python tools/multiproc_dryrun.py                 # launcher: 2 procs x 4
  python tools/multiproc_dryrun.py --procs 2 --local-devices 4
  python tools/multiproc_dryrun.py --worker <pid>  # internal
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def worker(pid: int, nproc: int, coordinator: str, local_devices: int,
           out_path: str | None) -> None:
    from intensity_slam_tpu.parallel import multiproc

    multiproc.initialize(pid, nproc, coordinator, local_devices)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from intensity_slam_tpu.parallel import (dist_backend, dist_pgo,
                                             live_demo, multiproc as mp)
    from intensity_slam_tpu.pipeline import posegraph

    t0 = time.perf_counter()
    assert jax.process_count() == nproc, (
        f"expected {nproc} processes, got {jax.process_count()}")
    n_dev = jax.device_count()
    assert n_dev == nproc * local_devices
    mesh = Mesh(np.array(jax.devices()), ("data",))
    print(f"[worker {pid}] mesh: {nproc} processes x {local_devices} "
          f"devices = {n_dev} global", flush=True)

    # establish the cross-process collective channels NOW, while all
    # workers are aligned (the first Gloo connect has a bounded window; a
    # worker arriving late — e.g. asymmetric compile-cache hits — would
    # time the others out if the first collective were the big solve)
    probe = mp.put_global(np.arange(n_dev, dtype=np.float32), mesh,
                          P("data"))
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(probe)
    assert float(mp.fetch_replicated(total)) == n_dev * (n_dev - 1) / 2
    print(f"[worker {pid}] collective channel up", flush=True)

    # --- identical live state in every process (process-local compute)
    cfg = live_demo.live_config(n_scale=n_dev)
    sys_ = live_demo.build_live_system(cfg, frames=12)
    bstate = sys_.bstate
    n_kf = int(bstate.num_kf)
    t_build = time.perf_counter() - t0
    print(f"[worker {pid}] live state: {n_kf} keyframes "
          f"({t_build:.1f}s)", flush=True)
    # align workers before the distributed solves: build times differ
    # (compile-cache asymmetry), and collectives must be entered together
    multihost_utils.sync_global_devices("live-state-built")

    # --- single-process dense reference (local)
    lc = cfg.loop
    g_ref = posegraph.optimize(
        bstate.graph, gn_iters=lc.pgo_gn_iters,
        cg_iters=cfg.parallel.pgo_cg_iters,
        odo_noise=lc.odom_noise, prior_noise=lc.prior_noise,
        loop_cauchy_c=lc.loop_cauchy_c, drift_rate=lc.loop_drift_rate,
        drift_rot_rate=lc.loop_drift_rot_rate)
    ref_t = np.asarray(g_ref.poses.t[:n_kf])

    # --- cross-process SPMD PGO (edges sharded over processes; one psum
    # of the dense normal equations per GN iteration rides Gloo/DCN)
    t0 = time.perf_counter()
    g_mp = dist_pgo.optimize_shmap(
        bstate.graph, mesh, gn_iters=lc.pgo_gn_iters,
        cg_iters=cfg.parallel.pgo_cg_iters,
        odo_noise=lc.odom_noise, prior_noise=lc.prior_noise,
        loop_cauchy_c=lc.loop_cauchy_c, drift_rate=lc.loop_drift_rate,
        drift_rot_rate=lc.loop_drift_rot_rate)
    mp_t = multiproc.fetch_replicated(g_mp.poses.t)[:n_kf]
    t_pgo = time.perf_counter() - t0
    pgo_err = float(np.abs(mp_t - ref_t).max()) if n_kf else 0.0
    print(f"[worker {pid}] dist PGO across processes: max |dt| vs dense "
          f"reference = {pgo_err:.2e} ({t_pgo:.1f}s)", flush=True)
    assert pgo_err < 1e-3, f"PGO mismatch across processes: {pgo_err}"

    # --- full distributed refine (sharded keyframe store + Schur BA)
    multihost_utils.sync_global_devices("pre-refine")
    t0 = time.perf_counter()
    bstate_g = dist_backend.shard_backend_state(bstate, mesh)
    rres = dist_backend.refine(bstate_g, cfg, mesh=mesh)
    ref_res = dist_backend.refine(bstate, cfg, mesh=None)
    mp_poses = multiproc.fetch_replicated(rres.state.graph.poses.t)[:n_kf]
    lo_poses = np.asarray(ref_res.state.graph.poses.t[:n_kf])
    ba_ci = float(multiproc.fetch_replicated(rres.ba_initial_cost))
    ba_cf = float(multiproc.fetch_replicated(rres.ba_final_cost))
    lo_ci = float(ref_res.ba_initial_cost)
    lo_cf = float(ref_res.ba_final_cost)
    n_obs = int(multiproc.fetch_replicated(rres.num_obs))
    t_refine = time.perf_counter() - t0
    refine_err = float(np.abs(mp_poses - lo_poses).max()) if n_kf else 0.0
    print(f"[worker {pid}] dist refine: {n_obs} BA obs, cost "
          f"{ba_ci:.5f} -> {ba_cf:.5f} (local {lo_ci:.5f} -> {lo_cf:.5f}),"
          f" max pose |dt| vs local = {refine_err:.2e} ({t_refine:.1f}s)",
          flush=True)
    assert refine_err < 1e-3, f"refine mismatch: {refine_err}"
    assert abs(ba_ci - lo_ci) <= 1e-4 * max(1.0, abs(lo_ci)), \
        f"BA initial cost mismatch: {ba_ci} vs {lo_ci}"

    if pid == 0 and out_path:
        with open(out_path, "w") as f:
            json.dump({
                "processes": nproc,
                "local_devices_per_process": local_devices,
                "global_devices": n_dev,
                "collective_backend": "gloo (localhost); DCN on real pods",
                "live_keyframes": n_kf,
                "ba_observations": n_obs,
                "pgo_max_abs_dt_vs_dense_reference_m": pgo_err,
                "refine_max_abs_dt_vs_single_process_m": refine_err,
                "ba_cost_initial": ba_ci,
                "ba_cost_final": ba_cf,
                "ba_cost_initial_single_process": lo_ci,
                "ba_cost_final_single_process": lo_cf,
                "build_s": round(t_build, 1),
                "dist_pgo_s": round(t_pgo, 1),
                "dist_refine_s": round(t_refine, 1),
                "ok": True,
            }, f, indent=1)
        print(f"[worker 0] wrote {out_path}", flush=True)
    multihost_utils.sync_global_devices("done")
    jax.distributed.shutdown()


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch(procs: int, local_devices: int, out_path: str,
           timeout_s: int = 900, retries: int = 1) -> int:
    """Spawn the workers and wait.  One retry by default: the first Gloo
    connect between processes has a bounded window, and a heavily loaded
    CI machine can push one worker's startup past it — a transient, not a
    correctness failure (the workers assert numerics themselves)."""
    rc = -1
    for attempt in range(retries + 1):
        coordinator = f"127.0.0.1:{_free_port()}"
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("XLA_FLAGS", None)
        ps = []
        for pid in range(procs):
            ps.append(subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--worker", str(pid), "--procs", str(procs),
                 "--local-devices", str(local_devices),
                 "--coordinator", coordinator, "--out", out_path],
                env=env, cwd=_REPO))
        rc = 0
        deadline = time.time() + timeout_s
        for p in ps:
            try:
                rc |= p.wait(timeout=max(1.0, deadline - time.time()))
            except subprocess.TimeoutExpired:
                p.kill()
                rc |= 124
        if rc == 0:
            return 0
        print(f"multiproc attempt {attempt + 1} failed rc={rc}"
              + (", retrying" if attempt < retries else ""),
              file=sys.stderr, flush=True)
    return rc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--coordinator", type=str, default="127.0.0.1:12377")
    ap.add_argument("--out", type=str,
                    default=os.path.join(_REPO, "MULTIPROC_r04.json"))
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker, args.procs, args.coordinator,
               args.local_devices, args.out)
        return 0
    rc = launch(args.procs, args.local_devices, args.out, args.timeout)
    if rc == 0:
        print(f"multiproc dryrun OK -> {args.out}")
    else:
        print(f"multiproc dryrun FAILED rc={rc}", file=sys.stderr)
    return rc


if __name__ == "__main__":
    sys.exit(main())
