"""Multi-process placement + bootstrap for the distributed back-end.

The scale-out north star (BASELINE.md: >=80 % scaling 1 chip -> 1 host ->
N>=2 hosts) requires the solves to cross a PROCESS boundary — on real
hardware that is DCN between TPU hosts; in CI it is N OS processes on
localhost joined by `jax.distributed.initialize` with Gloo CPU
collectives.  This module holds the pieces that differ between the
single-controller and multi-controller worlds:

* `put_global` — place a host-replicated value onto a (possibly
  multi-process) mesh under any PartitionSpec.  Single-process: plain
  `jax.device_put`.  Multi-process: `jax.make_array_from_callback`, which
  builds the global array from each process's ADDRESSABLE shards only —
  `device_put` cannot target non-addressable devices.  Requires every
  process to hold the same full value (true for our use: each SLAM host
  replays/holds the same graph + keyframe metadata it contributes to the
  global solve).
* `initialize` — thin wrapper over `jax.distributed.initialize` that
  forces the CPU platform config the way the test harness needs it
  (the container's sitecustomize pre-imports jax against the axon TPU
  plugin, so env vars alone are too late — the jax config must be
  updated post-import, pre-backend-init).

The solver code itself (`dist_pgo.optimize_shmap`, `dist_ba.ba_solve`,
`dist_backend.refine`) is identical in both worlds: same program, same
collectives; only array PLACEMENT differs.  That is the point of the
single-program SPMD design (SURVEY §5-comm).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def initialize(process_id: int, num_processes: int,
               coordinator: str = "127.0.0.1:12377",
               local_devices: int = 4) -> None:
    """Join this process to a multi-controller JAX runtime on the CPU
    platform with `local_devices` virtual devices per process.  Call
    before any other JAX operation."""
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def put_global(x, mesh, spec: P):
    """Place `x` (host value, identical on every participating process)
    onto `mesh` under `spec`.  Works on single- AND multi-process meshes;
    passes through arrays already placed as requested."""
    sh = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if x.sharding.is_equivalent_to(sh, x.ndim):
            return x
        if x.sharding.is_fully_replicated:
            x = np.asarray(x.addressable_shards[0].data)
        else:
            raise ValueError(
                "cannot re-place a sharded non-addressable array on the "
                "host path; use out_shardings on the producing jit instead")
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sh,
                                        lambda idx: arr[idx])


def tree_put_global(tree, mesh, spec: P):
    """`put_global` over a pytree with one spec for every leaf."""
    return jax.tree.map(lambda a: put_global(a, mesh, spec), tree)


def fetch_replicated(x) -> np.ndarray:
    """Host value of a fully-replicated global array (every process holds
    a complete copy in its addressable shards)."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    # fully-replicated but not fully addressable: any local shard is the
    # whole array
    shard = x.addressable_shards[0]
    return np.asarray(shard.data)
