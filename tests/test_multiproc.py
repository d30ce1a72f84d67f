"""Multi-process (multi-controller) distributed back-end: the executable
form of the BASELINE.md "N>=2 hosts" scaling target.

Spawns 2 OS processes joined via `jax.distributed.initialize` (Gloo CPU
collectives — the localhost stand-in for TPU hosts over DCN), each holding
2 virtual devices, and verifies that the cross-process SPMD pose-graph
solve and the sharded-keyframe-store refine equal the single-process dense
reference (tools/multiproc_dryrun.py worker asserts; launcher propagates
worker exit codes)."""

import json
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "tools"))


def test_two_process_distributed_backend(tmp_path):
    import multiproc_dryrun

    out = str(tmp_path / "multiproc.json")
    rc = multiproc_dryrun.launch(2, 2, out, timeout_s=600)
    assert rc == 0, "multi-process dryrun failed (see stderr above)"
    with open(out) as f:
        art = json.load(f)
    assert art["ok"]
    assert art["processes"] == 2
    assert art["global_devices"] == 4
    assert art["pgo_max_abs_dt_vs_dense_reference_m"] < 1e-3
    assert art["refine_max_abs_dt_vs_single_process_m"] < 1e-3
    assert art["live_keyframes"] >= 4
    assert art["ba_observations"] > 0
