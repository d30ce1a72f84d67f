"""Smoke tests for the CLI tools (reference C24: the rviz/roslaunch surface).

The reference's run surface is `roslaunch ... spot.launch` + rviz; ours is
`tools/replay.py` (bag-free replay with an ATE gate) and
`tools/visualize.py` (headless debug renders).  These drive both end to end
on tiny synthetic sequences.
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS=os.environ.get("XLA_FLAGS", ""),
    # share the suite's persistent compile cache with the subprocess
    JAX_COMPILATION_CACHE_DIR=os.path.join(_REPO, ".jax_cache"),
    JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0.5",
)


def _run(args, timeout=240):
    return subprocess.run(
        [sys.executable, *args], cwd=_REPO, env=_ENV,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow
def test_replay_cli_small():
    r = _run(["tools/replay.py", "--frames", "6", "--small", "--check-ate",
              "--ate-bound", "5.0"])
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.mark.slow
def test_visualize_cli_small(tmp_path):
    r = _run(["tools/visualize.py", "--frames", "4", "--small",
              "--out", str(tmp_path)])
    assert r.returncode == 0, r.stderr[-2000:]
    made = os.listdir(tmp_path)
    assert "trajectory.png" in made, made
