"""Checkpoint/resume for SLAM state (SURVEY §5 checkpoint).

The reference has NO persistence: map, keyframes, and iSAM2 state live in
process RAM only (the sole artifact is a debug pose dump,
`laserMapping.cpp:1108-1125`).  Killing a node loses the session.

Here every piece of system state is already a pytree of fixed-shape device
arrays (SlamState, BackendState), so checkpointing is exact and trivial:
flatten with key paths, store as one .npz, restore against a template
state.  This enables crash-resume and multi-session mapping (load a prior
session's map + keyframe store, keep localizing).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _path_str(path) -> str:
    out = []
    for p in path:
        if hasattr(p, "name"):
            out.append(str(p.name))
        elif hasattr(p, "idx"):
            out.append(str(p.idx))
        elif hasattr(p, "key"):
            out.append(str(p.key))
        else:
            out.append(str(p))
    return "/".join(out)


def save(path: str, state) -> None:
    """Serialize any pytree of arrays to `path` (.npz)."""
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    payload = {}
    for i, (kp, leaf) in enumerate(leaves):
        payload[f"{i:04d}|{_path_str(kp)}"] = np.asarray(leaf)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **payload)
    os.replace(tmp, path)  # atomic


def restore(path: str, template):
    """Load a checkpoint saved by `save` into the structure of `template`.

    Shapes and dtypes must match the template (fixed-shape state makes this
    exact across sessions as long as the config is unchanged).
    """
    with np.load(path) as data:
        keys = sorted(data.files, key=lambda s: int(s.split("|")[0]))
        arrays = [data[k] for k in keys]
    leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(arrays) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(arrays)} leaves, template has {len(leaves)}"
            " — config/shape mismatch")
    for a, l in zip(arrays, leaves):
        if tuple(a.shape) != tuple(l.shape):
            raise ValueError(f"shape mismatch: ckpt {a.shape} vs template {l.shape}")
    import jax.numpy as jnp

    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(a, dtype=l.dtype) for a, l in zip(arrays, leaves)]
    )
