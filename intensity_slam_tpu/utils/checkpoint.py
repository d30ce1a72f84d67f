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


def restore(path: str, template, strict: bool = False):
    """Load a checkpoint saved by `save` into the structure of `template`.

    Leaves are matched BY KEY PATH, not position: fields added to a state
    pytree after a checkpoint was written simply keep their template value
    (with a warning), so old checkpoints stay loadable across additive state
    evolution.  Shapes of matched leaves must agree exactly.  With
    `strict=True` any missing or extra path raises instead.
    """
    import warnings

    import jax.numpy as jnp

    with np.load(path) as data:
        by_path = {k.split("|", 1)[1]: data[k] for k in data.files}
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    out, missing = [], []
    for kp, leaf in leaves:
        key = _path_str(kp)
        a = by_path.pop(key, None)
        if a is None:
            missing.append(key)
            out.append(leaf)
            continue
        if tuple(a.shape) != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch at {key}: ckpt {a.shape} vs "
                f"template {leaf.shape}")
        out.append(jnp.asarray(a, dtype=leaf.dtype))
    if missing or by_path:
        msg = (f"checkpoint {path}: {len(missing)} template leaves not in "
               f"checkpoint (kept template values): {missing[:4]}...; "
               f"{len(by_path)} checkpoint leaves unused: "
               f"{list(by_path)[:4]}...")
        if strict:
            raise ValueError(msg)
        warnings.warn(msg, stacklevel=2)
    _, plain_treedef = jax.tree_util.tree_flatten(template)
    return jax.tree_util.tree_unflatten(plain_treedef, out)
