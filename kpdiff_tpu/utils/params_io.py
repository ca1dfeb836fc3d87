"""Compact flat-npz param archives.

Orbax run checkpoints carry optimizer state (3x params) and a directory
tree; for shipping a trained model inside the repo (bench.py's
trained-regime benchmark, demos) a single compressed npz of the param
leaves keyed by jax.tree_util keystr is enough and ~53 MB for the
13.2M-param flagship.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import numpy as np


def save_params_npz(params: Dict[str, Any], path: str | Path):
    import jax

    leaves = {
        jax.tree_util.keystr(p): np.asarray(l)
        for p, l in jax.tree_util.tree_leaves_with_path(params)
    }
    np.savez_compressed(path, **leaves)


def load_params_npz(path: str | Path, template: Dict[str, Any]):
    """Rebuild a param pytree with `template`'s structure from the npz.
    Raises KeyError on any missing leaf and ValueError on shape mismatch."""
    import jax
    import jax.numpy as jnp

    with np.load(path) as z:
        stored = dict(z)

    paths_leaves = jax.tree_util.tree_leaves_with_path(template)
    out = []
    for p, leaf in paths_leaves:
        key = jax.tree_util.keystr(p)
        if key not in stored:
            raise KeyError(f"param leaf {key} missing from {path}")
        arr = stored[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(f"{key}: stored {arr.shape} != template {np.shape(leaf)}")
        out.append(jnp.asarray(arr))
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, out)
