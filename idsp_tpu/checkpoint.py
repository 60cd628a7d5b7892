"""Checkpoint/resume for streaming state.

The reference's architecture makes checkpointing trivial because all
mutable state is plain data separate from config (SURVEY.md §5:
`PLLState`, `DirectForm*`, ring buffers, most with serde derives) — the
TPU build preserves this: every filter state here is a pytree of
arrays, and block-boundary carries are exactly the checkpoint payload.

Two backends:
* orbax (preferred when available): async-capable, sharded-array-aware.
* a plain numpy `.npz` fallback with pytree structure preserved.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import jax


def _flatten_with_paths(tree: Any):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def save(path: str, state: Any) -> None:
    """Save a state pytree.  Uses orbax if importable, else .npz."""
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
        return
    except (ImportError, Exception):  # noqa: BLE001 — fall back to npz
        pass
    leaves, treedef = _flatten_with_paths(state)
    np.savez(
        path if path.endswith(".npz") else path + ".npz",
        treedef=json.dumps(str(treedef)),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def restore(path: str, like: Any) -> Any:
    """Restore a state pytree with the structure/dtypes of ``like``."""
    try:
        import orbax.checkpoint as ocp

        if os.path.isdir(path):
            ckptr = ocp.StandardCheckpointer()
            return ckptr.restore(os.path.abspath(path), like)
    except ImportError:
        pass
    npz = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz)
    leaves, treedef = jax.tree.flatten(like)
    new_leaves = [
        jax.numpy.asarray(data[f"leaf_{i}"], l.dtype)
        for i, l in enumerate(leaves)
    ]
    return jax.tree.unflatten(treedef, new_leaves)
