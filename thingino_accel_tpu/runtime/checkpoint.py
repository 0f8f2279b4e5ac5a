"""Checkpoint/restore for engine params and training state.

The reference is inference-only — its only persistent state is model
files plus the AEC GRU hidden tensor (SURVEY §5 checkpoint/resume: N/A).
With QAT/PTQ in the framework, checkpointing becomes real: save/restore
param pytrees and optimizer state, orbax-backed when available with a
plain-npz fallback (hermetic environments).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in leaves:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save(path: str, params: Any, extra: Optional[Dict[str, Any]] = None,
         step: int = 0) -> None:
    """Save a param pytree (+ JSON-serializable metadata) to ``path``.

    Uses orbax when importable (production path: async, sharded),
    otherwise a single .npz + .json pair.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import orbax.checkpoint as ocp
        have_orbax = True
    except ImportError:
        have_orbax = False
    if have_orbax:
        try:
            ckpt = ocp.StandardCheckpointer()
            ckpt.save(os.path.abspath(path) + ".orbax",
                      jax.tree.map(np.asarray, params), force=True)
            ckpt.wait_until_finished()
            backend = "orbax"
        except Exception as e:
            # a failed orbax WRITE (disk full, flush error) is a real
            # failure: clean the partial dir, warn loudly, then fall
            # back so the caller still gets a usable checkpoint
            import shutil
            import warnings
            shutil.rmtree(os.path.abspath(path) + ".orbax",
                          ignore_errors=True)
            warnings.warn(f"orbax save failed ({type(e).__name__}: {e}); "
                          "falling back to npz")
            have_orbax = False
    if not have_orbax:
        flat = _flatten(params)
        np.savez(path + ".npz", **flat)
        backend = "npz"
    meta = {"step": step, "backend": backend, "extra": extra or {}}
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


def load(path: str, like: Optional[Any] = None
         ) -> Tuple[Any, Dict[str, Any]]:
    """Load a checkpoint saved by :func:`save`. ``like`` (a pytree of the
    same structure) restores nesting for the npz backend; without it a
    flat dict is returned."""
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    if meta["backend"] == "orbax":
        import orbax.checkpoint as ocp
        ckpt = ocp.StandardCheckpointer()
        if like is not None:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
                like)
            params = ckpt.restore(os.path.abspath(path) + ".orbax", abstract)
        else:
            params = ckpt.restore(os.path.abspath(path) + ".orbax")
        return params, meta
    data = np.load(path + ".npz")
    flat = {k: data[k] for k in data.files}
    if like is None:
        return flat, meta
    leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
    ordered = []
    for p, leaf in leaves:
        key = "/".join(str(getattr(q, "key", getattr(q, "idx", q)))
                       for q in p)
        ordered.append(flat[key])
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), ordered), meta
