"""Checkpointing of parameter/optimizer pytrees.

The reference persists models via Java serialization (tdm/.../utils/
Serialization.scala:62-104); here pytrees are flattened to named numpy arrays
in an ``.npz`` plus a JSON meta sidecar — deterministic, portable, and
mesh-agnostic (arrays are fully gathered on save and re-sharded on load by
the caller's jit).  Stage-level checkpoints of the train→index→retrain
alternation store (params, opt_state, index arrays, rng, stage tag).
"""

from __future__ import annotations

import json
from typing import Any

import jax
import numpy as np

from dismember_tpu.core.io import open_file, stage_in, stage_out


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_pytree(path: str, tree: Any, meta: dict | None = None) -> None:
    """Save a pytree of arrays to ``path`` (.npz) with optional JSON meta.

    Goes through :func:`core.io.stage_out` so local paths stream straight to
    disk (deep-catalog checkpoints are multi-GB — an in-memory .npz would
    double peak host RSS) while remote URLs stage via a temp file."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {_path_str(p): np.asarray(v) for p, v in flat}
    npz_path = path if path.endswith(".npz") else path + ".npz"
    with stage_out(npz_path) as local:
        np.savez(local, **arrays)
    if meta is not None:
        with open_file(_meta_path(path), "w", encoding="utf-8") as f:
            f.write(json.dumps(meta))


def load_pytree(path: str, like: Any) -> Any:
    """Load arrays saved by :func:`save_pytree` into the structure of ``like``.

    stage_in keeps np.load's lazy per-array zip reads for local files instead
    of materializing the whole archive in memory first."""
    npz_path = path if path.endswith(".npz") else path + ".npz"
    paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    with stage_in(npz_path) as local:
        with np.load(local) as data:
            leaves = [data[_path_str(p)] for p, _ in paths]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_meta(path: str) -> dict:
    with open_file(_meta_path(path), "r", encoding="utf-8") as f:
        return json.loads(f.read())


def _meta_path(path: str) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".meta.json"
