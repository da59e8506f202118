"""Within-stage (step-level) checkpoint/resume for the train loops.

The reference keeps ``OptimMethod.save`` for mid-run model snapshots
(scalann/src/main/scala/com/mass/scalann/optim/OptimMethod.scala:28-33) but
never wires a resume path; here a periodic snapshot of (params, optimizer
state, PRNG cursors, loop position) makes a killed multi-minute train stage
restartable BIT-COMPATIBLY: the resumed run replays the exact numpy
permutation stream, JAX PRNG chain and optimizer trajectory of an
uninterrupted one (tests/test_step_resume.py asserts parameter equality).
This matters operationally in this environment: the device tunnel has died
mid-stage twice (r3 tunnel death, r4 relay stall), and a restart without
step resume re-pays both the lost iterations and the ~300-400s
non-persistable relay compile (CLAUDE.md).

Atomicity: ONE ``.npz`` per snapshot with the loop meta embedded *inside*
the archive (a uint8-encoded JSON entry), written to a tmp file and
``os.replace``d — a kill mid-write can never leave a readable but
(arrays, meta)-inconsistent checkpoint, which two sidecar files renamed
separately could.

RNG convention: each trainer snapshots the numpy bit-generator state
*captured immediately before the current epoch's permutation draw* plus the
in-epoch position; resume restores the state, re-draws the identical
permutation, and seeks.  The JAX key is saved as the already-split parent
for the next iteration.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any

import jax
import numpy as np

logger = logging.getLogger("dismember_tpu.step_resume")

_META_KEY = "__step_resume_meta__"


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


def _npz_path(path: str) -> str:
    return path if path.endswith(".npz") else path + ".npz"


def save_step_state(path: str, tree: Any, meta: dict) -> None:
    """Atomically persist a pytree of arrays + JSON-able loop meta."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {_path_str(p): np.asarray(v) for p, v in flat}
    if _META_KEY in arrays:
        raise ValueError(f"pytree leaf name collides with {_META_KEY}")
    arrays[_META_KEY] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    dest = _npz_path(path)
    tmp = dest + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, dest)


def load_step_state(path: str, like: Any) -> tuple[Any, dict] | None:
    """Load a snapshot into the structure of ``like``; None when absent."""
    dest = _npz_path(path)
    if not os.path.exists(dest):
        return None
    paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    with np.load(dest) as data:
        meta = json.loads(bytes(data[_META_KEY]).decode("utf-8"))
        leaves = [data[_path_str(p)] for p, _ in paths]
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


def rng_state_to_json(rng: np.random.Generator) -> dict:
    """Bit-generator state as a JSON-able dict (PCG64 states are plain
    Python ints, which JSON round-trips at arbitrary precision)."""
    return rng.bit_generator.state


def rng_state_from_json(rng: np.random.Generator, state: dict) -> None:
    rng.bit_generator.state = state
