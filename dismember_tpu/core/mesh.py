"""Device mesh and sharding rules — the rebuild's communication backend.

The reference is single-process multi-threaded (SURVEY.md §2.8): model clones
share one flat weight tensor, gradients are slice-reduced by hand
(tdm/.../optim/LocalOptimizer.scala:164-187).  On TPU the equivalent is a
('data', 'model') mesh:

- P1 data parallelism  -> batch arrays sharded on 'data'; the mean-reduced
  gradient psum is emitted by pjit'd autodiff automatically;
- P2 optimizer-state sharding -> Adam moments inherit the parameter sharding;
- P3 row-sharded embedding/node tables -> 'model' axis over table rows; the
  beam frontier / sampled-node gathers become all-to-all style collective
  gathers laid onto ICI by GSPMD.

Multi-host: call :func:`init_distributed` before mesh creation; each process
contributes its local devices and feeds its shard of each batch.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up (jax.distributed).  No-op when single-process."""
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: list | None = None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    if n_data * n_model != n:
        raise ValueError(f"mesh {n_data}x{n_model} != {n} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def param_spec(params: Any, embedding_key: str = "embedding"):
    """PartitionSpec pytree: embedding tables row-sharded on 'model',
    everything else replicated.  Works for any pytree whose top-level dict has
    an ``embedding`` leaf (DIN/DeepFM/DR models)."""

    def spec_for(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if embedding_key in keys and getattr(leaf, "ndim", 0) == 2:
            return P(MODEL_AXIS, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_like(spec_tree: Any, mesh: Mesh):
    """PartitionSpec pytree -> NamedSharding pytree."""
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def opt_state_spec(opt_state: Any, params_spec: Any, params: Any):
    """Optimizer-state sharding: moments with a parameter's shape inherit its
    spec (ZeRO-style state sharding, SURVEY.md §2.8 P2); scalars replicated."""
    shape_to_spec: dict[tuple, Any] = {}
    for p, s in zip(jax.tree.leaves(params), jax.tree.leaves(params_spec, is_leaf=lambda x: isinstance(x, P))):
        shape_to_spec.setdefault(tuple(p.shape), s)

    def spec_for(leaf):
        if hasattr(leaf, "shape") and tuple(leaf.shape) in shape_to_spec:
            return shape_to_spec[tuple(leaf.shape)]
        return P()

    return jax.tree.map(spec_for, opt_state)


def batch_spec() -> P:
    return P(DATA_AXIS)
