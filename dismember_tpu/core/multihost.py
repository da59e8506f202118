"""Multi-host coordination helpers.

The reference's only multi-node touchpoint is HDFS paths (scalann
utils/File.scala); the TPU rebuild's multi-host story is the JAX distributed
runtime: every process holds the same program, per-host input shards, and
host-built artifacts (trees, mappings) broadcast from process 0 so the index
is bitwise-identical everywhere.
"""

from __future__ import annotations

import numpy as np


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()


def host_shard(n: int) -> slice:
    """This host's contiguous shard of an n-row dataset (per-host input
    pipeline: each process feeds its slice of every global batch)."""
    import jax

    per = n // jax.process_count()
    start = jax.process_index() * per
    # last host absorbs the remainder
    end = n if jax.process_index() == jax.process_count() - 1 else start + per
    return slice(start, end)


def broadcast_from_host0(arrays: list[np.ndarray]) -> list[np.ndarray]:
    """Broadcast host-built numpy arrays (tree tables, path mappings) from
    process 0 to all processes.  Single-process: identity."""
    import jax

    if jax.process_count() == 1:
        return arrays
    from jax.experimental import multihost_utils

    return [
        np.asarray(multihost_utils.broadcast_one_to_all(a)) for a in arrays
    ]


def device_batch(mesh, *arrays: np.ndarray):
    """Global host batches -> global jax.Arrays sharded on 'data'.

    Each array is the FULL global batch (built from a shared seed or a
    host-identical source); this process contributes only its
    :func:`host_shard` rows, and JAX assembles the distributed global array.
    Single-process this is equivalent to a sharded device_put.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dismember_tpu.core.mesh import DATA_AXIS

    sh = NamedSharding(mesh, P(DATA_AXIS))
    out = []
    for a in arrays:
        local = np.ascontiguousarray(a[host_shard(a.shape[0])])
        out.append(
            jax.make_array_from_process_local_data(sh, local, a.shape)
        )
    return out[0] if len(out) == 1 else tuple(out)


def replicated(mesh, x):
    """Host value (identical on every process) -> replicated global array."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(x, NamedSharding(mesh, P()))


def gather_to_host(tree):
    """Sharded global pytree -> full numpy pytree on every process."""
    import jax

    if jax.process_count() == 1:
        return jax.tree.map(lambda a: np.asarray(jax.device_get(a)), tree)
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda a: np.asarray(multihost_utils.process_allgather(a, tiled=True)),
        tree,
    )


def assert_same_across_hosts(x: np.ndarray, name: str = "array") -> None:
    """Guard: verify an index artifact is identical on every host."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    ref = np.asarray(multihost_utils.broadcast_one_to_all(x))
    if not np.array_equal(ref, x):
        raise AssertionError(
            f"{name} differs across hosts; broadcast it from host 0 "
            "(core.multihost.broadcast_from_host0)"
        )
