"""Multi-process SPMD training harness.

The reference is a single JVM whose only "collective" is a fork-join thread
pool (scalann utils/ThreadPool.scala:133-149); it has no distributed backend
at all (SURVEY.md §2.8).  The TPU-native rebuild's backend is the JAX
distributed runtime: N processes, each owning a slice of the device mesh,
one SPMD program, collectives over ICI/DCN emitted by GSPMD.

This module makes that path a first-class, testable component without TPU
pods: :func:`initialize` brings up ``jax.distributed`` on the CPU backend
with K virtual devices per process, and :func:`run_tdm_steps` executes the
real sharded TDM train step (batch on 'data', embedding rows on 'model',
Adam moments inheriting parameter sharding) with

- the tree built on process 0 only and broadcast to every host
  (:func:`dismember_tpu.core.multihost.broadcast_from_host0`), then verified
  identical (:func:`~dismember_tpu.core.multihost.assert_same_across_hosts`);
- each process feeding only its host shard of every global batch
  (:func:`~dismember_tpu.core.multihost.host_shard` +
  :func:`~dismember_tpu.core.multihost.device_batch`).

The same function runs single-process on a virtual mesh, which is how
``tests/test_multiproc.py`` asserts bit-level parity between a 1-process
8-device run and a 2-process 4-device-each run of the identical program.
"""

from __future__ import annotations

import os
from typing import Any


def initialize(
    coordinator: str,
    num_processes: int,
    process_id: int,
    local_devices: int = 4,
) -> None:
    """Bring up the JAX distributed runtime on the CPU backend.

    Must be called before any other JAX use in the process.  On a real TPU
    pod the plugin discovers local devices itself; here each process exposes
    ``local_devices`` virtual CPU devices so an M-process run models an
    M-host pod slice.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    # strip any inherited host-device-count flag, then set ours
    kept = [
        f
        for f in flags.split()
        if "xla_force_host_platform_device_count" not in f
    ]
    kept.append(f"--xla_force_host_platform_device_count={local_devices}")
    os.environ["XLA_FLAGS"] = " ".join(kept)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def run_tdm_steps(
    steps: int = 4,
    global_batch_size: int = 16,
    n_model: int = 2,
    embed_size: int = 16,
    seed: int = 0,
) -> dict[str, Any]:
    """Run ``steps`` sharded TDM train steps over all global devices.

    Works for any process count (1 on the test mesh, N under
    :func:`initialize`); the computation is the same SPMD program either
    way, so results must match bitwise across process layouts.

    Returns {"losses": [float], "params": host pytree} gathered to every
    process.
    """
    import tempfile

    import jax
    import numpy as np
    import optax

    from dismember_tpu.core import mesh as meshlib, multihost
    from dismember_tpu.index.arraytree import ArrayTree
    from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
    from dismember_tpu.models import din
    from dismember_tpu.train.sampler import TreeSampler
    from dismember_tpu.train.spmd import make_sharded_train_step, padded_num_index

    devices = jax.devices()
    mesh = meshlib.make_mesh(
        n_data=len(devices) // n_model, n_model=n_model, devices=devices
    )

    # --- index built on host 0, broadcast to all hosts -------------------
    n_items = 32
    if multihost.process_index() == 0:
        ids = np.arange(1, n_items + 1)
        cats = np.zeros(n_items, dtype=np.int64)
        sorted_ids, codes = category_sorted_codes(ids, cats)
    else:
        sorted_ids = np.zeros(n_items, dtype=np.int64)
        codes = np.zeros(n_items, dtype=np.int64)
    sorted_ids, codes = multihost.broadcast_from_host0([sorted_ids, codes])
    multihost.assert_same_across_hosts(codes, "leaf codes")

    with tempfile.TemporaryDirectory() as td:
        tree_path = os.path.join(td, "tree.bin")
        write_tree(tree_path, sorted_ids, codes)
        tree = ArrayTree.from_file(tree_path)

    # --- model + optimizer (identical init on every process) -------------
    num_index = padded_num_index((1 << (tree.max_level + 1)) - 1, mesh)
    params = din.init_params(jax.random.PRNGKey(seed), num_index, embed_size)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    sampler = TreeSampler.build(tree, "0,1,2,3,4,5", start_level=1)

    step, params, opt_state = make_sharded_train_step(
        din.forward, sampler, optimizer, mesh, params, opt_state
    )

    # --- steps: global batch from a shared seed, each host feeds its shard
    rng = np.random.default_rng(seed)
    losses = []
    for i in range(steps):
        target_codes = rng.choice(tree.item_codes, global_batch_size).astype(
            np.int32
        )
        seq_codes = tree.ids_to_codes(
            rng.integers(1, n_items + 1, size=(global_batch_size, 10))
        ).astype(np.int32)
        tc, sc = multihost.device_batch(mesh, target_codes, seq_codes)
        key = multihost.replicated(mesh, jax.random.fold_in(jax.random.PRNGKey(seed + 1), i))
        params, opt_state, loss = step(params, opt_state, key, tc, sc)
        losses.append(float(loss))

    host_params = multihost.gather_to_host(params)

    # serving leg: sharded beam search over the same mesh with the trained
    # params (row-sharded table; query batch sharded on 'data') — cross-
    # process collective gathers on the serving path, not just training
    from dismember_tpu.train.spmd import make_sharded_beam_fn

    beam_fn, beam_params = make_sharded_beam_fn(
        din.forward, tree, 4, mesh, host_params,
        precompute=din.precompute_seq, apply=din.apply_with_ctx,
    )
    eval_seqs = tree.ids_to_codes(
        np.random.default_rng(seed + 2).integers(
            1, n_items + 1, size=(global_batch_size, 10)
        )
    ).astype(np.int32)
    (sc,) = (multihost.device_batch(mesh, eval_seqs),)
    ids, scores = beam_fn(beam_params, sc)
    beam = multihost.gather_to_host({"ids": ids, "scores": scores})

    return {
        "losses": losses,
        "params": host_params,
        "beam_ids": beam["ids"],
        "beam_scores": beam["scores"],
    }
