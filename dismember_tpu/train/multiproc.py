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


def run_deep_serving(
    n_items: int = 1 << 14,
    n_model: int = 2,
    global_batch_size: int = 16,
    embed_size: int = 16,
    seed: int = 0,
) -> dict[str, Any]:
    """Deep-serving + sharded-DR leg over all global devices.

    Grows the multi-process harness past toy shapes (a 2^14-item tree, so
    cross-process gathers actually exercise the table-shard exchange) and
    covers the paths the train-step leg doesn't:

    - the packed/hybrid deep-catalog beam with its pair table row-sharded
      on 'model' (train/spmd.make_sharded_packed_beam_fn);
    - Deep Retrieval's sharded pmv E-step (one layer + one rerank step) and
      the sharded block-rerank serving (train/spmd_dr.py).

    Like run_tdm_steps, the same SPMD program runs under any process
    layout, so results must match across layouts (tests/test_multiproc.py).
    Returns host numpy results gathered to every process.
    """
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dismember_tpu.core import mesh as meshlib, multihost
    from dismember_tpu.index.arraytree import ArrayTree
    from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
    from dismember_tpu.models import din
    from dismember_tpu.retrieval.packed_beam import make_packed_tree
    from dismember_tpu.train.spmd import make_sharded_packed_beam_fn

    devices = jax.devices()
    mesh = meshlib.make_mesh(
        n_data=len(devices) // n_model, n_model=n_model, devices=devices
    )
    rep = multihost.replicated

    # --- deep tree from host 0 -------------------------------------------
    if multihost.process_index() == 0:
        ids = np.arange(1, n_items + 1)
        sorted_ids, codes = category_sorted_codes(ids, ids % 97)
    else:
        sorted_ids = np.zeros(n_items, dtype=np.int64)
        codes = np.zeros(n_items, dtype=np.int64)
    sorted_ids, codes = multihost.broadcast_from_host0([sorted_ids, codes])
    multihost.assert_same_across_hosts(codes, "deep leaf codes")
    with tempfile.TemporaryDirectory() as td:
        tree_path = os.path.join(td, "tree.bin")
        write_tree(tree_path, sorted_ids, codes)
        tree = ArrayTree.from_file(tree_path)

    num_index = (1 << (tree.max_level + 1)) - 1
    params = din.init_params(jax.random.PRNGKey(seed), num_index, embed_size)
    packed = make_packed_tree(tree, params["embedding"], beam=8)
    beam_fn = make_sharded_packed_beam_fn(
        packed, mesh, din.precompute_seq, din.apply_from_emb
    )
    rng = np.random.default_rng(seed + 1)
    seq_codes = tree.ids_to_codes(
        rng.integers(1, n_items + 1, size=(global_batch_size, 10))
    ).astype(np.int32)
    sc = multihost.device_batch(mesh, seq_codes)
    params_g = rep(mesh, params)
    ids, scores = beam_fn(params_g, sc)
    packed_out = multihost.gather_to_host({"ids": ids, "scores": scores})

    # --- sharded Deep Retrieval: E-step + block serving -------------------
    from dismember_tpu.data.dr_dataset import DRData
    from dismember_tpu.train import spmd_dr
    from dismember_tpu.train.dr import DRTrainer

    n_dr, L, n_rows = 4096, 6, 64
    rng2 = np.random.default_rng(seed + 2)  # same seed everywhere
    data = DRData(
        item_to_id={i: i for i in range(n_dr)},
        id_to_item={i: i for i in range(n_dr)},
        num_items=n_dr,
        train_seqs=rng2.integers(0, n_dr, size=(n_rows, L)).astype(np.int64),
        train_targets=rng2.integers(0, n_dr, size=n_rows).astype(np.int64),
        eval_seqs=np.zeros((0, L), np.int64),
        eval_labels=np.zeros((0, 1), np.int64),
        eval_users=np.zeros(0, np.int64),
        user_consumed={},
    )
    multihost.assert_same_across_hosts(data.train_targets, "dr targets")
    trainer = DRTrainer(
        data, num_layers=2, num_nodes=16, num_paths_per_item=2,
        embed_size=8, learning_rate=3e-3, seed=seed, num_sampled=2,
        beam_size=4, seq_len=L, mesh=mesh,
    )
    seqs, paths, labels = (
        multihost.device_batch(
            mesh,
            data.train_seqs.astype(np.int32),
            trainer.path_index.item_paths[data.train_targets].astype(np.int32),
            data.train_targets.astype(np.int32),
        )
    )
    trainer.layer_params, trainer.layer_opt_state, layer_losses = (
        trainer._layer_step(
            trainer.layer_params, trainer.layer_opt_state, seqs, paths
        )
    )
    key = rep(mesh, jax.random.PRNGKey(seed + 3))
    trainer.rerank_params, trainer.rerank_opt_state, rerank_loss = (
        trainer._rerank_step(
            trainer.rerank_params, trainer.rerank_opt_state, key, seqs, labels
        )
    )
    trainer._sync_mirrors()
    serve = spmd_dr.make_sharded_dr_serving_fn(trainer, mesh, topk=5)
    eval_seqs = rng2.integers(0, n_dr, size=(global_batch_size, L)).astype(
        np.int32
    )
    es = multihost.device_batch(mesh, eval_seqs)
    consumed = multihost.device_batch(
        mesh, np.full((global_batch_size, 1), -1, np.int32)
    )
    dr_ids, dr_scores = serve(
        trainer.layer_params, trainer.rerank_params, es, consumed
    )
    dr_out = multihost.gather_to_host({"ids": dr_ids, "scores": dr_scores})

    return {
        "packed_ids": packed_out["ids"],
        "packed_scores": packed_out["scores"],
        "dr_layer_losses": np.asarray(layer_losses),
        "dr_rerank_loss": float(rerank_loss),
        "dr_ids": dr_out["ids"],
        "dr_scores": dr_out["scores"],
    }
