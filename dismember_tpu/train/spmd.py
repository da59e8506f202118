"""SPMD train step: pjit over the ('data','model') mesh.

Wraps the single-chip TDM train step with explicit shardings:
- target/sequence batches sharded on 'data' (per-device sub-batch; gradient
  mean-psum is emitted by sharded autodiff — the reference's hand-rolled
  slice reduction, tdm LocalOptimizer.scala:164-187, becomes implicit);
- embedding/node tables row-sharded on 'model' (north-star P3);
- Adam moments inherit the parameter sharding (P2).

The embedding row count must be padded to a multiple of the 'model' axis; use
:func:`padded_num_index`.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from dismember_tpu.core import mesh as meshlib
from dismember_tpu.models.losses import bce_with_logits


def padded_num_index(num_index: int, mesh) -> int:
    return meshlib.round_up(num_index, mesh.shape[meshlib.MODEL_AXIS])


def pad_embedding_rows(params, mesh):
    """Zero-pad the embedding table's rows to a 'model'-axis multiple so it
    row-shards evenly (padding rows are never addressed: codes < num_index)."""
    import jax.numpy as jnp

    emb = params["embedding"]
    target = meshlib.round_up(emb.shape[0], mesh.shape[meshlib.MODEL_AXIS])
    if target == emb.shape[0]:
        return params
    out = dict(params)
    out["embedding"] = jnp.pad(emb, ((0, target - emb.shape[0]), (0, 0)))
    return out


def make_sharded_beam_fn(
    forward,
    tree,
    beam: int,
    mesh,
    params,
    precompute=None,
    apply=None,
):
    """Serving over the mesh: query batch sharded on 'data', the node/item
    embedding table row-sharded on 'model' (north-star P3).  GSPMD lays the
    frontier's arbitrary-row gathers onto ICI collectives (all-to-all style
    exchange between table shards).  Returns (beam_fn, sharded_params);
    the batch size must divide the 'data' axis.

    Small/mid-catalog path only: ``node_meta`` ([V, 2] f32) is REPLICATED
    here, which at deep catalogs is exactly the narrow-table relayout
    pathology the packed pair table was built to kill (a [2M, 2] copy costs
    ~3.6ms — CLAUDE.md).  Deep catalogs serve through
    :func:`make_sharded_packed_beam_fn`, whose 128-lane pair rows fold the
    metadata lanes in and row-shard with the table.
    """
    from jax.sharding import NamedSharding

    from dismember_tpu.retrieval.tree_beam import beam_search_batch, make_config

    params = pad_embedding_rows(params, mesh)
    pspec = meshlib.param_spec(params)
    pshard = meshlib.shard_like(pspec, mesh)
    params = jax.device_put(params, pshard)
    bshard = NamedSharding(mesh, meshlib.batch_spec())
    rep = NamedSharding(mesh, P())
    cfg = make_config(tree, beam)
    import jax.numpy as jnp

    node_meta = jax.device_put(jnp.asarray(tree.node_meta), rep)

    @functools.partial(
        jax.jit,
        in_shardings=(pshard, bshard, rep),
        out_shardings=(bshard, bshard),
    )
    def run(p, seq_codes, meta):
        return beam_search_batch(
            forward, p, seq_codes, meta, cfg,
            precompute=precompute, apply=apply,
        )

    return (lambda p, seq_codes: run(p, seq_codes, node_meta)), params


def make_sharded_packed_beam_fn(
    packed,
    mesh,
    precompute,
    apply_from_emb,
    max_contract_rows: int = 8192,
):
    """Deep-catalog serving over the mesh: the packed pair table row-sharded
    on 'model' (at depth the pair table IS the node-embedding table —
    north-star P3; 4GB at 10M items), query batch sharded on 'data', scorer
    params + the small contraction prefix replicated.  GSPMD lowers the
    per-level frontier row gathers from the sharded table to masked partial
    gathers + a psum across table shards over ICI.

    Returns a ``(params, seq_codes) -> (ids, scores)`` closure with the
    same results as :func:`retrieval.packed_beam.make_hybrid_beam_fn`.
    """
    import jax.numpy as jnp

    from dismember_tpu.retrieval.packed_beam import (
        _n_contract_levels,
        beam_search_hybrid,
    )

    cfg, e = packed.cfg, packed.embed_size
    n_model = mesh.shape[meshlib.MODEL_AXIS]
    table = packed.pair_table
    pad = (-table.shape[0]) % n_model
    if pad:
        # zero rows carry exists=0 lanes: dead rows, masked at query time
        table = jnp.pad(table, ((0, pad), (0, 0)))
    tshard = NamedSharding(mesh, P(meshlib.MODEL_AXIS, None))
    table = jax.device_put(table, tshard)

    n_contract = _n_contract_levels(cfg, max_contract_rows)
    if n_contract > 0:
        prefix_rows = min(
            packed.pair_table.shape[0],
            (1 << (cfg.start_level + n_contract)) - 1,
        )
        prefix = packed.pair_table[:prefix_rows, : 2 * e + 2].astype(
            jnp.float32
        )
    else:
        prefix = jnp.zeros((1, 2 * e + 2), jnp.float32)
    rep = NamedSharding(mesh, P())
    prefix = jax.device_put(prefix, rep)
    bshard = NamedSharding(mesh, meshlib.batch_spec())

    @functools.partial(
        jax.jit,
        in_shardings=(rep, bshard, tshard, rep),
        out_shardings=(bshard, bshard),
    )
    def run(params, seq_codes, pair_table, contract_prefix):
        return beam_search_hybrid(
            apply_from_emb, params, seq_codes, pair_table, e, cfg,
            precompute, max_contract_rows=max_contract_rows,
            contract_prefix=contract_prefix,
        )

    return lambda params, seq_codes: run(params, seq_codes, table, prefix)


def is_deep_catalog(tree, beam: int) -> bool:
    """The packed-table serving threshold (same rule as
    ``serving.TDMServing._use_packed``): trees of ``max_level >= 8`` with at
    least one scored level below the beam's start level must serve through
    the packed pair-table path — at depth the replicated ``node_meta`` of
    :func:`make_sharded_beam_fn` is exactly the narrow-table relayout
    pathology the pair table was built to kill (CLAUDE.md: a [2M, 2] f32
    copy costs ~3.6ms/dispatch)."""
    from dismember_tpu.retrieval.tree_beam import make_config

    cfg = make_config(tree, beam)
    return tree.max_level >= 8 and cfg.max_level - cfg.start_level >= 1


def make_sharded_tree_serving_fn(
    model_type: str,
    params,
    tree,
    beam: int,
    mesh,
    max_contract_rows: int = 8192,
):
    """Mesh serving for TDM/OTM-style tree beams with the deep-catalog
    routing applied (Recommender.scala:40-107 semantics): catalogs above
    :func:`is_deep_catalog`'s threshold go through
    :func:`make_sharded_packed_beam_fn` (row-sharded 128-lane pair table,
    metadata folded into the rows); small catalogs keep the classic
    :func:`make_sharded_beam_fn` (replicated [V, 2] node_meta — fine when V
    is tiny, pathological at depth).  Returns (beam_fn, route) where route
    is "packed" or "classic" and beam_fn(seq_codes) -> (ids, scores).
    """
    from dismember_tpu.train.tdm import (
        MATMUL_FIRST_SCORERS,
        packed_fns,
        serving_fns,
    )

    if is_deep_catalog(tree, beam):
        from dismember_tpu.retrieval.packed_beam import (
            PackedTree,
            build_pair_table,
        )
        from dismember_tpu.retrieval.tree_beam import make_config

        pre, app_emb = packed_fns(model_type)
        table = build_pair_table(
            params["embedding"], tree.node_exists, tree.node_id,
            tree.total_codes,
        )
        packed = PackedTree(
            pair_table=table,
            embed_size=int(params["embedding"].shape[1]),
            cfg=make_config(tree, beam),
        )
        fn = make_sharded_packed_beam_fn(
            packed, mesh, pre, app_emb,
            max_contract_rows=(
                max_contract_rows
                if model_type in MATMUL_FIRST_SCORERS
                else 0
            ),
        )
        rep = NamedSharding(mesh, P())
        rep_params = jax.device_put(params, jax.tree.map(lambda _: rep, params))
        return (lambda seq_codes: fn(rep_params, seq_codes)), "packed"

    pre, app = serving_fns(model_type)
    from dismember_tpu.models import deepfm as _deepfm, din as _din

    fwd = {"din": _din, "deepfm": _deepfm}[model_type].forward
    fn, sh_params = make_sharded_beam_fn(
        fwd, tree, beam, mesh, params, precompute=pre, apply=app
    )
    return (lambda seq_codes: fn(sh_params, seq_codes)), "classic"


def make_sharded_forward(forward, mesh, params):
    """Batched scoring over the mesh — JTM's aggregateWeights pass (SURVEY
    P5, jtm/.../optim/TreeLearning.scala:152-174): score rows sharded on
    'data', the node-embedding table row-sharded on 'model' (GSPMD lowers
    the chain-code gathers to masked partial gathers + psum over ICI).

    Returns (fn(params, codes [R, C], seqs [R, L]) -> logits [R, C],
    sharded_params); R must divide by the 'data' axis.
    """
    params = pad_embedding_rows(params, mesh)
    pspec = meshlib.param_spec(params)
    pshard = meshlib.shard_like(pspec, mesh)
    params = jax.device_put(params, pshard)
    bshard = NamedSharding(mesh, P(meshlib.DATA_AXIS, None))
    run = jax.jit(
        forward,
        in_shardings=(pshard, bshard, bshard),
        out_shardings=bshard,
    )
    return run, params


def make_sharded_otm_train_batch(trainer, mesh):
    """OTM's whole-batch dispatch (pseudo targets + frozen-model beam
    trajectory + the per-level lax.scan of sequential BCE+Adam steps,
    otm/.../optim/LocalOptimizer.scala:55-130) pjit over the mesh: batch
    sharded on 'data', node table row-sharded on 'model', Adam moments
    inheriting the parameter sharding.

    Returns (step_fn, sharded_params, sharded_opt_state) with the same
    signature as ``trainer._train_batch``.  Sparse trainers route to
    :func:`~dismember_tpu.train.spmd_sparse.make_sharded_sparse_otm_train_batch`
    (scan-carried row-sharded table + lazy-Adam state), so 10M-item OTM
    trains sharded at sparse speed (117 ms/batch vs dense 555, BASELINE.md).
    """
    if trainer._sparse:
        from dismember_tpu.train.spmd_sparse import (
            make_sharded_sparse_otm_train_batch,
        )

        return make_sharded_sparse_otm_train_batch(trainer, mesh)
    import jax.numpy as jnp

    old_rows = trainer.params["embedding"].shape[0]
    params = pad_embedding_rows(trainer.params, mesh)
    pad = params["embedding"].shape[0] - old_rows

    def pad_moment(leaf):
        # Adam moments matching the old table pad with zero rows (padding
        # rows are never touched, so zero moments = exact continuation)
        if getattr(leaf, "shape", None) == (old_rows, params["embedding"].shape[1]):
            return jnp.pad(leaf, ((0, pad), (0, 0)))
        return leaf

    opt_state = (
        jax.tree.map(pad_moment, trainer.opt_state) if pad else trainer.opt_state
    )
    pspec = meshlib.param_spec(params)
    pshard = meshlib.shard_like(pspec, mesh)
    params = jax.device_put(params, pshard)
    ospec = meshlib.opt_state_spec(opt_state, pspec, params)
    oshard = meshlib.shard_like(ospec, mesh)
    opt_state = jax.device_put(opt_state, oshard)
    bshard = NamedSharding(mesh, P(meshlib.DATA_AXIS, None))
    rep = NamedSharding(mesh, P())
    step = jax.jit(
        trainer._train_batch_impl,
        in_shardings=(pshard, oshard, bshard, bshard),
        out_shardings=(pshard, oshard, rep),
        donate_argnums=(0, 1),
    )
    return step, params, opt_state


def make_sharded_train_step(
    forward: Callable,
    sampler,
    optimizer: optax.GradientTransformation,
    mesh,
    params: Any,
    opt_state: Any,
):
    """Build (step_fn, sharded_params, sharded_opt_state).

    step_fn(params, opt_state, key, target_codes [B], seq_codes [B, L])
      -> (params, opt_state, loss); B must divide by the 'data' axis size.
    """
    pspec = meshlib.param_spec(params)
    pshard = meshlib.shard_like(pspec, mesh)
    params = jax.device_put(params, pshard)
    ospec = meshlib.opt_state_spec(opt_state, pspec, params)
    oshard = meshlib.shard_like(ospec, mesh)
    opt_state = jax.device_put(opt_state, oshard)
    bshard = NamedSharding(mesh, meshlib.batch_spec())
    rshard = NamedSharding(mesh, P())
    # replicate explicitly: under multi-process execution every jit input
    # must be a global array (uncommitted host arrays are rejected)
    sampler_state = jax.device_put(sampler.device_state(), rshard)
    sstate_shard = jax.tree.map(lambda _: rshard, sampler_state)

    @functools.partial(
        jax.jit,
        in_shardings=(pshard, oshard, rshard, bshard, bshard, sstate_shard),
        out_shardings=(pshard, oshard, rshard),
        donate_argnums=(0, 1),
    )
    def step(p, o, key, target_codes, seq_codes, sstate):
        codes, labels, weights = sampler.sample(key, target_codes, sstate)

        def loss_fn(pp):
            logits = forward(pp, codes, seq_codes)
            return bce_with_logits(logits, labels, weights)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, new_o = optimizer.update(grads, o, p)
        new_p = optax.apply_updates(p, updates)
        return new_p, new_o, loss

    def run(p, o, key, target_codes, seq_codes):
        return step(p, o, key, target_codes, seq_codes, sampler_state)

    return run, params, opt_state
