"""Row-sharded Deep Retrieval: pmv tables + E-step + serving over the mesh.

DR's item-scaled tables — the layer-model shared embedding
([num_items + K*(D-1), E]), the rerank item embedding ([num_items, E]) and
the rerank softmax projection ([num_items, E+1] w|bias) — are the largest
arrays in the project (reference keeps them replicated per thread clone:
deep-retrieval/.../model/LayerModel.scala:24-27, RerankModel.scala:9-100).
This module row-shards all three on 'model' in their packed p|m|v form
(train/sparse_adam.py), with the same shard-local update discipline as
train/spmd_sparse.py:

- forward row gathers: masked local gather + psum('model') — exact (each
  row owned by one shard, others contribute f32 zeros);
- row updates: (codes, row-grad) all-gathered over 'data' in single-device
  flat order, then each shard runs sparse_adam.pmv_apply_rows on exactly the
  rows it owns (its slice of the stacked packed table, scratch row and all);
- dense tower (heads / linear) replicated, grads psum-meaned over 'data'.

The stacked-pmv format: shard k's packed table occupies rows
[k*phys, (k+1)*phys) of a [n_model*phys, 128] array sharded P('model',);
each shard's slice is a self-contained packed table for logical rows
[k*v_shard, (k+1)*v_shard) with its own sacrificial scratch row.

With the batch unsharded (a (1, N) mesh) the steps are bit-identical to the
single-chip pmv steps (tests/test_spmd_dr.py).  Per-data-shard negative
sampling streams use fold_in(key, data_index), like train/spmd_sparse.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dismember_tpu.core.mesh import DATA_AXIS, MODEL_AXIS, round_up
from dismember_tpu.models import dr_models
from dismember_tpu.train import sparse_adam
from dismember_tpu.train.spmd_sparse import allgather_rows, localize_codes

P = jax.sharding.PartitionSpec


# ---------------------------------------------------------------------------
# stacked (per-shard) pmv format
# ---------------------------------------------------------------------------


def pmv_sharded_rows(v_rows: int, embed_dim: int, n_model: int) -> int:
    """Row count padded so each 'model' shard's rows slot-pack cleanly."""
    s = sparse_adam.pmv_slots(embed_dim)
    if s == 0:
        raise ValueError(f"width {embed_dim} does not pack p|m|v")
    return round_up(v_rows, n_model * s)


def _geometry(v_pad: int, e: int, n_model: int):
    s = sparse_adam.pmv_slots(e)
    per = 128 // s
    v_shard = v_pad // n_model
    phys = v_shard // s + 1  # + scratch row per shard
    return s, per, v_shard, phys


def pmv_init_sharded(table: jnp.ndarray, n_model: int) -> dict:
    """[V, E] params -> stacked per-shard packed state with zero moments.

    Unlike sparse_adam.pmv_init this does NOT donate/consume anything; built
    by pure reshapes (pad rows, pad each slot's lanes to per with zeros =
    zero moments)."""
    v, e = table.shape
    v_pad = pmv_sharded_rows(v, e, n_model)
    s, per, v_shard, phys = _geometry(v_pad, e, n_model)
    tb = jnp.pad(table.astype(jnp.float32), ((0, v_pad - v), (0, per - e)))
    body = tb.reshape(n_model, phys - 1, s * per).astype(jnp.float32)
    out = jnp.concatenate(
        [body, jnp.zeros((n_model, 1, 128), jnp.float32)], axis=1
    ).reshape(n_model * phys, 128)
    return {"pmv": out, "count": jnp.zeros((), jnp.int32)}


def pmv_unpack_sharded(state: dict, v_rows: int, e: int, n_model: int):
    """Stacked packed state -> [V, E] param mirror (drops scratch rows)."""
    pmv = state["pmv"]
    phys = pmv.shape[0] // n_model
    s = sparse_adam.pmv_slots(e)
    per = 128 // s
    body = pmv.reshape(n_model, phys, 128)[:, :-1]
    vals = body.reshape(n_model * (phys - 1) * s, per)[:, :e]
    return vals[:v_rows]


def pmv_refresh_sharded(state: dict, table: jnp.ndarray, n_model: int) -> dict:
    """Overwrite p lanes from ``table``, keeping moments and count (the
    sharded analogue of sparse_adam.pmv_refresh; nothing donated)."""
    v, e = table.shape
    v_pad = pmv_sharded_rows(v, e, n_model)
    s, per, v_shard, phys = _geometry(v_pad, e, n_model)
    tb = jnp.pad(table.astype(jnp.float32), ((0, v_pad - v), (0, 0)))
    new_p = tb.reshape(n_model, phys - 1, s, e)
    old = state["pmv"].reshape(n_model, phys, 128)
    body = old[:, :-1].reshape(n_model, phys - 1, s, per)
    merged = jnp.concatenate([new_p, body[..., e:]], axis=-1)
    out = jnp.concatenate(
        [merged.reshape(n_model, phys - 1, 128), old[:, -1:]], axis=1
    ).reshape(n_model * phys, 128)
    return {"pmv": out, "count": state["count"]}


def pmv_gather_sharded(pmv_shard, codes, valid, v_shard: int, e: int):
    """Distributed pmv row gather inside shard_map: [R, E] f32 params,
    zeros where ``~valid`` (exact: one owner per row + psum of zeros)."""
    off = jax.lax.axis_index(MODEL_AXIS) * v_shard
    loc = codes - off
    mine = (loc >= 0) & (loc < v_shard) & valid
    rows = sparse_adam.pmv_gather(pmv_shard, jnp.where(mine, loc, 0), e)
    rows = rows * mine[:, None].astype(rows.dtype)
    return jax.lax.psum(rows, MODEL_AXIS)


def _pmv_local_apply(pmv_shard_state, flat_all, g_all, lr, v_shard):
    local = localize_codes(flat_all, v_shard)
    return sparse_adam.pmv_apply_rows(pmv_shard_state, local, g_all, lr)


# ---------------------------------------------------------------------------
# sharded E-step (layer + rerank)
# ---------------------------------------------------------------------------


def make_sharded_dr_steps(trainer, mesh):
    """Build sharded pmv layer/rerank steps for a DRTrainer.

    Returns (layer_step, rerank_step, layer_opt_state, rerank_opt_state,
    geometry) where the opt states hold stacked-pmv tables device_put on the
    mesh.  Step signatures match the trainer's pmv impls:

      layer_step(heads_params, (heads_opt, emb_state), seqs, paths)
      rerank_step(rest, (rest_opt, emb_state, wb_state), key, seqs, labels)

    seqs/paths/labels are sharded on 'data' (B divisible by the data axis).
    """
    from jax.sharding import NamedSharding

    n_model = mesh.shape[MODEL_AXIS]
    e = trainer._embed_size
    num_items = trainer.data.num_items
    num_nodes = trainer.num_nodes
    num_layers = trainer.num_layers
    lr = trainer.learning_rate
    layer_opt = trainer.layer_opt
    rerank_opt = trainer.rerank_opt
    num_sampled = trainer.num_sampled
    emb_rows = num_items + num_nodes * (num_layers - 1)

    v1 = pmv_sharded_rows(emb_rows, e, n_model)
    v2 = pmv_sharded_rows(num_items, e, n_model)
    v3 = pmv_sharded_rows(num_items, e + 1, n_model)
    vs1, vs2, vs3 = v1 // n_model, v2 // n_model, v3 // n_model

    rep = NamedSharding(mesh, P())
    rowsh = NamedSharding(mesh, P(MODEL_AXIS, None))

    def put_state(st):
        return {
            "pmv": jax.device_put(st["pmv"], rowsh),
            "count": jax.device_put(st["count"], rep),
        }

    layer_emb = put_state(
        pmv_init_sharded(
            jnp.pad(
                trainer.layer_params["embedding"],
                ((0, v1 - emb_rows), (0, 0)),
            ),
            n_model,
        )
    )
    rerank_emb = put_state(
        pmv_init_sharded(
            jnp.pad(
                trainer.rerank_params["embedding"],
                ((0, v2 - num_items), (0, 0)),
            ),
            n_model,
        )
    )
    wb = jnp.concatenate(
        [
            trainer.rerank_params["softmax_w"],
            trainer.rerank_params["softmax_b"][:, None],
        ],
        axis=1,
    )
    rerank_wb = put_state(
        pmv_init_sharded(jnp.pad(wb, ((0, v3 - num_items), (0, 0))), n_model)
    )

    heads = {"heads": trainer.layer_params["heads"]}
    heads_opt_state = layer_opt.init(heads)
    layer_opt_state = (heads_opt_state, layer_emb)
    rest = {"linear": trainer.rerank_params["linear"]}
    rest_opt_state = rerank_opt.init(rest)
    rerank_opt_state = (rest_opt_state, rerank_emb, rerank_wb)

    st_spec = {"pmv": P(MODEL_AXIS, None), "count": P()}
    bspec = P(DATA_AXIS)

    # --- layer step ------------------------------------------------------
    def layer_impl(heads_p, heads_opt, emb_st, seqs, paths):
        n_data = jax.lax.psum(1, DATA_AXIS)
        b, l = seqs.shape
        j = paths.shape[1]
        nd = num_layers - 1
        offsets = num_items + jnp.arange(
            max(nd, 1), dtype=paths.dtype
        ) * num_nodes
        prefix_ids = (paths[:, :, :nd] + offsets[:nd]).reshape(-1)
        flat = jnp.concatenate([seqs.reshape(-1), prefix_ids])
        valid = flat >= 0
        rows = pmv_gather_sharded(
            emb_st["pmv"], jnp.where(valid, flat, 0), valid, vs1, e
        )

        def loss_fn(rows_in, heads_in):
            seq_e = rows_in[: b * l].reshape(b, l, -1)
            prefix_e = rows_in[b * l :].reshape(b, j, nd, -1)
            logits = dr_models.layer_logits_from_emb(
                heads_in["heads"], seq_e, prefix_e, num_nodes
            )
            losses = []
            for d in range(num_layers):
                lf = logits[d].reshape(-1, num_nodes)
                from dismember_tpu.models.losses import cross_entropy

                losses.append(cross_entropy(lf, paths[:, :, d].reshape(-1)))
            losses = jnp.stack(losses)
            return jnp.sum(losses) / n_data, losses

        (_, losses), (g_rows, g_heads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(rows, heads_p)
        losses = jax.lax.psum(losses, DATA_AXIS) / n_data
        g_heads = jax.tree.map(
            lambda g: jax.lax.psum(g, DATA_AXIS), g_heads
        )
        updates, new_heads_opt = layer_opt.update(g_heads, heads_opt, heads_p)
        new_heads = optax.apply_updates(heads_p, updates)
        g_rows = g_rows * valid[:, None].astype(g_rows.dtype)
        ns = b * l
        flat_all, g_all = allgather_rows(
            [(flat[:ns], g_rows[:ns]), (flat[ns:], g_rows[ns:])]
        )
        new_emb = _pmv_local_apply(emb_st, flat_all, g_all, lr, vs1)
        return new_heads, new_heads_opt, new_emb, losses

    layer_sh = jax.jit(
        jax.shard_map(
            layer_impl,
            mesh=mesh,
            in_specs=(
                jax.tree.map(lambda _: P(), heads),
                jax.tree.map(lambda _: P(), heads_opt_state),
                st_spec, P(DATA_AXIS, None), P(DATA_AXIS, None, None),
            ),
            out_specs=(
                jax.tree.map(lambda _: P(), heads),
                jax.tree.map(lambda _: P(), heads_opt_state),
                st_spec, P(),
            ),
            check_vma=False,
        ),
        donate_argnums=(1, 2),
    )

    def layer_step(heads_params, opt_state, seqs, paths):
        heads_opt, emb_st = opt_state
        nh, nho, nemb, losses = layer_sh(
            heads_params, heads_opt, emb_st, seqs, paths
        )
        return nh, (nho, nemb), losses

    # --- rerank step -----------------------------------------------------
    def rerank_impl(rest_p, rest_opt, emb_st, wb_st, key, seqs, labels):
        n_data = jax.lax.psum(1, DATA_AXIS)
        b, l = seqs.shape
        sub = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        negs = dr_models.sample_negatives(sub, labels, num_items, num_sampled)
        cand = jnp.concatenate(
            [labels[:, None].astype(negs.dtype), negs], axis=1
        )
        seq_flat = seqs.reshape(-1)
        seq_valid = seq_flat >= 0
        erows = pmv_gather_sharded(
            emb_st["pmv"], jnp.where(seq_valid, seq_flat, 0), seq_valid,
            vs2, e,
        )
        cand_flat = cand.reshape(-1)
        wbrows = pmv_gather_sharded(
            wb_st["pmv"], cand_flat, jnp.ones_like(cand_flat, bool),
            vs3, e + 1,
        ).reshape(b, cand.shape[1], e + 1)

        def loss_fn(erows_in, wbrows_in, rest_in):
            flat = erows_in.reshape(b, -1)
            vec = (
                flat @ rest_in["linear"]["weight"].T
                + rest_in["linear"]["bias"]
            )
            logits = (
                jnp.einsum("be,bse->bs", vec, wbrows_in[..., :e])
                + wbrows_in[..., e]
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(logp[:, 0]) / n_data

        loss_local, (g_e, g_wb, g_rest) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2)
        )(erows, wbrows, rest_p)
        loss = jax.lax.psum(loss_local, DATA_AXIS)
        g_rest = jax.tree.map(lambda g: jax.lax.psum(g, DATA_AXIS), g_rest)
        updates, new_rest_opt = rerank_opt.update(g_rest, rest_opt, rest_p)
        new_rest = optax.apply_updates(rest_p, updates)
        g_e = g_e * seq_valid[:, None].astype(g_e.dtype)
        flat_all, ge_all = allgather_rows([(seq_flat, g_e)])
        new_emb = _pmv_local_apply(emb_st, flat_all, ge_all, lr, vs2)
        cand_all, gwb_all = allgather_rows(
            [(cand_flat, g_wb.reshape(-1, e + 1))]
        )
        new_wb = _pmv_local_apply(wb_st, cand_all, gwb_all, lr, vs3)
        return new_rest, new_rest_opt, new_emb, new_wb, loss

    rerank_sh = jax.jit(
        jax.shard_map(
            rerank_impl,
            mesh=mesh,
            in_specs=(
                jax.tree.map(lambda _: P(), rest),
                jax.tree.map(lambda _: P(), rest_opt_state),
                st_spec, st_spec, P(), P(DATA_AXIS, None), bspec,
            ),
            out_specs=(
                jax.tree.map(lambda _: P(), rest),
                jax.tree.map(lambda _: P(), rest_opt_state),
                st_spec, st_spec, P(),
            ),
            check_vma=False,
        ),
        donate_argnums=(1, 2, 3),
    )

    def rerank_step(rest_params, opt_state, key, seqs, labels):
        rest_opt, emb_st, wb_st = opt_state
        nr, nro, nemb, nwb, loss = rerank_sh(
            rest_params, rest_opt, emb_st, wb_st, key, seqs, labels
        )
        return nr, (nro, nemb, nwb), loss

    geometry = {"v1": v1, "v2": v2, "v3": v3, "n_model": n_model}
    return layer_step, rerank_step, layer_opt_state, rerank_opt_state, geometry


# ---------------------------------------------------------------------------
# sharded serving: path beam + path-major block rerank over the mesh
# ---------------------------------------------------------------------------


def make_sharded_dr_serving_fn(
    trainer, mesh, beam: int | None = None, topk: int | None = None,
    max_items_per_path: int = 128,
):
    """Sharded analogue of retrieval/dr_serve's block serving: the layer
    embedding, rerank embedding and the path-major block rerank table
    row-shard on 'model'; the query batch shards on 'data'.  Block rows are
    fetched with the same masked-gather + psum exchange as the train-side
    lookups (bf16-exact: one shard owns each row, the rest contribute
    zeros).  The beam search itself runs on replicated state — its only
    item-scaled input is the per-layer sequence contribution, computed here
    from the sharded table.

    Values are read from the trainer's synced param mirrors (same contract
    as make_dr_serving_fn, which also rebuilds its frozen tables per call).
    Returns ``fn(layer_params, rerank_params, seqs, consumed=None)`` with
    results identical to the unsharded block path, or None when the dense
    path table doesn't fit.
    """
    from jax.sharding import NamedSharding

    from dismember_tpu.retrieval.dr_serve import (
        DevicePathMap,
        _block_geometry,
        _build_block_table,
        _build_seq_pack,
        _score_blocks_topk,
        lookup_path_rows,
        pack_path_table,
        path_keys_and_dedup,
    )
    from dismember_tpu.retrieval.path_beam import path_beam_search
    from dismember_tpu.train.spmd_sparse import gather_rows_sharded

    from dismember_tpu.retrieval.dr_serve import _train_frequency_priority

    dmap = DevicePathMap.build(
        trainer.path_index, max_items_per_path,
        item_priority=_train_frequency_priority(trainer),
    )
    if dmap is None:
        return None
    beam = beam or trainer.beam
    k = topk or trainer.topk
    k = min(k, beam * dmap.path_items.shape[1])
    num_items = trainer.data.num_items
    num_nodes = trainer.num_nodes
    num_layers = trainer.num_layers
    e = trainer._embed_size
    j_paths = max(1, int(getattr(trainer, "num_paths", 1)))
    n_model = mesh.shape[MODEL_AXIS]
    geom = _block_geometry(e, dmap.path_items.shape[1])
    if geom is None:
        return None
    planes_n, m_pad = geom

    rep = NamedSharding(mesh, P())
    rowsh = NamedSharding(mesh, P(MODEL_AXIS, None))

    # --- sharded tables (values frozen from the synced mirrors) ----------
    # one bf16 [V, 2E] row-sharded table feeds both the layer seq parts and
    # the rerank user vector — same table (and same bf16 rounding) as the
    # single-device block path (_build_seq_pack), half the gather bytes of
    # the two f32 tables it replaces
    lt = trainer.layer_params["embedding"]
    sp = _build_seq_pack(lt, trainer.rerank_params["embedding"])
    pad1 = (-num_items) % n_model
    seq_table = jax.device_put(jnp.pad(sp, ((0, pad1), (0, 0))), rowsh)
    node_table = jax.device_put(lt[num_items:], rep)  # K*(D-1) rows, tiny
    heads = jax.device_put(trainer.layer_params["heads"], rep)
    linear = jax.device_put(trainer.rerank_params["linear"], rep)

    block_tab = _build_block_table(
        trainer.rerank_params["softmax_w"],
        trainer.rerank_params["softmax_b"],
        np.asarray(dmap.path_items),
        planes_n,
        m_pad,
    )
    n_paths = block_tab.shape[0]
    padp = (-n_paths) % n_model
    if padp:
        # zero rows: valid lanes 0 -> slots masked out at query time
        block_tab = jnp.pad(block_tab, ((0, padp), (0, 0)))
    block_tab = jax.device_put(block_tab, rowsh)
    ps = (n_paths + padp) // n_model
    path_table = jax.device_put(pack_path_table(dmap.path_table), rep)
    l_seq = int(trainer.data.train_seqs.shape[1])

    def serve_impl(seq_tab_s, node_tab, heads_p, linear_p,
                   block_s, ptab, seqs, consumed):
        b = seqs.shape[0]
        flat = seqs.reshape(-1)
        valid = flat >= 0
        safe = jnp.where(valid, flat, 0)
        # ONE gather from the sharded bf16 [V, 2E] pack feeds the layer seq
        # parts (lanes :e) and the rerank user vector (lanes e:)
        srows = gather_rows_sharded(seq_tab_s, safe, valid)  # [b*l, 2E]
        seq_flat = srows[:, :e].reshape(b, l_seq * e)
        seq_parts = [
            seq_flat @ h["weight"][:, : l_seq * e].T for h in heads_p
        ]
        beam_params = {"embedding": node_tab, "heads": heads_p}
        paths, _probs = path_beam_search(
            beam_params, seqs, beam, 0, num_nodes, num_layers,
            seq_parts=seq_parts,
        )
        keys, first = path_keys_and_dedup(paths, num_nodes)
        rows = lookup_path_rows(ptab, keys)  # [b, beam]
        path_ok = (rows >= 0) & first

        # distributed block-row gather (bf16; one owner per row + zeros);
        # kept 2-D [b*beam, width] — 3-D views of block rows materialize
        # physically whenever m_pad < the 128-lane tile (dr_serve notes)
        off = jax.lax.axis_index(MODEL_AXIS) * ps
        loc = rows - off
        mine = (loc >= 0) & (loc < ps) & (rows >= 0)
        blocks = block_s[jnp.where(mine, loc, 0).reshape(-1)]
        blocks = blocks * mine.reshape(-1)[:, None].astype(blocks.dtype)
        blocks = jax.lax.psum(blocks, MODEL_AXIS)

        # user vector from the same packed gather
        user_vec = (
            srows[:, e:].reshape(b, l_seq * e) @ linear_p["weight"].T
            + linear_p["bias"]
        )
        return _score_blocks_topk(
            blocks, path_ok, user_vec, consumed, e, m_pad, k, j_paths,
        )

    rep_spec = P()
    shmapped = jax.shard_map(
        serve_impl,
        mesh=mesh,
        in_specs=(
            P(MODEL_AXIS, None), rep_spec,
            jax.tree.map(lambda _: P(), trainer.layer_params["heads"]),
            jax.tree.map(lambda _: P(), trainer.rerank_params["linear"]),
            P(MODEL_AXIS, None), rep_spec,
            P(DATA_AXIS, None), P(DATA_AXIS, None),
        ),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        check_vma=False,
    )
    jitted = jax.jit(shmapped)

    def fn(layer_params, rerank_params, seqs, consumed=None):
        if consumed is None:
            consumed = jnp.full((seqs.shape[0], 1), -1, jnp.int32)
        return jitted(
            seq_table, node_table, heads, linear,
            block_tab, path_table, seqs, consumed,
        )

    return fn
