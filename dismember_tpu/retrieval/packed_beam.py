"""Packed pair-row beam search — the deep-catalog serving loop.

Semantics parity with the classic loop (retrieval/tree_beam.py, mirroring
tdm/.../model/Recommender.scala:40-216): identical frontiers, scores and
returned items; only the memory layout differs.

Motivation (profiler-measured on v5e, 1M-item catalog): the classic level
body pays three pathological HBM costs per level —
  1. a ~3.4ms row gather of child embeddings out of the [total_codes, E]
     table,
  2. a second gather of the same rows for ``node_meta`` (exists, id),
  3. a ~3.6ms whole-table copy of ``node_meta`` [total_codes, 2] whose
     2-lane rows are padded to 128 lanes (64x traffic blowup).

The fix is one table with one gather: ``pair_table[c]`` packs everything the
beam needs about BOTH children of internal code c into a single float32 row

    [ emb(2c+1) | emb(2c+2) | exists(2c+1), exists(2c+2),
      idhi(2c+1), idlo(2c+1), idhi(2c+2), idlo(2c+2) | 0-pad to 128k lanes ]

Ids are stored as exact hi/lo float pairs (id = hi*4096 + lo): a raw int32
bit-cast would put small ids in the f32 denormal range, and the TPU flushes
denormals to zero inside fused arithmetic — measured to silently corrupt the
id lanes when XLA fuses the gather.  The row is zero-padded up to a multiple
of 128 lanes: XLA's row-gather throughput is strongly width-dependent
(measured on v5e: 36-wide rows gather at ~45ns/row, 128-wide at ~9ns/row)
and HBM tiling pads the minor dim to 128 lanes anyway, so the padding is
free in memory and ~5x faster to gather.

Because children of consecutive parents are consecutive heap codes, the
embedding half is a pure reshape of ``embedding[1 : 2*n_pairs + 1]`` — the
table builds on device in one fused program, cheap enough to refresh after
every training round.  Per level the loop does ONE [B, beam]-row gather
(half the descriptors of the classic path), and the scorer consumes the
gathered embeddings directly (``apply_from_emb``) instead of re-gathering
them by code.

Note on bit-parity: the classic and packed jit programs compile to different
fusions, so scores can differ in the last ulp and (rarely) flip the order of
near-tied candidates; tests therefore compare scores, not id order, at
depth.  The eager level bodies are bit-identical.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from dismember_tpu.index.arraytree import ArrayTree
from dismember_tpu.retrieval.tree_beam import TreeBeamConfig, make_config, onehot_select

_NEG_INF = jnp.float32(-3.4e38)
_ID_SPLIT = 4096.0  # id = hi * 4096 + lo, both halves exact in f32


def _encode_ids(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    hi = np.floor_divide(ids, 4096)
    lo = ids - 4096 * hi
    return hi.astype(np.float32), lo.astype(np.float32)


@dataclasses.dataclass(frozen=True)
class PackedTree:
    """Device-side packed pair table + the beam config it serves."""

    pair_table: jnp.ndarray  # [n_pairs, row_width] float32
    embed_size: int
    cfg: TreeBeamConfig


def build_pair_table(
    embedding: jnp.ndarray,  # [total_codes(+), E] node-code embedding table
    node_exists: np.ndarray,  # [total_codes] bool (host)
    node_id: np.ndarray,  # [total_codes] int32 (host)
    total_codes: int,
) -> jnp.ndarray:
    """One fused device program: reshape-slice the embedding halves and
    concatenate exists/id lanes.  n_pairs = (total_codes - 1) // 2 rows —
    every internal heap slot, existing or not (dead rows are masked by their
    exists lanes at query time)."""
    n_pairs = (total_codes - 1) // 2
    e = embedding.shape[1]
    used = 2 * e + 6
    row_width = ((used + 127) // 128) * 128

    child_exists = np.asarray(
        node_exists[1 : 2 * n_pairs + 1], np.float32
    ).reshape(n_pairs, 2)
    hi, lo = _encode_ids(np.asarray(node_id[1 : 2 * n_pairs + 1], np.int64))
    id_lanes = np.stack(
        [hi[0::2], lo[0::2], hi[1::2], lo[1::2]], axis=1
    )  # [n_pairs, 4]: hi_l, lo_l, hi_r, lo_r

    @jax.jit
    def build(emb, cex, cid):
        pairs = emb[1 : 2 * n_pairs + 1].astype(jnp.float32)
        pairs = pairs.reshape(n_pairs, 2 * e)
        pad = jnp.zeros((n_pairs, row_width - used), jnp.float32)
        return jnp.concatenate([pairs, cex, cid, pad], axis=1)

    return build(embedding, jnp.asarray(child_exists), jnp.asarray(id_lanes))


def make_packed_tree(tree: ArrayTree, embedding: jnp.ndarray, beam: int) -> PackedTree:
    cfg = make_config(tree, beam)
    if cfg.max_level - cfg.start_level < 1:
        raise ValueError(
            "packed beam needs at least one level below the start level; "
            "use the classic loop for trees this small"
        )
    table = build_pair_table(
        embedding, tree.node_exists, tree.node_id, tree.total_codes
    )
    return PackedTree(pair_table=table, embed_size=int(embedding.shape[1]), cfg=cfg)


def beam_search_packed(
    apply_from_emb: Callable[..., jnp.ndarray],
    params,
    seq_codes: jnp.ndarray,  # [B, L]
    pair_table: jnp.ndarray,  # [n_pairs, row_width]
    embed_size: int,
    cfg: TreeBeamConfig,
    precompute: Callable,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (leaf item ids [B, 2*beam] int32, scores [B, 2*beam]).

    Same contract as tree_beam.beam_search_batch: non-existent leaves carry
    id -1 and score -inf.
    """
    b = seq_codes.shape[0]
    beam = cfg.beam
    width = 2 * beam
    e = embed_size
    n_pairs = pair_table.shape[0]

    ctx = precompute(params, seq_codes)

    frontier = jnp.broadcast_to(
        jnp.asarray(cfg.start_codes_padded, dtype=jnp.int32), (b, width)
    )
    valid = frontier >= 0
    scores = jnp.where(valid, 0.0, _NEG_INF).astype(jnp.float32)
    # id lanes (hi, lo) of the current frontier; only read at the bottom
    ids_hilo = jnp.full((b, width, 2), -1.0, jnp.float32)
    ids_hilo = ids_hilo.at[:, :, 1].set(4095.0)  # (-1, 4095) decodes to -1

    def level_body(carry, _):
        frontier, scores, _ids = carry
        top_scores, top_idx = jax.lax.top_k(scores, beam)  # [B, beam]
        top_codes = onehot_select(frontier, top_idx)  # [B, beam]
        top_alive = top_scores > _NEG_INF / 2
        # ONE gather: everything about both children of each top node
        rows = pair_table[jnp.clip(top_codes, 0, n_pairs - 1)]
        emb = rows[..., : 2 * e].reshape(b, width, e)
        exists = rows[..., 2 * e : 2 * e + 2].reshape(b, width) > 0
        child_hilo = rows[..., 2 * e + 2 : 2 * e + 6].reshape(b, width, 2)
        alive = exists & jnp.repeat(top_alive, 2, axis=1)
        children = jnp.stack(
            [2 * top_codes + 1, 2 * top_codes + 2], axis=-1
        ).reshape(b, width)
        logits = apply_from_emb(params, emb, ctx)
        return (children, jnp.where(alive, logits, _NEG_INF), child_hilo), None

    n_levels = cfg.max_level - cfg.start_level
    (frontier, scores, ids_hilo), _ = jax.lax.scan(
        level_body, (frontier, scores, ids_hilo), None, length=n_levels
    )

    ids = (
        ids_hilo[..., 0].astype(jnp.int32) * 4096
        + ids_hilo[..., 1].astype(jnp.int32)
    )
    leaf_ok = scores > _NEG_INF / 2
    return jnp.where(leaf_ok, ids, -1), scores


def make_packed_beam_fn(
    packed: PackedTree,
    precompute: Callable,
    apply_from_emb: Callable,
) -> Callable:
    """Build a jitted ``(params, seq_codes) -> (item_ids, scores)`` closure.

    The pair table is an explicit jit argument (not a closure constant) so
    large catalogs don't bake hundreds of MB into the serialized program.
    """
    cfg = packed.cfg
    e = packed.embed_size

    @jax.jit
    def run(params, seq_codes, table):
        return beam_search_packed(
            apply_from_emb, params, seq_codes, table, e, cfg, precompute
        )

    return lambda params, seq_codes: run(params, seq_codes, packed.pair_table)
