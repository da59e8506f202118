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


# id lanes per table dtype: every digit must be an exactly-representable
# integer in the lane dtype.  f32 (24-bit mantissa) takes 2 base-4096 digits
# (top digit <= 2^19 for int32 ids, exact).  bf16 (8-bit mantissa, ints up
# to 256 exact) takes 4 base-256 digits (top digit <= 127 for int32 ids).
_ID_LAYOUT = {
    np.dtype(np.float32): (2, 4096),
    np.dtype(jnp.bfloat16): (4, 256),
}


def _id_layout(dtype) -> tuple[int, int]:
    """(digits per id, base) for a pair-table lane dtype."""
    return _ID_LAYOUT[np.dtype(dtype)]


def _encode_id_digits(ids: np.ndarray, k: int, base: int) -> np.ndarray:
    """[N] int -> [N, k] float32 radix digits; the TOP digit keeps the full
    remaining quotient (and the sign: -1 -> (-1, base-1, ...) which decodes
    back to -1 under the floor-division radix identity)."""
    rem = ids.astype(np.int64)
    digits = []
    for _ in range(k - 1):
        q = np.floor_divide(rem, base)
        digits.append(rem - base * q)
        rem = q
    digits.append(rem)
    return np.stack(digits[::-1], axis=-1).astype(np.float32)


def _decode_id_digits(digits: jnp.ndarray, base: int) -> jnp.ndarray:
    """[..., k] float digit lanes -> [...] exact int32 ids (VPU, elementwise)."""
    acc = digits[..., 0].astype(jnp.int32)
    for i in range(1, digits.shape[-1]):
        acc = acc * base + digits[..., i].astype(jnp.int32)
    return acc


@dataclasses.dataclass(frozen=True)
class PackedTree:
    """Device-side packed pair table + the beam config it serves."""

    pair_table: jnp.ndarray  # [n_pairs, row_width] float32
    embed_size: int
    cfg: TreeBeamConfig


# one-shot pair-table builds above this size go through the chunked path
# (the fused build program's peak working set OOMs ~3x the output size)
_ONE_SHOT_BUILD_BYTES = 1 << 30


def build_pair_table(
    embedding: jnp.ndarray,  # [total_codes(+), E] node-code embedding table
    node_exists: np.ndarray,  # [total_codes] bool (host)
    node_id: np.ndarray,  # [total_codes] int32 (host)
    total_codes: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """One fused device program: reshape-slice the embedding halves and
    concatenate exists/id lanes.  n_pairs = (total_codes - 1) // 2 rows —
    every internal heap slot, existing or not (dead rows are masked by their
    exists lanes at query time).

    ``dtype=jnp.bfloat16`` halves HBM (8.6GB -> 4.3GB at 10M items): emb
    lanes are rounded to bf16 — score-identical on TPU only for scorers
    that consume the candidate embedding exclusively through matmuls (DIN:
    the MXU rounds matmul operands to bf16 anyway; train.tdm.
    MATMUL_FIRST_SCORERS).  DeepFM's FM term is elementwise f32 VPU math
    and DOES see the rounding — serving auto-selection keeps f32 for it.
    exists is 0/1 (exact), and ids are stored as 4 base-256 digits per
    child (every digit an exact bf16 integer)."""
    n_pairs = (total_codes - 1) // 2
    e = embedding.shape[1]
    k, base = _id_layout(dtype)
    used = 2 * e + 2 + 2 * k
    row_width = ((used + 127) // 128) * 128

    child_exists = np.asarray(
        node_exists[1 : 2 * n_pairs + 1], np.float32
    ).reshape(n_pairs, 2)
    digits = _encode_id_digits(
        np.asarray(node_id[1 : 2 * n_pairs + 1], np.int64), k, base
    )  # [2*n_pairs, k]
    id_lanes = np.concatenate(
        [digits[0::2], digits[1::2]], axis=1
    )  # [n_pairs, 2k]: left child digits | right child digits

    out_bytes = n_pairs * row_width * np.dtype(dtype).itemsize
    if out_bytes <= _ONE_SHOT_BUILD_BYTES:
        @jax.jit
        def build(emb, cex, cid):
            pairs = emb[1 : 2 * n_pairs + 1].astype(dtype)
            pairs = pairs.reshape(n_pairs, 2 * e)
            pad = jnp.zeros((n_pairs, row_width - used), dtype)
            return jnp.concatenate(
                [pairs, cex.astype(dtype), cid.astype(dtype), pad], axis=1
            )

        return build(embedding, jnp.asarray(child_exists), jnp.asarray(id_lanes))

    # Chunked build for huge catalogs: the one-shot program's peak working
    # set (input table + sliced pairs + pad + concat output live at once)
    # exceeds HBM around 10M items.  Fill a preallocated buffer in equal
    # donated slices instead — peak = buffer + embedding + one chunk.
    import functools

    n_chunks = max(1, -(-out_bytes // _ONE_SHOT_BUILD_BYTES))
    cs = -(-n_pairs // n_chunks)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(buf, emb, cex, cid, start):
        pairs = jax.lax.dynamic_slice_in_dim(emb, 1 + 2 * start, 2 * cs, 0)
        pairs = pairs.astype(dtype).reshape(cs, 2 * e)
        block = jnp.concatenate(
            [pairs, cex.astype(dtype), cid.astype(dtype)], axis=1
        )
        return jax.lax.dynamic_update_slice(buf, block, (start, 0))

    buf = jnp.zeros((n_pairs, row_width), dtype)
    for i in range(n_chunks):
        # equal-size chunks (one compile); the tail chunk overlap-rewrites
        # rows already written with identical values
        start = min(i * cs, n_pairs - cs)
        buf = fill(
            buf,
            embedding,
            jnp.asarray(child_exists[start : start + cs]),
            jnp.asarray(id_lanes[start : start + cs]),
            start,
        )
    return buf


def make_packed_tree(
    tree: ArrayTree, embedding: jnp.ndarray, beam: int, dtype=jnp.float32
) -> PackedTree:
    cfg = make_config(tree, beam)
    if cfg.max_level - cfg.start_level < 1:
        raise ValueError(
            "packed beam needs at least one level below the start level; "
            "use the classic loop for trees this small"
        )
    table = build_pair_table(
        embedding, tree.node_exists, tree.node_id, tree.total_codes, dtype=dtype
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

    Implemented as :func:`beam_search_hybrid` with zero contraction levels —
    the gather level body (ONE pair-table row gather per level: both child
    embeddings + exists + id digit lanes) lives in one place.
    """
    return beam_search_hybrid(
        apply_from_emb, params, seq_codes, pair_table, embed_size, cfg,
        precompute, max_contract_rows=0,
    )


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


# ---------------------------------------------------------------------------
# Stride-2 subtree rows: one gather serves TWO beam levels.
#
# subtree_table[c] packs children AND grandchildren of internal code c:
#
#   [ emb(2c+1) | emb(2c+2)                      (children,      2E lanes)
#   | emb(4c+3) | emb(4c+4) | emb(4c+5) | emb(4c+6)  (grandkids, 4E lanes)
#   | exists x6 | gc id hi/lo x4 | 0-pad ]       (14 lanes)
#
# For E=16 that is 110 used lanes -> one 128-lane row; one gather then
# carries enough to run two exact beam levels: children are scored and
# pruned as usual, and the surviving children's own children are SELECTED
# from the prefetched grandchild bank by a one-hot contraction instead of a
# second gather.  Exact same frontiers/scores as the pair loop — pruning
# still happens at every level — at half the gather descriptors.
# Grandchild ids (hi/lo floats) cover the leaf readout; children ids are
# never needed because the loop always ends on a grandchild level.
#
# Measured (v5e, 1M items, batch 4096, beam 20): 19.8ms vs 19.3ms for the
# pair loop — halving the gathers buys ~2.4ms but the grandchild one-hot
# selection apparatus gives it back.  Exact id/score parity with the pair
# loop.  Kept as an experimental variant; the pair loop stays the default.
#
# bf16 + contraction-prefix rematch (10M items, 24 levels, batch 4096):
# stride-2 hybrid 20.9ms vs pair hybrid 15.5ms (identical ids).  Halving
# the deep-level gathers saves ~4ms, but the per-level grandchild selection
# einsums inside the scan cost ~9ms — the selection apparatus, not the
# gather, is the binding constraint at every scale tested.  RETIRED as a
# serving candidate with this evidence; do not re-attempt without a cheaper
# selection scheme.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SubtreeTree:
    """Device-side stride-2 subtree table + beam config."""

    subtree_table: jnp.ndarray  # [n_rows, row_width] float32
    embed_size: int
    cfg: TreeBeamConfig


def build_subtree_table(
    embedding: jnp.ndarray,
    node_exists: np.ndarray,
    node_id: np.ndarray,
    total_codes: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Rows for every code with grandchildren: n_rows = (total_codes-3)//4.

    Grandchild ids are stored as ``_id_layout(dtype)`` radix digit lanes
    (f32: 2 base-4096 digits = the original hi/lo pair; bf16: 4 exact
    base-256 digits).  At E=16 the bf16 row is 6*16+6+16 = 118 used lanes —
    ONE 128-lane 256B row carries two exact beam levels.  Chunked donated
    build above ``_ONE_SHOT_BUILD_BYTES`` (same OOM rule as the pair table).
    """
    n_rows = (total_codes - 3) // 4
    e = embedding.shape[1]
    k, base = _id_layout(dtype)
    used = 6 * e + 6 + 4 * k
    row_width = ((used + 127) // 128) * 128

    ex = np.asarray(node_exists, np.float32)
    child_ex = ex[1 : 2 * n_rows + 1].reshape(n_rows, 2)
    gc_ex = ex[3 : 4 * n_rows + 3].reshape(n_rows, 4)
    digits = _encode_id_digits(
        np.asarray(node_id[3 : 4 * n_rows + 3], np.int64), k, base
    )  # [4*n_rows, k]
    gc_ids = np.concatenate(
        [digits[i::4] for i in range(4)], axis=1
    )  # [n_rows, 4k]: gc0 digits | gc1 | gc2 | gc3

    out_bytes = n_rows * row_width * np.dtype(dtype).itemsize
    if out_bytes <= _ONE_SHOT_BUILD_BYTES:
        @jax.jit
        def build(emb, cex, gex, gid):
            child = emb[1 : 2 * n_rows + 1].astype(dtype).reshape(
                n_rows, 2 * e
            )
            gc = emb[3 : 4 * n_rows + 3].astype(dtype).reshape(n_rows, 4 * e)
            pad = jnp.zeros((n_rows, row_width - used), dtype)
            return jnp.concatenate(
                [child, gc, cex.astype(dtype), gex.astype(dtype),
                 gid.astype(dtype), pad], axis=1,
            )

        return build(embedding, jnp.asarray(child_ex), jnp.asarray(gc_ex),
                     jnp.asarray(gc_ids))

    import functools

    n_chunks = max(1, -(-out_bytes // _ONE_SHOT_BUILD_BYTES))
    cs = -(-n_rows // n_chunks)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(buf, emb, cex, gex, gid, start):
        child = jax.lax.dynamic_slice_in_dim(
            emb, 1 + 2 * start, 2 * cs, 0
        ).astype(dtype).reshape(cs, 2 * e)
        gc = jax.lax.dynamic_slice_in_dim(
            emb, 3 + 4 * start, 4 * cs, 0
        ).astype(dtype).reshape(cs, 4 * e)
        block = jnp.concatenate(
            [child, gc, cex.astype(dtype), gex.astype(dtype),
             gid.astype(dtype)], axis=1,
        )  # pad lanes keep the buffer's zeros
        return jax.lax.dynamic_update_slice(buf, block, (start, 0))

    buf = jnp.zeros((n_rows, row_width), dtype)
    for i in range(n_chunks):
        start = min(i * cs, n_rows - cs)
        buf = fill(
            buf, embedding,
            jnp.asarray(child_ex[start : start + cs]),
            jnp.asarray(gc_ex[start : start + cs]),
            jnp.asarray(gc_ids[start : start + cs]),
            start,
        )
    return buf


def make_subtree_tree(
    tree: ArrayTree, embedding: jnp.ndarray, beam: int, dtype=jnp.float32
) -> SubtreeTree:
    cfg = make_config(tree, beam)
    n_levels = cfg.max_level - cfg.start_level
    if n_levels < 2:
        raise ValueError("stride-2 beam needs >= 2 levels below the start")
    table = build_subtree_table(
        embedding, tree.node_exists, tree.node_id, tree.total_codes,
        dtype=dtype,
    )
    return SubtreeTree(
        subtree_table=table, embed_size=int(embedding.shape[1]), cfg=cfg,
    )


def beam_search_stride2(
    apply_from_emb: Callable[..., jnp.ndarray],
    params,
    seq_codes: jnp.ndarray,
    subtree_table: jnp.ndarray,
    embed_size: int,
    cfg: TreeBeamConfig,
    precompute: Callable,
    max_contract_rows: int = 0,
    contract_prefix: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact beam search at one gather per two levels.

    With ``contract_prefix`` (f32 [prefix_rows, 2E+2] pair-layout rows of
    the top levels, sliced out at build time — see ``beam_search_hybrid``'s
    relayout note) the leading levels with <= ``max_contract_rows`` nodes
    run as one-hot MXU contractions and only the deep levels gather."""
    b = seq_codes.shape[0]
    beam = cfg.beam
    width = 2 * beam
    e = embed_size
    n_rows = subtree_table.shape[0]
    k, base = _id_layout(subtree_table.dtype)

    ctx = precompute(params, seq_codes)

    frontier = jnp.broadcast_to(
        jnp.asarray(cfg.start_codes_padded, dtype=jnp.int32), (b, width)
    )
    valid = frontier >= 0
    scores = jnp.where(valid, 0.0, _NEG_INF).astype(jnp.float32)
    ids = jnp.full((b, width), -1, jnp.int32)

    n_levels = cfg.max_level - cfg.start_level
    n_contract = 0
    if contract_prefix is not None and max_contract_rows > 0:
        # leave >= 2 levels for the stride-2 scan
        n_contract = min(
            _n_contract_levels(cfg, max_contract_rows), n_levels - 2
        )
    for i in range(n_contract):  # unrolled: tiny static slices per level
        lvl = cfg.start_level + i
        lo, n = (1 << lvl) - 1, 1 << lvl
        seg = jax.lax.slice(contract_prefix, (lo, 0), (lo + n, 2 * e + 2))
        top_scores, top_idx = jax.lax.top_k(scores, beam)
        top_codes = onehot_select(frontier, top_idx)
        top_alive = top_scores > _NEG_INF / 2
        onehot = (
            (top_codes - lo)[..., None] == jnp.arange(n, dtype=jnp.int32)
        ).astype(jnp.float32)  # dead slots (-1) select nothing -> zero rows
        rows = jnp.einsum("bkn,nw->bkw", onehot, seg)
        emb = rows[..., : 2 * e].reshape(b, width, e)
        exists = rows[..., 2 * e : 2 * e + 2].reshape(b, width) > 0
        alive = exists & jnp.repeat(top_alive, 2, axis=1)
        frontier = jnp.stack(
            [2 * top_codes + 1, 2 * top_codes + 2], axis=-1
        ).reshape(b, width)
        logits = apply_from_emb(params, emb, ctx)
        scores = jnp.where(alive, logits, _NEG_INF)

    if (n_levels - n_contract) % 2 == 1:
        # one lead-in level so the stride-2 scan lands on leaves; the
        # subtree row's children half doubles as a pair row (lead-in codes
        # sit at least 3 levels above the leaves, so their rows exist)

        def pair_body(frontier, scores):
            top_scores, top_idx = jax.lax.top_k(scores, beam)
            top_codes = onehot_select(frontier, top_idx)
            top_alive = top_scores > _NEG_INF / 2
            rows = subtree_table[jnp.clip(top_codes, 0, n_rows - 1)].astype(
                jnp.float32
            )
            emb = rows[..., : 2 * e].reshape(b, width, e)
            exists = rows[..., 6 * e : 6 * e + 2].reshape(b, width) > 0
            alive = exists & jnp.repeat(top_alive, 2, axis=1)
            children = jnp.stack(
                [2 * top_codes + 1, 2 * top_codes + 2], axis=-1
            ).reshape(b, width)
            logits = apply_from_emb(params, emb, ctx)
            return children, jnp.where(alive, logits, _NEG_INF)

        frontier, scores = pair_body(frontier, scores)

    def stride_body(carry, _):
        frontier, scores, _ids = carry
        top_scores, top_idx = jax.lax.top_k(scores, beam)  # [B, beam]
        top_codes = onehot_select(frontier, top_idx)
        top_alive = top_scores > _NEG_INF / 2
        rows = subtree_table[jnp.clip(top_codes, 0, n_rows - 1)].astype(
            jnp.float32
        )  # [B, beam, RW]

        # ---- level A: score + prune the 2*beam children -------------------
        c_emb = rows[..., : 2 * e].reshape(b, width, e)
        c_exists = rows[..., 6 * e : 6 * e + 2].reshape(b, width) > 0
        c_alive = c_exists & jnp.repeat(top_alive, 2, axis=1)
        children = jnp.stack(
            [2 * top_codes + 1, 2 * top_codes + 2], axis=-1
        ).reshape(b, width)
        c_logits = apply_from_emb(params, c_emb, ctx)
        c_scores = jnp.where(c_alive, c_logits, _NEG_INF)

        # ---- level B: select surviving children's kids from the bank ------
        topb_scores, topb_idx = jax.lax.top_k(c_scores, beam)  # over width
        topb_codes = onehot_select(children, topb_idx)
        topb_alive = topb_scores > _NEG_INF / 2
        # grandchild bank rearranged per child: [B, width, 2, (E, ex, hi/lo)]
        gc_emb = rows[..., 2 * e : 6 * e].reshape(b, width, 2, e)
        gc_ex = rows[..., 6 * e + 2 : 6 * e + 6].reshape(b, width, 2)
        gc_id = rows[..., 6 * e + 6 : 6 * e + 6 + 4 * k].reshape(
            b, width, 2, k
        )
        onehot = (
            topb_idx[..., :, None] == jnp.arange(width, dtype=topb_idx.dtype)
        ).astype(jnp.float32)  # [B, beam, width]
        sel_emb = jnp.einsum(
            "bkj,bjte->bkte", onehot, gc_emb.astype(jnp.float32)
        ).reshape(b, width, e)
        sel_ex = jnp.einsum(
            "bkj,bjt->bkt", onehot, gc_ex.astype(jnp.float32)
        ).reshape(b, width) > 0
        # id lanes must be selected EXACTLY: a float one-hot einsum rides the
        # MXU at default precision, which truncates f32 inputs to bf16 and
        # silently quantizes id lanes (12-bit base-4096 digits need the f32
        # mantissa).  Decode the radix digits to int32 first (elementwise,
        # exact for both lane dtypes) and contract in int32.
        gc_int = _decode_id_digits(gc_id, base)  # [B, width, 2]
        sel_id = jnp.stack(
            [
                onehot_select(gc_int[..., 0], topb_idx),
                onehot_select(gc_int[..., 1], topb_idx),
            ],
            axis=-1,
        ).reshape(b, width)  # int32 item ids, frontier order
        gchildren = jnp.stack(
            [2 * topb_codes + 1, 2 * topb_codes + 2], axis=-1
        ).reshape(b, width)
        g_alive = sel_ex & jnp.repeat(topb_alive, 2, axis=1)
        g_logits = apply_from_emb(params, sel_emb, ctx)
        g_scores = jnp.where(g_alive, g_logits, _NEG_INF)
        return (gchildren, g_scores, sel_id), None

    (frontier, scores, ids), _ = jax.lax.scan(
        stride_body, (frontier, scores, ids), None, length=(n_levels - n_contract) // 2
    )

    leaf_ok = scores > _NEG_INF / 2
    return jnp.where(leaf_ok, ids, -1), scores


def make_stride2_beam_fn(
    packed: SubtreeTree,
    precompute: Callable,
    apply_from_emb: Callable,
) -> Callable:
    cfg = packed.cfg
    e = packed.embed_size

    @jax.jit
    def run(params, seq_codes, table):
        return beam_search_stride2(
            apply_from_emb, params, seq_codes, table, e, cfg, precompute
        )

    return lambda params, seq_codes: run(
        params, seq_codes, packed.subtree_table
    )


def make_stride2_hybrid_beam_fn(
    packed: SubtreeTree,
    precompute: Callable,
    apply_from_emb: Callable,
    max_contract_rows: int = 8192,
) -> Callable:
    """Contraction for the small top levels + stride-2 gathers below.

    The stride-2 row's children half IS a pair row ([2E emb | 2 exists] at
    lanes [0:2E] and [6E:6E+2]), so the contraction prefix is sliced out of
    the subtree table eagerly at build time — keeping the slice inside the
    program would whole-table-relayout it (see ``beam_search_hybrid``)."""
    cfg = packed.cfg
    e = packed.embed_size
    n_levels = cfg.max_level - cfg.start_level
    n_contract = min(
        _n_contract_levels(cfg, max_contract_rows), n_levels - 2
    )
    if n_contract > 0:
        prefix_rows = min(
            packed.subtree_table.shape[0],
            (1 << (cfg.start_level + n_contract)) - 1,
        )
        sl = packed.subtree_table[:prefix_rows]
        prefix = jnp.concatenate(
            [sl[:, : 2 * e], sl[:, 6 * e : 6 * e + 2]], axis=1
        ).astype(jnp.float32)
    else:
        prefix = jnp.zeros((1, 2 * e + 2), jnp.float32)

    @jax.jit
    def run(params, seq_codes, table, contract_prefix):
        return beam_search_stride2(
            apply_from_emb, params, seq_codes, table, e, cfg, precompute,
            max_contract_rows=max_contract_rows,
            contract_prefix=contract_prefix,
        )

    return lambda params, seq_codes: run(
        params, seq_codes, packed.subtree_table, prefix
    )


# ---------------------------------------------------------------------------
# Pallas-fused level body: same pair-table loop, but everything after the
# row gather (lane unpack, DIN scorer, exists mask, id passthrough) runs in
# one VMEM-resident kernel (ops/packed_level_kernel.py).  DIN only.
# RETIRED as a serving path: measured 24.2ms vs 19.3ms for the XLA packed
# loop at 1M items (see the kernel docstring for the full verdict); kept as
# a tested experiment.
# ---------------------------------------------------------------------------


def make_packed_beam_fn_pallas(
    packed: PackedTree,
    tile_b: int = 64,
    interpret: bool = False,
) -> Callable:
    """DIN-scorer packed beam with the Pallas fused level body."""
    from dismember_tpu.models.embedding import embed_lookup
    from dismember_tpu.ops.packed_level_kernel import packed_level_pallas

    if packed.pair_table.dtype != jnp.float32:
        raise ValueError("the Pallas level body only supports f32 pair tables")

    cfg = packed.cfg
    e = packed.embed_size
    beam = cfg.beam
    width = 2 * beam
    n_levels = cfg.max_level - cfg.start_level

    @jax.jit
    def run(params, seq_codes, table):
        b = seq_codes.shape[0]
        n_pairs = table.shape[0]
        seq_e = embed_lookup(params["embedding"], seq_codes)
        pad = (seq_codes < 0).astype(jnp.float32)

        frontier = jnp.broadcast_to(
            jnp.asarray(cfg.start_codes_padded, dtype=jnp.int32), (b, width)
        )
        scores = jnp.where(frontier >= 0, 0.0, _NEG_INF).astype(jnp.float32)
        ids_hilo = jnp.full((b, width, 2), -1.0, jnp.float32)
        ids_hilo = ids_hilo.at[:, :, 1].set(4095.0)

        def level_body(carry, _):
            frontier, scores, _ids = carry
            top_scores, top_idx = jax.lax.top_k(scores, beam)
            top_codes = onehot_select(frontier, top_idx)
            top_alive = top_scores > _NEG_INF / 2
            rows = table[jnp.clip(top_codes, 0, n_pairs - 1)]
            new_scores, hilo = packed_level_pallas(
                params, rows, top_alive, seq_e, pad, e,
                tile_b=min(tile_b, b), interpret=interpret,
            )
            # kernel outputs are BLOCK-ordered (left children | right
            # children) — keep codes in the same order; beam search is
            # order-insensitive within a frontier
            children = jnp.concatenate(
                [2 * top_codes + 1, 2 * top_codes + 2], axis=1
            )
            return (children, new_scores, hilo), None

        (frontier, scores, ids_hilo), _ = jax.lax.scan(
            level_body, (frontier, scores, ids_hilo), None, length=n_levels
        )
        ids = (
            ids_hilo[..., 0].astype(jnp.int32) * 4096
            + ids_hilo[..., 1].astype(jnp.int32)
        )
        leaf_ok = scores > _NEG_INF / 2
        return jnp.where(leaf_ok, ids, -1), scores

    return lambda params, seq_codes: run(params, seq_codes, packed.pair_table)


# ---------------------------------------------------------------------------
# Hybrid beam: contraction for the shallow levels, gather for the deep ones.
#
# Per level the gather fetches B*beam rows (~0.76ms at batch 4096) no matter
# how SMALL the level is — at level 5 all 4096 queries pull from just 32
# distinct pair rows.  For levels with <= max_contract_rows pair rows the
# hybrid replaces the gather with a one-hot contraction against the level's
# static pair-table slice (an MXU matmul over at most [B, beam, 512] x
# [512, 2E+2] — microseconds).  Exactness: the contraction only carries the
# embedding and exists lanes — emb lanes are rounded to bf16 by the MXU
# either way (the scorer's first matmul does the same rounding, so scores
# are bitwise-identical to the gather path), exists is 0/1 (exact in bf16),
# and the id lanes are deliberately EXCLUDED (bf16 would corrupt them — see
# the stride-2 id fix): shallow levels never emit leaf ids, and the final
# level always uses the gather body.
# ---------------------------------------------------------------------------


def _n_contract_levels(cfg: TreeBeamConfig, max_contract_rows: int) -> int:
    """Leading levels served by contraction (>= 1 gather level stays at the
    bottom — it produces the leaf ids)."""
    n_levels = cfg.max_level - cfg.start_level
    n_contract = 0
    for i in range(n_levels - 1):
        if (1 << (cfg.start_level + i)) <= max_contract_rows:
            n_contract += 1
        else:
            break
    return n_contract


def beam_search_hybrid(
    apply_from_emb: Callable[..., jnp.ndarray],
    params,
    seq_codes: jnp.ndarray,
    pair_table: jnp.ndarray,
    embed_size: int,
    cfg: TreeBeamConfig,
    precompute: Callable,
    max_contract_rows: int = 8192,
    contract_prefix: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Same contract as beam_search_packed; bitwise-same results for
    matmul-first scorers (train.tdm.MATMUL_FIRST_SCORERS).  The contraction
    einsum's operands are rounded to bf16 by the TPU MXU, which is invisible
    to scorers that immediately matmul the embedding (DIN) but perturbs
    elementwise-f32 scorers (DeepFM's FM term) — those must pass
    ``max_contract_rows=0`` (pure gather; callers in serving.py/otm.py do).

    ``max_contract_rows=8192`` is the measured v5e crossover (1M items,
    batch 4096, beam 20): 12.4ms/batch vs 19.3ms all-gather — the
    contraction beats the gather up to level 13 and loses above it.

    ``contract_prefix`` (f32 [prefix_rows, 2E+2]) holds the contraction
    levels' pair rows as a SEPARATE array.  Slicing them out of
    ``pair_table`` inside the program makes XLA relayout the whole table
    ({1,0} -> {0,1}) to feed the einsum operand — a 12.5ms/call copy of the
    4.3GB table at 10M items, measured to dominate the 28ms batch.  With the
    prefix split out the table is only consumed by the gather body and keeps
    its gather-friendly layout (28.1 -> ~15.5ms/batch at 10M items)."""
    b = seq_codes.shape[0]
    beam = cfg.beam
    width = 2 * beam
    e = embed_size
    n_pairs = pair_table.shape[0]
    k, base = _id_layout(pair_table.dtype)

    ctx = precompute(params, seq_codes)

    frontier = jnp.broadcast_to(
        jnp.asarray(cfg.start_codes_padded, dtype=jnp.int32), (b, width)
    )
    valid = frontier >= 0
    scores = jnp.where(valid, 0.0, _NEG_INF).astype(jnp.float32)

    n_levels = cfg.max_level - cfg.start_level
    n_contract = _n_contract_levels(cfg, max_contract_rows)

    for i in range(n_contract):  # unrolled: tiny static slices per level
        lvl = cfg.start_level + i
        lo, n = (1 << lvl) - 1, 1 << lvl
        if contract_prefix is not None:
            seg = jax.lax.slice(contract_prefix, (lo, 0), (lo + n, 2 * e + 2))
        else:
            seg = jax.lax.slice(
                pair_table, (lo, 0), (lo + n, 2 * e + 2)
            ).astype(jnp.float32)
        top_scores, top_idx = jax.lax.top_k(scores, beam)
        top_codes = onehot_select(frontier, top_idx)
        top_alive = top_scores > _NEG_INF / 2
        onehot = (
            (top_codes - lo)[..., None] == jnp.arange(n, dtype=jnp.int32)
        ).astype(jnp.float32)  # dead slots (-1) select nothing -> zero rows
        rows = jnp.einsum("bkn,nw->bkw", onehot, seg)
        emb = rows[..., : 2 * e].reshape(b, width, e)
        exists = rows[..., 2 * e : 2 * e + 2].reshape(b, width) > 0
        alive = exists & jnp.repeat(top_alive, 2, axis=1)
        frontier = jnp.stack(
            [2 * top_codes + 1, 2 * top_codes + 2], axis=-1
        ).reshape(b, width)
        logits = apply_from_emb(params, emb, ctx)
        scores = jnp.where(alive, logits, _NEG_INF)

    ids_digits = jnp.broadcast_to(
        jnp.asarray(_encode_id_digits(np.asarray([-1]), k, base)[0]),
        (b, width, k),
    )

    def level_body(carry, _):
        frontier, scores, _ids = carry
        top_scores, top_idx = jax.lax.top_k(scores, beam)
        top_codes = onehot_select(frontier, top_idx)
        top_alive = top_scores > _NEG_INF / 2
        rows = pair_table[jnp.clip(top_codes, 0, n_pairs - 1)].astype(
            jnp.float32
        )
        emb = rows[..., : 2 * e].reshape(b, width, e)
        exists = rows[..., 2 * e : 2 * e + 2].reshape(b, width) > 0
        child_digits = rows[..., 2 * e + 2 : 2 * e + 2 + 2 * k].reshape(
            b, width, k
        )
        alive = exists & jnp.repeat(top_alive, 2, axis=1)
        children = jnp.stack(
            [2 * top_codes + 1, 2 * top_codes + 2], axis=-1
        ).reshape(b, width)
        logits = apply_from_emb(params, emb, ctx)
        return (children, jnp.where(alive, logits, _NEG_INF), child_digits), None

    (frontier, scores, ids_digits), _ = jax.lax.scan(
        level_body, (frontier, scores, ids_digits), None,
        length=n_levels - n_contract,
    )

    ids = _decode_id_digits(ids_digits, base)
    leaf_ok = scores > _NEG_INF / 2
    return jnp.where(leaf_ok, ids, -1), scores


def make_hybrid_beam_fn(
    packed: PackedTree,
    precompute: Callable,
    apply_from_emb: Callable,
    max_contract_rows: int = 8192,
) -> Callable:
    """Jitted hybrid (contraction-above, gather-below) packed beam."""
    cfg = packed.cfg
    e = packed.embed_size

    # one-time eager slice of the contraction levels' rows (see
    # beam_search_hybrid's contract_prefix note — keeping them inside the
    # program forces a per-call whole-table relayout at 10M items)
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

    @jax.jit
    def run(params, seq_codes, table, contract_prefix):
        return beam_search_hybrid(
            apply_from_emb, params, seq_codes, table, e, cfg, precompute,
            max_contract_rows=max_contract_rows,
            contract_prefix=contract_prefix,
        )

    return lambda params, seq_codes: run(
        params, seq_codes, packed.pair_table, prefix
    )
