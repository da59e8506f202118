"""Fully on-device Deep Retrieval serving: path beam -> items -> rerank -> topk.

The reference serves one query at a time through host dicts
(DeepRetrieval.recommend:26-46, pathItemMapping).  Here the inverted
path->items mapping is materialized as device arrays:

- ``path_table``: dense [K^D] int32 of CSR row indices (-1 = empty path) —
  a path's base-K digit key indexes it directly;
- ``path_items``: padded [n_paths, M] item ids (-1 pad).

Serving is then one jit: path beam search, key computation, two row gathers,
rerank scoring of the [B, beam*M] candidates, in-row dedup (an item on
several retrieved paths is kept once), optional consumed filtering, top-k.
Falls back to the host implementation when K^D is too large for a dense
table or a path holds more than ``max_items_per_path`` items.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dismember_tpu.index.paths import PathIndex
from dismember_tpu.retrieval.path_beam import path_beam_search

_NEG_INF = jnp.float32(-3.4e38)


@dataclasses.dataclass
class DevicePathMap:
    path_table: jnp.ndarray  # [K^D] int32 row index or -1
    path_items: jnp.ndarray  # [n_paths, M] int32 item ids, -1 pad
    num_nodes: int
    truncated_paths: int  # paths that overflowed M (items dropped)

    @classmethod
    def build(
        cls, index: PathIndex, max_items_per_path: int = 128,
        max_table: int = 1 << 24, item_priority: np.ndarray | None = None,
    ) -> "DevicePathMap | None":
        """``item_priority`` (e.g. training-frequency counts) orders each
        overflowing path's items before the cut at ``max_items_per_path``,
        so truncation drops the LEAST important items.  Without it the cut
        follows dict insertion order — measured at 1M items after
        coordinate descent (hot paths hold the popular items): recall@10
        0.0157 capped vs 0.0492 uncapped, because the arbitrarily-dropped
        items were exactly the Zipf-popular eval labels.  The reference's
        host-dict serving (DeepRetrieval.recommend:26-46) has no cap at
        all; priority-ordered truncation keeps the device table's memory
        bound while preserving the high-mass items."""
        k, d = index.num_nodes, index.num_layers
        size = k**d
        if size > max_table:
            return None
        p2i = index.path_to_items()
        n_paths = len(p2i)
        table = np.full(size, -1, dtype=np.int32)
        m = min(max_items_per_path, max((len(v) for v in p2i.values()), default=1))
        items = np.full((max(n_paths, 1), m), -1, dtype=np.int32)
        truncated = 0
        for row, (path, its) in enumerate(p2i.items()):
            key = 0
            for digit in path:
                key = key * k + digit
            table[key] = row
            if len(its) > m:
                truncated += 1
                if item_priority is not None:
                    arr = np.asarray(its)
                    its = arr[np.argsort(-item_priority[arr], kind="stable")]
            items[row, : min(len(its), m)] = its[:m]
        return cls(
            path_table=jnp.asarray(table),
            path_items=jnp.asarray(items),
            num_nodes=k,
            truncated_paths=truncated,
        )


# above this item count the rerank tables are packed into 128-lane bf16 rows
# for serving: at [10M, 16] f32 the per-row gather pays the whole (8,128)
# tile granule (~27ns/row; xplane), and the bias path whole-copies the table.
# 128-lane bf16 rows gather at ~9ns/row and carry the bias in lane E.
_PACKED_RERANK_MIN_ITEMS = 1 << 18

# path-major block table: one contiguous block of per-item lanes per path.
# Per-row random-gather bandwidth on v5e is width-bound — 256B rows move at
# 27.8 GB/s but 1-3KB rows at ~90-115 GB/s (measured, same 81920-row probe
# as scripts/bench_gather_width.py) — and candidates arrive per PATH, so
# gathering one [m, item_lanes] block per beam path instead of one 128-lane
# row per candidate item cuts both the DMA count (m-fold) and the bytes
# (items pack at 32 lanes instead of a full 128-lane row).  The rerank row
# gather was 15.4 of the 23.9 ms DR serving batch at 1M items (xplane).
_BLOCK_TABLE_MAX_BYTES = 8 << 30  # fall back to item-major rows above this
_ID_DIGITS, _ID_BASE = 4, 256  # exact bf16 integer lanes (ids < 2^31)


def _pack_rerank_table(softmax_w: jnp.ndarray, softmax_b: jnp.ndarray):
    """[N, E] weights + [N] bias -> [N, 128] bf16 rows (lane E = bias)."""
    n, e = softmax_w.shape
    assert e + 1 <= 128

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(buf, w, bias):
        buf = jax.lax.dynamic_update_slice(
            buf, w.astype(jnp.bfloat16), (0, 0)
        )
        return jax.lax.dynamic_update_slice(
            buf, bias[:, None].astype(jnp.bfloat16), (0, e)
        )

    return fill(jnp.zeros((n, 128), jnp.bfloat16), softmax_w, softmax_b)


def _block_geometry(e: int, m: int) -> tuple[int, int] | None:
    """(planes, m_pad) minimizing row width for one item payload of
    ``used = e + 1 + _ID_DIGITS + 1`` planes (weights | bias | id digits |
    valid) and ``m`` item slots per path.

    Constraint: width = planes * m_pad must be a multiple of the 128-lane
    tile (otherwise every row straddles tiles and the table pads 128/width
    -fold in HBM).  Power-of-two plane counts (the r2-r4 rule: 32 lanes at
    E=16) waste 10 of 32 planes as zero padding that every gather still
    reads — 25% of the block bytes at the 10M bench config.  Searching all
    plane counts >= used finds e.g. planes=24, m_pad=48 (width 1152 vs
    1536) for E=16, m<=48."""
    import math

    used = e + 1 + _ID_DIGITS + 1
    if used > 128:
        return None
    best = None
    for p in range(used, 129):
        q = 128 // math.gcd(p, 128)  # m_pad granularity for width % 128 == 0
        m_pad = -(-m // q) * q
        width = p * m_pad
        if best is None or width < best[0]:
            best = (width, p, m_pad)
    return (best[1], best[2]) if best else None


def _build_block_table(
    softmax_w: jnp.ndarray,  # [N, E] f32 (device)
    softmax_b: jnp.ndarray,  # [N] f32 (device)
    path_items: np.ndarray,  # [n_paths, m] int32, -1 pad (host)
    planes_n: int,
    m_pad: int,
) -> jnp.ndarray:
    """Path-major bf16 serving table in PLANE-MAJOR lane order: row p holds
    ``planes_n`` planes of ``m_pad`` lanes each — plane l carries lane l
    of every item slot (planes 0..E-1 = weights, E = bias, E+1..E+4 = id
    digits, E+5 = valid; any remaining planes are zero pad).

    Plane-major (vs the r2-r4 slot-interleaved order) puts every per-field
    extraction at a contiguous minor-dim slice of the gathered 2-D rows
    (see _score_blocks_topk) — killing the r4 roofline's [B, beam, width]
    bf16->f32 convert_multiply fusion (1.35 ms/batch), the three one-hot
    selector einsums, and the 6-pass HIGHEST-precision f32 dot (VERDICT r4
    weak #1).  The gather itself is unchanged: rows are the same
    contiguous bytes.

    Returns the [n_paths, planes_n*m_pad] table.  Built in donated chunks:
    one fused build program peaks ~3x its output (CLAUDE.md), and the
    w-row gather input table co-resides either way."""
    import functools

    from dismember_tpu.retrieval.packed_beam import _encode_id_digits

    n_paths, m = path_items.shape
    e = int(softmax_w.shape[1])
    width = m_pad * planes_n
    items = np.full((n_paths, m_pad), -1, np.int64)
    items[:, :m] = path_items

    cs = max(1, min(n_paths, (256 << 20) // (width * 2)))  # ~512MB chunks
    n_chunks = -(-n_paths // cs)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(buf, w, bvec, ids_safe, digits, valid, start):
        rows = w[ids_safe].astype(jnp.bfloat16)  # [cs*m_pad, e]
        bias = bvec[ids_safe][:, None].astype(jnp.bfloat16)
        pad = jnp.zeros(
            (rows.shape[0], planes_n - e - 1 - _ID_DIGITS - 1), jnp.bfloat16
        )
        lanes = jnp.concatenate(
            [rows, bias, digits.astype(jnp.bfloat16),
             valid.astype(jnp.bfloat16), pad], axis=1,
        )  # [cs*m_pad, planes_n]
        planes = lanes.reshape(-1, m_pad, planes_n).transpose(0, 2, 1)
        return jax.lax.dynamic_update_slice(
            buf, planes.reshape(-1, width), (start, 0)
        )

    buf = jnp.zeros((n_paths, width), jnp.bfloat16)
    for i in range(n_chunks):
        # equal-size chunks (one compile); tail overlap-rewrites identically
        start = min(i * cs, n_paths - cs) if n_paths >= cs else 0
        flat = items[start : start + cs].reshape(-1)
        buf = fill(
            buf,
            softmax_w,
            softmax_b,
            jnp.asarray(np.maximum(flat, 0), jnp.int32),
            jnp.asarray(_encode_id_digits(flat, _ID_DIGITS, _ID_BASE)),
            jnp.asarray((flat >= 0)[:, None], jnp.float32),
            start,
        )
    return buf


def pack_path_table(path_table: jnp.ndarray) -> jnp.ndarray:
    """[S] int32 -> [ceil(S/128), 128] rows (-1 pad).

    A 1-D gather from the dense [K^D] path table stages the WHOLE table
    through scalar memory every call — measured 4.88 ms/batch for the [1M]
    table at the 10M-item config (scripts/profile_dr_serve.py), the single
    largest op on the serving critical path.  A 128-lane row gather plus an
    int32 one-hot lane select (exact VPU math) replaces it at ~0.8 ms."""
    s = int(path_table.shape[0])
    pad = (-s) % 128
    return jnp.pad(path_table, (0, pad), constant_values=-1).reshape(-1, 128)


def lookup_path_rows(ptab2d: jnp.ndarray, keys: jnp.ndarray) -> jnp.ndarray:
    """rows[...] = flat_path_table[keys] via 2-D row gather + lane select."""
    rows2 = ptab2d[keys // 128]  # [..., 128]
    lane = keys % 128
    oh = (lane[..., None] == jnp.arange(128, dtype=keys.dtype)).astype(
        rows2.dtype
    )
    return (rows2 * oh).sum(-1)


def _build_seq_pack(layer_emb: jnp.ndarray, rerank_emb: jnp.ndarray):
    """[V(+nodes), E] layer + [V, E] rerank item embeddings -> one
    [V, 2E] bf16 serving table (lanes 0:E layer, E:2E rerank).

    The serve batch's two biggest non-block gathers were the seq-side
    f32 [10M, 16] row gathers (0.92 + 0.85 ms/batch, xplane — XLA laid
    the f32 tables out column-major, so each 64-byte row cost 16 strided
    reads).  One bf16 2E-lane gather replaces both; both consumers are
    matmul-first (head matmuls / the rerank linear), so bf16 rounding
    matches what the MXU does to the operands anyway."""
    import functools

    v = int(rerank_emb.shape[0])
    e = int(rerank_emb.shape[1])

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(buf, le, re_):
        buf = jax.lax.dynamic_update_slice(buf, le.astype(jnp.bfloat16), (0, 0))
        return jax.lax.dynamic_update_slice(
            buf, re_.astype(jnp.bfloat16), (0, e)
        )

    return fill(
        jnp.zeros((v, 2 * e), jnp.bfloat16), layer_emb[:v], rerank_emb
    )


def _train_frequency_priority(trainer) -> np.ndarray | None:
    """Per-item training-target counts as the truncation priority for
    ``DevicePathMap.build`` (None when the trainer carries no data)."""
    data = getattr(trainer, "data", None)
    targets = getattr(data, "train_targets", None)
    if targets is None or len(targets) == 0:
        return None
    return np.bincount(
        np.asarray(targets, np.int64), minlength=data.num_items
    )


def make_dr_serving_fn(
    trainer, beam: int | None = None, topk: int | None = None,
    max_items_per_path: int = 128, rerank_table: str = "auto",
):
    """Build a jitted ``(layer_params, rerank_params, seqs[, consumed]) ->
    (item ids [B, topk], scores)`` closure, or None when the dense table
    doesn't fit.

    ``rerank_table`` picks how candidate rerank rows reach the scorer:

    - ``"exact"``: per-candidate f32 row gathers from the live params;
    - ``"packed"``: per-candidate 128-lane bf16 [w|bias] rows (frozen at
      closure-build time);
    - ``"block"``: path-major bf16 blocks — one contiguous
      [m_pad, item_lanes] slot row per path, gathered once per beam path.
      Wide contiguous rows move at ~4x the bandwidth of per-item 128-lane
      rows on v5e and items pack at 32 lanes, so the dominant serving cost
      (the candidate row gather — 15.4 of 23.9 ms/batch at 1M items) drops
      ~10x.  Ids travel as exact base-256 bf16 digit lanes; dedup switches
      from the value-sort to top-(k*J) + first-occurrence masking (an item
      appears on at most J retrieved paths), which is exact because
      duplicate candidates carry identical scores.
    - ``"auto"``: block at >= ``_PACKED_RERANK_MIN_ITEMS`` items (falling
      back to packed when the block table would exceed
      ``_BLOCK_TABLE_MAX_BYTES`` or the embed width has no lane slot),
      exact below.

    bf16 tables round the weights the same way the MXU rounds matmul
    operands, so ranking differences vs the exact path only arise on
    near-ties."""
    dmap = DevicePathMap.build(
        trainer.path_index, max_items_per_path,
        item_priority=_train_frequency_priority(trainer),
    )
    if dmap is None:
        return None
    beam = beam or trainer.beam
    k = topk or trainer.topk
    # candidate pool is beam * max-items-per-path wide; fewer than k
    # candidates simply yields -1 padding in the result
    k = min(k, beam * dmap.path_items.shape[1])
    num_items = trainer.data.num_items
    num_nodes = trainer.num_nodes
    num_layers = trainer.num_layers
    m = dmap.path_items.shape[1]
    e = int(trainer.rerank_params["softmax_w"].shape[1])

    if rerank_table == "auto":
        rerank_table = (
            "block" if num_items >= _PACKED_RERANK_MIN_ITEMS else "exact"
        )
    if rerank_table == "block":
        geom = _block_geometry(e, m)
        if (
            geom is None
            or dmap.path_items.shape[0] * geom[0] * geom[1] * 2
            > _BLOCK_TABLE_MAX_BYTES
        ):
            rerank_table = "packed"
    if rerank_table == "block":
        return _make_block_serving_fn(trainer, dmap, beam, k, geom)

    packed_wb = None
    if rerank_table == "packed":
        packed_wb = _pack_rerank_table(
            trainer.rerank_params["softmax_w"],
            trainer.rerank_params["softmax_b"],
        )

    from dismember_tpu.models.dr_models import rerank_user_vector

    # the packed table AND the path-map arrays are jit ARGUMENTS, not
    # closure captures: closed-over device arrays are baked into the HLO as
    # literal constants (observed: "2.74GB of constants captured during
    # lowering" + a compile that never finished through the relay; and after
    # coordinate descent widened path_items to [n_paths, 128] at 1M items,
    # a ~400MB literal made the relay reject the compile with HTTP 413)
    ptab2d = pack_path_table(dmap.path_table)

    @jax.jit
    def run(layer_params, rerank_params, packed_wb, ptab2d, path_items,
            seqs, consumed=None):
        b = seqs.shape[0]
        paths, _probs = path_beam_search(
            layer_params, seqs, beam, num_items, num_nodes, num_layers
        )  # [B, beam, D]
        # base-K digit keys
        keys = jnp.zeros(paths.shape[:2], jnp.int32)
        for d in range(num_layers):
            keys = keys * num_nodes + paths[:, :, d]
        rows = lookup_path_rows(ptab2d, keys)  # [B, beam]
        cand = jnp.where(
            (rows >= 0)[:, :, None], path_items[jnp.maximum(rows, 0)], -1
        ).reshape(b, beam * m)
        # in-row dedup: value-sort (invalid -> sentinel at the back), keep the
        # first occurrence of each item.  A direct jnp.sort — argsort +
        # take_along_axis cost 37.6ms/batch at 10M items (xplane).
        cs = jnp.sort(jnp.where(cand >= 0, cand, 2**30), axis=1)
        first = jnp.concatenate(
            [jnp.ones((b, 1), bool), cs[:, 1:] != cs[:, :-1]], axis=1
        )
        cs_valid = (cs < 2**30) & first
        cs = jnp.where(cs_valid, cs, -1)
        if consumed is not None:
            hit = (cs[:, :, None] == consumed[:, None, :]).any(-1)
            cs_valid &= ~hit
        user_vec = rerank_user_vector(rerank_params, seqs)  # [B, E]
        safe = jnp.maximum(cs, 0)
        if packed_wb is not None:
            rows_wb = packed_wb[safe]  # [B, C, 128] bf16
            w = rows_wb[..., :e].astype(jnp.float32)
            bias = rows_wb[..., e].astype(jnp.float32)
        else:
            w = rerank_params["softmax_w"][safe]  # [B, C, E]
            bias = rerank_params["softmax_b"][:, None][safe, 0]
        scores = jnp.einsum("be,bce->bc", user_vec, w) + bias
        scores = jnp.where(cs_valid, scores, _NEG_INF)
        top_scores, top_idx = jax.lax.top_k(scores, k)
        from dismember_tpu.retrieval.tree_beam import onehot_select

        top_items = onehot_select(cs, top_idx)
        top_items = jnp.where(top_scores > _NEG_INF / 2, top_items, -1)
        return top_items, top_scores

    def fn(layer_params, rerank_params, seqs, consumed=None):
        return run(layer_params, rerank_params, packed_wb, ptab2d,
                   dmap.path_items, seqs, consumed)

    fn._run = run  # introspection hook for the no-baked-literal test
    fn._dmap = dmap
    fn._packed_wb = packed_wb
    fn._ptab2d = ptab2d
    return fn


def _score_blocks_topk(
    blocks,  # [B*beam, width] bf16 gathered PLANE-MAJOR block rows (2-D!)
    path_ok,  # [B, beam] bool
    user_vec,  # [B, E] f32
    consumed,  # [B, C] int32 or None
    e: int,
    m_pad: int,
    k: int,
    j_paths: int,
):
    """Score + dedup + top-k over gathered plane-major block rows (shared by
    the single-device and the sharded serving paths).

    Plane-major rows put each field at a CONTIGUOUS minor-dim slice
    (plane l spans lanes [l*m_pad, (l+1)*m_pad)), so bias / id digits /
    valid extraction is a plain slice of the gathered 2-D rows — no
    reshape.  Everything wide stays 2-D [B*beam, width]: any
    [B, beam, width] view materializes physically (the (beam, width)
    minor split/merge crosses the (8,128) tile whenever m_pad < 128 —
    measured 0.86 + 0.86 ms of reshape pairs per 10M-item batch when
    only the matmul operand was flattened, scripts/profile_dr_serve.py).
    The score contraction is E fused VPU multiply-adds over the weight-
    plane slices (scores[t, m] = sum_l plane_l[t, m] * user[b(t), l]):
    with only E=16 terms the MXU buys nothing, and every matmul
    formulation tried made XLA materialize a relayout of the 251MB
    operand (r5 profiles: einsum over a [B, beam, l, m] view — 1.56 +
    1.43 ms reshape+copy; flat 2-D matmul against a tile(eye) plane-sum
    matrix — 0.84 reshape + 0.77 copy + 0.42 broadcast).  The slice
    chain reads ONLY the weight planes.  Arithmetic: stored weight and
    user operand round to bf16 (as the MXU rounds matmul operands),
    products and accumulation in f32 — the same class as the item-major
    packed path.  The r2-r4 selector-matmul pipeline this replaces paid
    a [B, beam, width] bf16->f32 convert_multiply (1.35 ms/batch at 10M
    items) plus a 6-pass HIGHEST f32 dot (VERDICT r4 weak #1)."""
    from dismember_tpu.retrieval.tree_beam import onehot_select

    b, beam = path_ok.shape
    t = b * beam

    def plane(l):  # [T, m_pad] bf16 slice of plane l
        return jax.lax.slice_in_dim(blocks, l * m_pad, (l + 1) * m_pad, axis=1)

    # user coefficient for plane l, replicated across the beam: [T, 1]
    ub = jnp.broadcast_to(
        user_vec.astype(jnp.bfloat16)[:, None, :], (b, beam, e)
    ).reshape(t, e)
    scores = plane(0).astype(jnp.float32) * ub[:, 0:1].astype(jnp.float32)
    for l in range(1, e):
        scores += plane(l).astype(jnp.float32) * ub[:, l : l + 1].astype(
            jnp.float32
        )  # [T, m_pad]

    bias = plane(e).astype(jnp.float32)
    # id digits are exact bf16 integers <= 255 per plane; combine in int32
    # (the CLAUDE.md quantization hazard starts above 255 — never floats)
    ids = plane(e + 1).astype(jnp.int32)
    for d in range(1, _ID_DIGITS):
        ids = ids * _ID_BASE + plane(e + 1 + d).astype(jnp.int32)
    valid = (plane(e + 1 + _ID_DIGITS) > 0) & path_ok.reshape(t)[:, None]

    c = beam * m_pad
    cand = jnp.where(valid, ids, -1).reshape(b, c)
    ok = valid.reshape(b, c)
    if consumed is not None:
        ok &= ~(cand[:, :, None] == consumed[:, None, :]).any(-1)
    scores = jnp.where(ok, (scores + bias).reshape(b, c), _NEG_INF)

    # items appear on at most J paths, so top-(k*J) holds >= k unique items
    kj = min(c, max(k, k * j_paths))
    top_s, top_i = jax.lax.top_k(scores, kj)
    top_ids = onehot_select(cand, top_i)
    top_ids = jnp.where(top_s > _NEG_INF / 2, top_ids, -1)
    # exact dedup: duplicates of an item carry identical scores and
    # top_k is stable, so masking every non-first occurrence and
    # re-top-k-ing reproduces the sorted-dedup result
    lower_kj = jnp.tril(jnp.ones((kj, kj), bool), -1)
    eq = (top_ids[:, :, None] == top_ids[:, None, :]) & (
        top_ids[:, None, :] >= 0
    )
    is_dup = (eq & lower_kj).any(-1)
    fin_s, fin_i = jax.lax.top_k(jnp.where(is_dup, _NEG_INF, top_s), k)
    fin_ids = onehot_select(top_ids, fin_i)
    fin_ids = jnp.where(fin_s > _NEG_INF / 2, fin_ids, -1)
    return fin_ids, fin_s


def path_keys_and_dedup(paths, num_nodes: int):
    """[B, beam, D] paths -> (base-K keys [B, beam], first-occurrence mask).

    A padded beam (num_nodes < beam) repeats a path; only the first copy may
    count, or an item could exceed the J-occurrence bound the block dedup
    relies on."""
    beam = paths.shape[1]
    keys = jnp.zeros(paths.shape[:2], jnp.int32)
    for d in range(paths.shape[2]):
        keys = keys * num_nodes + paths[:, :, d]
    lower = jnp.tril(jnp.ones((beam, beam), bool), -1)
    dup_path = ((keys[:, :, None] == keys[:, None, :]) & lower).any(-1)
    return keys, ~dup_path


def _make_block_serving_fn(trainer, dmap: DevicePathMap, beam, k, geom):
    """Path-major block serving (see ``make_dr_serving_fn`` docstring)."""
    num_items = trainer.data.num_items
    num_nodes = trainer.num_nodes
    num_layers = trainer.num_layers
    e = int(trainer.rerank_params["softmax_w"].shape[1])
    j_paths = max(1, int(getattr(trainer, "num_paths", 1)))
    planes_n, m_pad = geom

    block_tab = _build_block_table(
        trainer.rerank_params["softmax_w"],
        trainer.rerank_params["softmax_b"],
        np.asarray(dmap.path_items),
        planes_n,
        m_pad,
    )
    ptab2d = pack_path_table(dmap.path_table)
    seq_pack = _build_seq_pack(
        trainer.layer_params["embedding"], trainer.rerank_params["embedding"]
    )

    # the block/seq/path tables are jit ARGUMENTS for the same reason
    # packed_wb is: closure-captured device arrays become HLO literal
    # constants (multi-GB for the table; [K^D] for the path map)
    def run_impl(layer_params, rerank_params, block_tab, ptab2d,
                 seq_pack, seqs, consumed=None):
        b, l_seq = seqs.shape
        # one bf16 [V, 2E] gather feeds both the layer heads' seq parts and
        # the rerank user vector (see _build_seq_pack)
        svalid = seqs != -1
        srows = seq_pack[jnp.where(svalid, seqs, 0)] * svalid[
            :, :, None
        ].astype(seq_pack.dtype)  # [B, L, 2E]
        layer_flat = srows[:, :, :e].reshape(b, l_seq * e)
        seq_parts = [
            layer_flat @ h["weight"][:, : l_seq * e].T
            for h in layer_params["heads"]
        ]
        rerank_flat = srows[:, :, e:].reshape(b, l_seq * e)
        user_vec = (
            rerank_flat @ rerank_params["linear"]["weight"].T
            + rerank_params["linear"]["bias"]
        )  # [B, E]
        paths, _probs = path_beam_search(
            layer_params, seqs, beam, num_items, num_nodes, num_layers,
            seq_parts=seq_parts,
        )  # [B, beam, D]
        keys, first = path_keys_and_dedup(paths, num_nodes)
        rows = lookup_path_rows(ptab2d, keys)  # [B, beam]
        path_ok = (rows >= 0) & first
        blocks = block_tab[jnp.maximum(rows, 0).reshape(-1)]  # [B*beam, width]
        return _score_blocks_topk(
            blocks, path_ok, user_vec, consumed, e, m_pad, k, j_paths,
        )

    # NOTE: do NOT pin the seq-pack parameter layout.  XLA assigns the
    # table column-major by CHOICE (its gather wants it that way: the
    # {0,1} gather costs the same 1.0 ms either way) — forcing the
    # committed row-major layout through in_shardings made XLA insert a
    # whole-table {1,0}->{0,1} relayout copy INSIDE the program, 4.58
    # ms/call at 10M items (data/r5/dr_serve_profile5.log).
    run = jax.jit(run_impl)

    def fn(layer_params, rerank_params, seqs, consumed=None):
        return run(layer_params, rerank_params, block_tab, ptab2d,
                   seq_pack, seqs, consumed)

    fn._run = run
    fn._dmap = dmap
    fn._block_tab = block_tab
    fn._ptab2d = ptab2d
    fn._seq_pack = seq_pack
    return fn
