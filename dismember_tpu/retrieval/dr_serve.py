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
        cls, index: PathIndex, max_items_per_path: int = 128, max_table: int = 1 << 24
    ) -> "DevicePathMap | None":
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


def make_dr_serving_fn(
    trainer, beam: int | None = None, topk: int | None = None,
    max_items_per_path: int = 128,
):
    """Build a jitted ``(layer_params, rerank_params, seqs[, consumed]) ->
    (item ids [B, topk], scores)`` closure, or None when the dense table
    doesn't fit.

    At deep catalogs (>= ``_PACKED_RERANK_MIN_ITEMS``) the rerank projection
    is gathered from a packed bf16 table built once at closure-build time
    (params are frozen at serving time); scores then round the weights to
    bf16 — the same rounding the MXU applies to matmul operands — so ranking
    differences vs the exact path only arise on near-ties."""
    dmap = DevicePathMap.build(trainer.path_index, max_items_per_path)
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

    packed_wb = None
    if num_items >= _PACKED_RERANK_MIN_ITEMS:
        packed_wb = _pack_rerank_table(
            trainer.rerank_params["softmax_w"],
            trainer.rerank_params["softmax_b"],
        )

    from dismember_tpu.models.dr_models import rerank_user_vector

    # the packed table is a jit ARGUMENT, not a closure capture: a closed-over
    # 2.6GB device array would be baked into the HLO as a literal constant
    # (observed: "2.74GB of constants captured during lowering" + a compile
    # that never finished through the relay)
    @jax.jit
    def run(layer_params, rerank_params, packed_wb, seqs, consumed=None):
        b = seqs.shape[0]
        paths, _probs = path_beam_search(
            layer_params, seqs, beam, num_items, num_nodes, num_layers
        )  # [B, beam, D]
        # base-K digit keys
        keys = jnp.zeros(paths.shape[:2], jnp.int32)
        for d in range(num_layers):
            keys = keys * num_nodes + paths[:, :, d]
        rows = dmap.path_table[keys]  # [B, beam]
        cand = jnp.where(
            (rows >= 0)[:, :, None], dmap.path_items[jnp.maximum(rows, 0)], -1
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
        return run(layer_params, rerank_params, packed_wb, seqs, consumed)

    return fn
