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


def make_dr_serving_fn(
    trainer, beam: int | None = None, topk: int | None = None,
    max_items_per_path: int = 128,
):
    """Build a jitted ``(layer_params, rerank_params, seqs[, consumed]) ->
    (item ids [B, topk], scores)`` closure, or None when the dense table
    doesn't fit."""
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

    from dismember_tpu.models.dr_models import rerank_user_vector

    @jax.jit
    def run(layer_params, rerank_params, seqs, consumed=None):
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
        valid = cand >= 0
        # in-row dedup: keep the first occurrence of each item
        sorted_idx = jnp.argsort(jnp.where(valid, cand, 2**30), axis=1)
        cs = jnp.take_along_axis(cand, sorted_idx, axis=1)
        first = jnp.concatenate(
            [jnp.ones((b, 1), bool), cs[:, 1:] != cs[:, :-1]], axis=1
        )
        cs_valid = (cs >= 0) & first
        if consumed is not None:
            hit = (cs[:, :, None] == consumed[:, None, :]).any(-1)
            cs_valid &= ~hit
        user_vec = rerank_user_vector(rerank_params, seqs)  # [B, E]
        w = rerank_params["softmax_w"][jnp.maximum(cs, 0)]  # [B, C, E]
        bias = rerank_params["softmax_b"][:, None][jnp.maximum(cs, 0), 0]
        scores = jnp.einsum("be,bce->bc", user_vec, w) + bias
        scores = jnp.where(cs_valid, scores, _NEG_INF)
        top_scores, top_idx = jax.lax.top_k(scores, k)
        from dismember_tpu.retrieval.tree_beam import onehot_select

        top_items = onehot_select(cs, top_idx)
        top_items = jnp.where(top_scores > _NEG_INF / 2, top_items, -1)
        return top_items, top_scores

    return run
