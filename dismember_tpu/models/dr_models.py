"""Deep Retrieval models: D-head layer model + rerank model + sampled softmax.

Parity with deep-retrieval/.../model/{LayerModel,RerankModel}.scala and
scalann nn/SampledSoftmaxLoss.scala:
- LayerModel: one shared embedding over ``num_items + K*(D-1)`` rows (item ids
  plus per-layer path-node ids offset by ``num_items + d*K``); head d flattens
  (seq ++ path[0..d)) embeddings and applies Linear((L+d)E, K)
  (LayerModel.buildModel:22-39);
- RerankModel: item embedding -> flatten -> Linear(LE, E) user vector; scored
  against per-item softmax weight rows + biases (softmax params trained by
  the sampled-softmax loss);
- SampledSoftmaxLoss (batchMode=false): per row, candidates = [label] ++
  num_sampled uniform negatives excluding the label (without replacement,
  SampledSoftmaxLoss.scala:179-199); logits over candidates; CE with target
  position 0; ``full_evaluate`` = exact softmax over all items.

TPU-first: the reference's per-layer flattened Linear is split into a
sequence part (shared across a sample's J paths) and a path-prefix part —
per layer d: ``logits = seq_flat @ Wseq.T + prefix_flat @ Wpre.T + b`` with
the seq matmul computed once per sample.  The reference's embedded per-
criterion Adam for the softmax weights (nn/mixin/ParameterOptimizer.scala) is
equivalent to including the softmax params as ordinary leaves in the rerank
param pytree under the same outer Adam (two same-lr Adams on disjoint leaves
== one Adam on the union).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from dismember_tpu.models.embedding import embed_lookup

Params = dict[str, Any]


# --------------------------------------------------------------------------
# Layer model
# --------------------------------------------------------------------------


def init_layer_params(
    key: jax.Array,
    num_items: int,
    num_nodes: int,
    num_layers: int,
    seq_len: int,
    embed_size: int,
    dtype=jnp.float32,
) -> Params:
    keys = jax.random.split(key, num_layers + 1)
    s = 0.05
    embed_rows = num_items + num_nodes * (num_layers - 1)
    params: Params = {
        "embedding": (
            jax.random.normal(keys[0], (embed_rows, embed_size)) * s
        ).astype(dtype),
        "heads": [],
    }
    for d in range(num_layers):
        flat = (seq_len + d) * embed_size
        params["heads"].append(
            {
                "weight": (jax.random.normal(keys[d + 1], (num_nodes, flat)) * s).astype(
                    dtype
                ),
                "bias": jnp.zeros((num_nodes,), dtype),
            }
        )
    return params


def layer_forward_training(
    params: Params,
    seqs: jnp.ndarray,  # [B, L] dense item ids, -1 pad
    paths: jnp.ndarray,  # [B, J, D] node indices
    num_items: int,
    num_nodes: int,
) -> list[jnp.ndarray]:
    """Logits per layer: list of [B, J, K].

    Layer d scores given the sequence plus the path prefix path[:, :, :d].
    """
    table = params["embedding"]
    b, l = seqs.shape
    _, j, num_layers = paths.shape
    e = table.shape[1]
    seq_flat = embed_lookup(table, seqs).reshape(b, l * e)

    out: list[jnp.ndarray] = []
    for d in range(num_layers):
        w = params["heads"][d]["weight"]  # [K, (L+d)E]
        bias = params["heads"][d]["bias"]
        w_seq = w[:, : l * e]
        seq_part = seq_flat @ w_seq.T  # [B, K], shared across J paths
        if d == 0:
            logits = seq_part[:, None, :] + bias
            logits = jnp.broadcast_to(logits, (b, j, num_nodes))
        else:
            # prefix nodes with per-layer offsets
            offsets = num_items + jnp.arange(d, dtype=paths.dtype) * num_nodes
            prefix_ids = paths[:, :, :d] + offsets  # [B, J, d]
            prefix_flat = embed_lookup(table, prefix_ids).reshape(b, j, d * e)
            w_pre = w[:, l * e :]
            logits = seq_part[:, None, :] + prefix_flat @ w_pre.T + bias
        out.append(logits)
    return out


def layer_logits_from_emb(
    heads: list[Params],
    seq_e: jnp.ndarray,  # [B, L, E] sequence embeddings (pad rows zeroed)
    prefix_e: jnp.ndarray,  # [B, J, D-1, E] path-node embeddings by position
    num_nodes: int,
) -> list[jnp.ndarray]:
    """layer_forward_training from materialized embeddings (sparse step).

    A path node at position i always uses embedding row
    ``num_items + i*num_nodes + node`` regardless of which layer consumes
    it, so the sparse train step gathers each of the D-1 positions once and
    layer d slices positions [0, d).  Identical math to the dense forward.
    """
    b, l, e = seq_e.shape
    j = prefix_e.shape[1]
    seq_flat = seq_e.reshape(b, l * e)
    out: list[jnp.ndarray] = []
    for d, head in enumerate(heads):
        w = head["weight"]  # [K, (L+d)E]
        bias = head["bias"]
        seq_part = seq_flat @ w[:, : l * e].T  # [B, K]
        if d == 0:
            logits = jnp.broadcast_to(
                (seq_part[:, None, :] + bias), (b, j, num_nodes)
            )
        else:
            prefix_flat = prefix_e[:, :, :d].reshape(b, j, d * e)
            logits = seq_part[:, None, :] + prefix_flat @ w[:, l * e :].T + bias
        out.append(logits)
    return out


def layer_forward_beam(
    params: Params,
    seq_part_d: jnp.ndarray,  # [B, K] precomputed seq contribution for layer d
    prefix: jnp.ndarray,  # [B, W, d] node indices chosen so far
    d: int,
    num_items: int,
    num_nodes: int,
) -> jnp.ndarray:
    """Beam-search scoring of layer d for W candidate prefixes: [B, W, K]."""
    table = params["embedding"]
    e = table.shape[1]
    bias = params["heads"][d]["bias"]
    if d == 0:
        return seq_part_d[:, None, :] + bias
    # prefix embeddings all live in the node region (rows >= num_items, only
    # K*(D-1) of them) — gather from that slice so the gather works over a
    # cache-resident table instead of the whole item-scaled one (6.2ms ->
    # sub-ms per serve batch at 10M items, xplane)
    node_table = table[num_items:]
    offsets = jnp.arange(d, dtype=prefix.dtype) * num_nodes
    prefix_ids = prefix + offsets
    bsz, w_beam = prefix.shape[:2]
    prefix_flat = embed_lookup(node_table, prefix_ids).reshape(
        bsz, w_beam, d * e
    )
    w = params["heads"][d]["weight"]
    l_e = w.shape[1] - d * e
    w_pre = w[:, l_e:]
    return seq_part_d[:, None, :] + prefix_flat @ w_pre.T + bias


def layer_seq_parts(params: Params, seqs: jnp.ndarray) -> list[jnp.ndarray]:
    """Per-layer sequence contributions [B, K] (computed once per query)."""
    table = params["embedding"]
    b, l = seqs.shape
    e = table.shape[1]
    seq_flat = embed_lookup(table, seqs).reshape(b, l * e)
    out = []
    for head in params["heads"]:
        w_seq = head["weight"][:, : l * e]
        out.append(seq_flat @ w_seq.T)
    return out


# --------------------------------------------------------------------------
# Rerank model
# --------------------------------------------------------------------------


def init_rerank_params(
    key: jax.Array, num_items: int, seq_len: int, embed_size: int, dtype=jnp.float32
) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    s = 0.05
    return {
        "embedding": (jax.random.normal(k1, (num_items, embed_size)) * s).astype(dtype),
        "linear": {
            "weight": (
                jax.random.normal(k2, (embed_size, seq_len * embed_size)) * s
            ).astype(dtype),
            "bias": jnp.zeros((embed_size,), dtype),
        },
        # softmax projection (RerankModel.softmaxWeights: randn(0, 0.05))
        "softmax_w": (jax.random.normal(k3, (num_items, embed_size)) * s).astype(dtype),
        "softmax_b": jnp.zeros((num_items,), dtype),
    }


def rerank_user_vector(params: Params, seqs: jnp.ndarray) -> jnp.ndarray:
    """[B, L] -> [B, E]."""
    table = params["embedding"]
    b, l = seqs.shape
    e = table.shape[1]
    flat = embed_lookup(table, seqs).reshape(b, l * e)
    return flat @ params["linear"]["weight"].T + params["linear"]["bias"]


# exact Gumbel-top-k negative sampling materializes [B, num_items]; above
# this catalog size the rejection path is used instead (same pattern as
# train/sampler.py's level sampler)
_EXACT_SAMPLING_MAX = 1 << 18


def sample_negatives(
    key: jax.Array, labels: jnp.ndarray, num_items: int, num_sampled: int
) -> jnp.ndarray:
    """[B] labels -> [B, S] uniform negatives, no duplicates, != label.

    Exact without-replacement Gumbel top-k (the reference's semantics,
    SampledSoftmaxLoss.scala:179-199) up to 2^18 items; above that, an
    oversampled rejection draw (first S of ``2S+16`` candidates ranked
    valid-first) — at that scale the residual dup/positive probability per
    row is < S*(2S+16)/2^18, negligible for the S=1..20 regime."""
    b = labels.shape[0]
    if num_items <= _EXACT_SAMPLING_MAX:
        g = -jnp.log(
            -jnp.log(
                jax.random.uniform(key, (b, num_items), minval=1e-20, maxval=1.0)
            )
        )
        g = jnp.where(
            jnp.arange(num_items)[None, :] == labels[:, None], -jnp.inf, g
        )
        _, negs = jax.lax.top_k(g, num_sampled)  # [B, S]
        return negs
    m = 2 * num_sampled + 16
    cand = jax.random.randint(key, (b, m), 0, num_items, dtype=jnp.int32)
    not_pos = cand != labels[:, None].astype(jnp.int32)
    eq = cand[:, :, None] == cand[:, None, :]
    tri = jnp.tril(jnp.ones((m, m), bool), k=-1)
    dup = jnp.any(eq & tri[None], axis=-1)
    ok = not_pos & ~dup
    arange = jnp.arange(m)[None, :]
    rank = jnp.where(ok, arange, m + arange)
    order = jnp.argsort(rank, axis=1)[:, :num_sampled]
    # int32 one-hot contraction, not take_along_axis: the latter compiles to
    # a pathological scalar gather on TPU and this runs every rerank step
    from dismember_tpu.retrieval.tree_beam import onehot_select

    return onehot_select(cand, order)


def sampled_softmax_loss(
    params: Params,
    user_vecs: jnp.ndarray,  # [B, E]
    labels: jnp.ndarray,  # [B] dense item ids
    key: jax.Array,
    num_sampled: int,
) -> jnp.ndarray:
    """Per-row sampled softmax (batchMode=false): pos + uniform negatives
    without replacement excluding the positive, CE at position 0."""
    num_items = params["softmax_w"].shape[0]
    negs = sample_negatives(key, labels, num_items, num_sampled)
    cand = jnp.concatenate(
        [labels[:, None].astype(negs.dtype), negs], axis=1
    )  # [B, 1+S]
    w = params["softmax_w"][cand]  # [B, 1+S, E]
    bb = params["softmax_b"][cand]  # [B, 1+S]
    logits = jnp.einsum("be,bse->bs", user_vecs, w) + bb
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(logp[:, 0])


# full_softmax_loss materializes [B, num_items] logits; above this item
# count the chunked logsumexp path is used (same exact result)
_FULL_SOFTMAX_MAX = 1 << 18


def full_softmax_loss(
    params: Params, user_vecs: jnp.ndarray, labels: jnp.ndarray
) -> jnp.ndarray:
    """Exact softmax CE over all items (SampledSoftmaxLoss.fullEvaluate).

    At deep catalogs the one-shot [B, num_items] logits tensor doesn't fit;
    the chunked path streams the catalog through a lax.scan accumulating the
    per-row logsumexp — mathematically identical, O(B * chunk) memory."""
    w = params["softmax_w"]
    bias = params["softmax_b"]
    n = w.shape[0]
    labels = labels.astype(jnp.int32)
    if n <= _FULL_SOFTMAX_MAX:
        logits = user_vecs @ w.T + bias
        logp = jax.nn.log_softmax(logits, axis=-1)
        picked = jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        return -jnp.mean(picked)
    chunk = _FULL_SOFTMAX_MAX >> 2
    n_pad = -(-n // chunk) * chunk
    w_pad = jnp.pad(w, ((0, n_pad - n), (0, 0)))
    # pad lanes must not contribute to the normalizer
    b_pad = jnp.pad(bias, (0, n_pad - n), constant_values=-jnp.inf)
    w_chunks = w_pad.reshape(n_pad // chunk, chunk, -1)
    b_chunks = b_pad.reshape(n_pad // chunk, chunk)

    def body(lse, wb):
        wc, bc = wb
        logits = user_vecs @ wc.T + bc
        return jnp.logaddexp(lse, jax.nn.logsumexp(logits, axis=-1)), None

    b = user_vecs.shape[0]
    lse, _ = jax.lax.scan(
        body, jnp.full((b,), -jnp.inf), (w_chunks, b_chunks)
    )
    picked = (
        jnp.einsum("be,be->b", user_vecs, w[labels]) + bias[labels]
    )
    return -jnp.mean(picked - lse)


def rerank_scores(
    params: Params, user_vecs: jnp.ndarray, candidates: jnp.ndarray
) -> jnp.ndarray:
    """Score candidate items [B, C] against user vectors [B, E]."""
    safe = jnp.maximum(candidates, 0)
    w = params["softmax_w"][safe]
    b = params["softmax_b"][safe]
    return jnp.einsum("be,bce->bc", user_vecs, w) + b
