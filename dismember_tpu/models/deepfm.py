"""DeepFM scorer: factorization machine + DNN over [item; sequence] embeddings.

Architecture parity with tdm/.../model/DeepFM.scala:9-47 and scalann
nn/FM.scala:12-41:
- shared embedding over all tree-node codes;
- FM term over the (L+1) embedding vectors v_i of [item; seq]:
  (||sum_i v_i||^2 - sum_i ||v_i||^2) / 2;
- DNN: flatten -> Linear((L+1)E, L+1) -> ReLU -> Linear(L+1, 1);
- output = FM + DNN (raw logit).  No attention mask input (useMask=false for
  deepfm, tdm/.../model/TDM.scala:27-30).

Grouped forward: like DIN, U candidate items share one sequence; the sequence
embedding sum and squared-norm sum are computed once per target.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from dismember_tpu.models.embedding import embed_lookup

Params = dict[str, Any]


def init_params(
    key: jax.Array, num_index: int, embed_size: int, seq_len: int, dtype=jnp.float32
) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    s = 0.05
    total = seq_len + 1
    return {
        "embedding": (jax.random.normal(k1, (num_index, embed_size)) * s).astype(dtype),
        "mlp1": {
            "weight": (jax.random.normal(k2, (total, total * embed_size)) * s).astype(dtype),
            "bias": jnp.zeros((total,), dtype),
        },
        "mlp2": {
            "weight": (jax.random.normal(k3, (1, total)) * s).astype(dtype),
            "bias": jnp.zeros((1,), dtype),
        },
    }


def forward(params: Params, items: jnp.ndarray, seqs: jnp.ndarray) -> jnp.ndarray:
    """items [B, U], seqs [B, L] -> logits [B, U]."""
    table = params["embedding"]
    item_e = embed_lookup(table, items)  # [B, U, E]
    seq_e = embed_lookup(table, seqs)  # [B, L, E]

    # FM: (||v_item + sum_seq||^2 - (||v_item||^2 + sum_i ||v_seq_i||^2)) / 2
    seq_sum = jnp.sum(seq_e, axis=1)  # [B, E]
    seq_sq = jnp.sum(seq_e * seq_e, axis=(1, 2))  # [B]
    total_sum = item_e + seq_sum[:, None, :]  # [B, U, E]
    sum_square = jnp.sum(total_sum * total_sum, axis=-1)  # [B, U]
    square_sum = jnp.sum(item_e * item_e, axis=-1) + seq_sq[:, None]  # [B, U]
    fm = (sum_square - square_sum) * 0.5  # [B, U]

    # DNN over concat([item_e, seq_flat])
    b, u, e = item_e.shape
    seq_flat = seq_e.reshape(b, -1)  # [B, L*E]
    w1 = params["mlp1"]["weight"]  # [T, (L+1)E]
    # split the first matmul: contribution of the item part + shared seq part
    w1_item = w1[:, :e]  # [T, E]
    w1_seq = w1[:, e:]  # [T, L*E]
    h = item_e @ w1_item.T + (seq_flat @ w1_seq.T)[:, None, :] + params["mlp1"]["bias"]
    h = jax.nn.relu(h)  # [B, U, T]
    dnn = (h @ params["mlp2"]["weight"].T + params["mlp2"]["bias"])[..., 0]  # [B, U]
    return fm + dnn


# ---------------------------------------------------------------------------
# Precomputed-sequence variant for beam search: for DeepFM the entire
# sequence contribution (embedding sum, squared norm, and the DNN's sequence
# matmul) is level-invariant.
# ---------------------------------------------------------------------------


def precompute_seq(params: Params, seqs: jnp.ndarray):
    table = params["embedding"]
    seq_e = embed_lookup(table, seqs)  # [B, L, E]
    seq_sum = jnp.sum(seq_e, axis=1)  # [B, E]
    seq_sq = jnp.sum(seq_e * seq_e, axis=(1, 2))  # [B]
    b = seq_e.shape[0]
    e = table.shape[1]
    w1_seq = params["mlp1"]["weight"][:, e:]
    seq_dnn = seq_e.reshape(b, -1) @ w1_seq.T  # [B, T]
    return seq_sum, seq_sq, seq_dnn


def apply_with_ctx(params: Params, items: jnp.ndarray, ctx) -> jnp.ndarray:
    item_e = embed_lookup(params["embedding"], items)  # [B, U, E]
    return apply_from_emb(params, item_e, ctx)


def ctx_from_seq_emb(params: Params, seq_e: jnp.ndarray, pad: jnp.ndarray):
    """precompute_seq from already-materialized sequence embeddings (sparse
    train step).  ``pad`` is unused: padded rows are already zeroed, and FM /
    DNN terms of zero vectors contribute nothing (matching useMask=false)."""
    del pad
    seq_sum = jnp.sum(seq_e, axis=1)
    seq_sq = jnp.sum(seq_e * seq_e, axis=(1, 2))
    b = seq_e.shape[0]
    e = seq_e.shape[-1]
    w1_seq = params["mlp1"]["weight"][:, e:]
    seq_dnn = seq_e.reshape(b, -1) @ w1_seq.T
    return seq_sum, seq_sq, seq_dnn


def apply_from_emb(params: Params, item_e: jnp.ndarray, ctx) -> jnp.ndarray:
    """Score candidates from materialized embeddings (packed beam path)."""
    seq_sum, seq_sq, seq_dnn = ctx
    e = item_e.shape[-1]
    total_sum = item_e + seq_sum[:, None, :]
    sum_square = jnp.sum(total_sum * total_sum, axis=-1)
    square_sum = jnp.sum(item_e * item_e, axis=-1) + seq_sq[:, None]
    fm = (sum_square - square_sum) * 0.5
    w1_item = params["mlp1"]["weight"][:, :e]
    h = jax.nn.relu(
        item_e @ w1_item.T + seq_dnn[:, None, :] + params["mlp1"]["bias"]
    )
    dnn = (h @ params["mlp2"]["weight"].T + params["mlp2"]["bias"])[..., 0]
    return fm + dnn
