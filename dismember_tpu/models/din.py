"""DIN scorer: shared embedding + scaled-dot attention + MLP.

Architecture parity with tdm/.../model/DIN.scala:12-44 and scalann
nn/Attention.scala:
- one embedding table over all tree-node codes (2^(max_level+1) - 1 rows),
  shared between the target item and the behavior sequence;
- attention: Q = target item embed [.., 1, E], K = V = sequence embeds
  [.., L, E]; scores scaled by 1/sqrt(E); padded positions masked to
  Float.MinValue (nn/Mask.scala:13) before softmax; output passed through a
  bias-free Linear(E, E);
- concat([item, attention]) -> Linear(2E, E) -> ReLU -> Linear(E, 1) logit.

TPU-first difference from the reference: the reference duplicates each user
sequence once per sampled node (tdm MiniBatch.scala:49-88, ~90 copies/target).
Here the *grouped* forward scores U candidate nodes against one sequence in a
single einsum: seq embeddings are looked up once per target, and the attention
becomes a [B, U, L] batched matmul that XLA maps straight onto the MXU.  Same
math, ~U× less HBM traffic on the sequence side.

Weight init parity: all weights ~ N(0, 0.05) (scalann Linear.scala:12,
EmbeddingShare.scala:21), biases zero (Linear.scala:13).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from dismember_tpu.constants import MASK_VALUE, PADDING_IDX
from dismember_tpu.models.embedding import embed_lookup

Params = dict[str, Any]


def init_params(
    key: jax.Array, num_index: int, embed_size: int, dtype=jnp.float32
) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s = 0.05
    return {
        "embedding": (jax.random.normal(k1, (num_index, embed_size)) * s).astype(dtype),
        "att_linear": {
            "weight": (jax.random.normal(k2, (embed_size, embed_size)) * s).astype(dtype)
        },
        "mlp1": {
            "weight": (jax.random.normal(k3, (embed_size, 2 * embed_size)) * s).astype(dtype),
            "bias": jnp.zeros((embed_size,), dtype),
        },
        "mlp2": {
            "weight": (jax.random.normal(k4, (1, embed_size)) * s).astype(dtype),
            "bias": jnp.zeros((1,), dtype),
        },
    }


def forward(params: Params, items: jnp.ndarray, seqs: jnp.ndarray) -> jnp.ndarray:
    """Grouped forward.

    items: [B, U] int32 node codes (targets / candidates), -1 = invalid
    seqs:  [B, L] int32 node codes of the user sequence, -1 = padding
    returns logits [B, U] (raw, pre-sigmoid — matching the reference's model
    output consumed by BCEWithLogits and beam search).
    """
    table = params["embedding"]
    embed_size = table.shape[1]
    item_e = embed_lookup(table, items)  # [B, U, E]
    seq_e = embed_lookup(table, seqs)  # [B, L, E]

    # scaled dot-product attention, padding masked to Float.MinValue
    scale = 1.0 / jnp.sqrt(jnp.asarray(embed_size, table.dtype))
    scores = jnp.einsum("bue,ble->bul", item_e, seq_e) * scale
    pad = (seqs == PADDING_IDX)[:, None, :]  # [B, 1, L]
    scores = jnp.where(pad, MASK_VALUE, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    att = jnp.einsum("bul,ble->bue", probs, seq_e)
    att = att @ params["att_linear"]["weight"].T  # bias-free Linear(E, E)

    h = jnp.concatenate([item_e, att], axis=-1)  # [B, U, 2E]
    h = jax.nn.relu(h @ params["mlp1"]["weight"].T + params["mlp1"]["bias"])
    logit = h @ params["mlp2"]["weight"].T + params["mlp2"]["bias"]  # [B, U, 1]
    return logit[..., 0]


# ---------------------------------------------------------------------------
# Precomputed-sequence variant for beam search: the sequence side (embedding
# gather + padding mask) is identical at every tree level, so serving
# computes it once per query and re-applies it per level.
# ---------------------------------------------------------------------------


def precompute_seq(params: Params, seqs: jnp.ndarray):
    """One-time per-query context: (seq embeddings [B, L, E], pad mask)."""
    seq_e = embed_lookup(params["embedding"], seqs)
    pad = (seqs == PADDING_IDX)[:, None, :]
    return seq_e, pad


def apply_with_ctx(params: Params, items: jnp.ndarray, ctx) -> jnp.ndarray:
    """forward() with the sequence side precomputed by :func:`precompute_seq`."""
    item_e = embed_lookup(params["embedding"], items)
    return apply_from_emb(params, item_e, ctx)


def ctx_from_seq_emb(params: Params, seq_e: jnp.ndarray, pad: jnp.ndarray):
    """precompute_seq from already-materialized sequence embeddings.

    Used by the sparse-embedding train step (train/tdm.py), which gathers all
    touched rows once and differentiates w.r.t. the gathered rows instead of
    the full table.  ``pad``: [B, 1, L] bool mask of padded positions."""
    return seq_e, pad


def apply_from_emb(params: Params, item_e: jnp.ndarray, ctx) -> jnp.ndarray:
    """Score candidates whose embeddings are already materialized.

    The packed-pair beam path (retrieval/packed_beam.py) gathers candidate
    embeddings out of the pair table itself, so the scorer must accept
    [B, U, E] embeddings instead of codes.  Identical math to apply_with_ctx
    for any candidate whose embedding matches the table row.
    """
    seq_e, pad = ctx
    table = params["embedding"]
    embed_size = table.shape[1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(embed_size, table.dtype))
    scores = jnp.einsum("bue,ble->bul", item_e, seq_e) * scale
    scores = jnp.where(pad, MASK_VALUE, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    att = jnp.einsum("bul,ble->bue", probs, seq_e)
    att = att @ params["att_linear"]["weight"].T
    h = jnp.concatenate([item_e, att], axis=-1)
    h = jax.nn.relu(h @ params["mlp1"]["weight"].T + params["mlp1"]["bias"])
    logit = h @ params["mlp2"]["weight"].T + params["mlp2"]["bias"]
    return logit[..., 0]
