"""Batched Deep Retrieval path beam search.

Parity with deep-retrieval/.../model/CandidateSearcher.scala:22-58: starting
from the bare sequence, at each of the D layers score all K nodes for every
kept path, multiply by the running path probability (softmax over K), and
keep the top ``beam`` paths; return the beam's paths + probabilities.

TPU-first: the reference runs one query at a time with a per-path gemv
(LayerModel.inference); here the whole batch advances layer-synchronously:
the sequence contribution of each head is computed once per query, the
prefix contribution is a [B, W, dE]x[dE, K] matmul, and the top-k over
W*K joint probabilities is one ``lax.top_k`` — shapes static in (B, beam).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dismember_tpu.models.dr_models import layer_forward_beam, layer_seq_parts


@functools.partial(
    jax.jit, static_argnames=("beam", "num_items", "num_nodes", "num_layers")
)
def path_beam_search(
    params,
    seqs: jnp.ndarray,  # [B, L] dense ids (-1 pad)
    beam: int,
    num_items: int,
    num_nodes: int,
    num_layers: int,
    seq_parts=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (paths [B, beam, D] int32, probs [B, beam] float32).

    ``seq_parts``: optional precomputed per-layer sequence contributions
    (layer_seq_parts) — the sharded serving path (train/spmd_dr.py) computes
    them from the row-sharded table and passes a node-table-only ``params``
    with ``num_items=0``."""
    b = seqs.shape[0]
    if seq_parts is None:
        seq_parts = layer_seq_parts(params, seqs)

    # layer 0: probabilities over K from the bare sequence
    logits0 = layer_forward_beam(
        params, seq_parts[0], jnp.zeros((b, 1, 0), jnp.int32), 0, num_items, num_nodes
    )  # [B, 1, K]
    probs0 = jax.nn.softmax(logits0[:, 0, :], axis=-1)  # [B, K]
    k_eff = min(beam, num_nodes)
    top_p, top_n = jax.lax.top_k(probs0, k_eff)  # [B, k_eff]
    if k_eff < beam:
        pad = beam - k_eff
        top_p = jnp.pad(top_p, ((0, 0), (0, pad)))
        top_n = jnp.pad(top_n, ((0, 0), (0, pad)))
    paths = top_n[:, :, None].astype(jnp.int32)  # [B, beam, 1]
    probs = top_p  # [B, beam]

    from dismember_tpu.retrieval.tree_beam import onehot_select

    for d in range(1, num_layers):
        logits = layer_forward_beam(
            params, seq_parts[d], paths, d, num_items, num_nodes
        )  # [B, beam, K]
        node_probs = jax.nn.softmax(logits, axis=-1)
        joint = probs[:, :, None] * node_probs  # [B, beam, K]
        flat = joint.reshape(b, -1)
        top_p, top_idx = jax.lax.top_k(flat, beam)
        which_path = top_idx // num_nodes  # [B, beam]
        which_node = (top_idx % num_nodes).astype(jnp.int32)
        # gather the surviving prefixes with a one-hot contraction
        prev = jnp.stack(
            [onehot_select(paths[:, :, i], which_path) for i in range(d)], axis=2
        )
        paths = jnp.concatenate([prev, which_node[:, :, None]], axis=2)
        probs = top_p

    return paths, probs
