"""Probe which fusion inside the beam level body is pathological.

The pieces each cost ~0.03ms standalone but the composed body costs ~7ms.
Insert jax.lax.optimization_barrier between stages to find the fusion that
XLA mis-compiles.

Usage: python scripts/bench_fusion_probe.py [--items 1000000]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(name, fn, *args, iters=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = 1e3 * (time.perf_counter() - t0) / iters
    print(json.dumps({"variant": name, "ms": round(ms, 3)}), flush=True)
    return ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--embed", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dismember_tpu.retrieval.tree_beam import onehot_select

    n_codes = 2 * args.items + 1
    b, beam, width = args.batch, 20, 40
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (n_codes, args.embed), jnp.float32)
    meta = jax.random.normal(key, (n_codes, 2), jnp.float32)
    rng = np.random.default_rng(0)
    frontier = jnp.asarray(rng.integers(2**10, 2**11, size=(b, width)), jnp.int32)
    scores = jnp.asarray(rng.normal(size=(b, width)), jnp.float32)
    max_code = n_codes - 1
    barrier = jax.lax.optimization_barrier

    def children_of(frontier, scores, use_barrier=False):
        top_scores, top_idx = jax.lax.top_k(scores, beam)
        if use_barrier:
            top_idx = barrier(top_idx)
        top_codes = onehot_select(frontier, top_idx)
        ch = jnp.stack([2 * top_codes + 1, 2 * top_codes + 2], axis=-1)
        return ch.reshape(b, width)

    @jax.jit
    def idx_only(frontier, scores):
        return children_of(frontier, scores)

    @jax.jit
    def gathers_fused(frontier, scores, meta, table):
        ch = children_of(frontier, scores)
        cc = jnp.clip(ch, 0, max_code)
        return meta[cc], table[cc]

    @jax.jit
    def gathers_barrier(frontier, scores, meta, table):
        ch = barrier(children_of(frontier, scores))
        cc = jnp.clip(ch, 0, max_code)
        return meta[cc], table[cc]

    @jax.jit
    def gathers_barrier_after_topk(frontier, scores, meta, table):
        ch = children_of(frontier, scores, use_barrier=True)
        cc = jnp.clip(ch, 0, max_code)
        return meta[cc], table[cc]

    @jax.jit
    def gather_direct(ch, meta, table):
        cc = jnp.clip(ch, 0, max_code)
        return meta[cc], table[cc]

    ch0 = idx_only(frontier, scores)
    timeit("index_chain_only", idx_only, frontier, scores)
    timeit("gather_from_materialized_idx", gather_direct, ch0, meta, table)
    timeit("fused_chain_gather", gathers_fused, frontier, scores, meta, table)
    timeit("barrier_before_gather", gathers_barrier, frontier, scores, meta, table)
    timeit("barrier_after_topk", gathers_barrier_after_topk, frontier, scores,
           meta, table)


if __name__ == "__main__":
    main()


def probe_body_variants() -> None:
    """Full dummy level body with/without barriers after the gathers."""
    import jax
    import jax.numpy as jnp

    from dismember_tpu.retrieval.tree_beam import onehot_select

    n_codes = 2_000_001
    b, beam, width, e = 4096, 20, 40, 16
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (n_codes, e), jnp.float32)
    meta = jax.random.normal(key, (n_codes, 2), jnp.float32)
    rng = np.random.default_rng(0)
    frontier = jnp.asarray(rng.integers(2**10, 2**11, size=(b, width)), jnp.int32)
    scores = jnp.asarray(rng.normal(size=(b, width)), jnp.float32)
    max_code = n_codes - 1
    NEG = jnp.float32(-3.4e38)
    barrier = jax.lax.optimization_barrier

    def body(frontier, scores, meta, table, use_barrier):
        top_scores, top_idx = jax.lax.top_k(scores, beam)
        top_codes = onehot_select(frontier, top_idx)
        top_alive = top_scores > NEG / 2
        ch = jnp.stack([2 * top_codes + 1, 2 * top_codes + 2], axis=-1)
        ch = ch.reshape(b, width)
        child_alive = jnp.repeat(top_alive, 2, axis=1)
        cc = jnp.clip(ch, 0, max_code)
        m = meta[cc]
        emb = table[cc]
        if use_barrier:
            m, emb = barrier((m, emb))
        exists = (m[..., 0] > 0) & child_alive
        logits = emb.sum(-1)
        return ch, jnp.where(exists, logits, NEG)

    f_plain = jax.jit(lambda f, s, m, t: body(f, s, m, t, False))
    f_bar = jax.jit(lambda f, s, m, t: body(f, s, m, t, True))
    timeit("dummy_body_plain", f_plain, frontier, scores, meta, table)
    timeit("dummy_body_barrier", f_bar, frontier, scores, meta, table)


probe_body_variants()
