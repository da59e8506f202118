"""Matrix of select/mask formulations after the meta gather."""

import json
import os
import sys
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


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dismember_tpu.retrieval.tree_beam import onehot_select

    n_codes = 2_000_001
    b, beam, width = 4096, 20, 40
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (n_codes, 16), jnp.float32)
    meta = jax.random.normal(key, (n_codes, 2), jnp.float32)
    # sentinel-extended meta: one extra all-zero row at index n_codes
    meta_ext = jnp.concatenate([meta, jnp.zeros((1, 2), jnp.float32)], axis=0)
    rng = np.random.default_rng(0)
    frontier = jnp.asarray(rng.integers(2**10, 2**11, size=(b, width)), jnp.int32)
    scores = jnp.asarray(rng.normal(size=(b, width)), jnp.float32)
    max_code = n_codes - 1
    NEG = jnp.float32(-3.4e38)
    barrier = jax.lax.optimization_barrier

    def chain(frontier, scores):
        _, top_idx = jax.lax.top_k(scores, beam)
        top_codes = onehot_select(frontier, top_idx)
        ch = jnp.stack([2 * top_codes + 1, 2 * top_codes + 2], axis=-1)
        ch = ch.reshape(b, width)
        return ch, jnp.clip(ch, 0, max_code)

    @jax.jit
    def q1_no_where(frontier, scores, meta, table):
        ch, cc = chain(frontier, scores)
        exists = meta[cc][..., 0] > 0
        return ch, table[cc].sum(-1), exists

    @jax.jit
    def q2_where(frontier, scores, meta, table):
        ch, cc = chain(frontier, scores)
        exists = meta[cc][..., 0] > 0
        return ch, jnp.where(exists, table[cc].sum(-1), NEG)

    @jax.jit
    def q3_arith(frontier, scores, meta, table):
        ch, cc = chain(frontier, scores)
        e = (meta[cc][..., 0] > 0).astype(jnp.float32)
        return ch, e * table[cc].sum(-1) + (1.0 - e) * NEG

    @jax.jit
    def q4_where_barrier(frontier, scores, meta, table):
        ch, cc = chain(frontier, scores)
        exists = meta[cc][..., 0] > 0
        s = table[cc].sum(-1)
        exists, s = barrier((exists, s))
        return ch, jnp.where(exists, s, NEG)

    @jax.jit
    def q5_sentinel_full(frontier, scores, meta_ext, table):
        # frontier uses sentinel code n_codes for dead entries
        _, top_idx = jax.lax.top_k(scores, beam)
        top_codes = onehot_select(frontier, top_idx)
        ch = jnp.stack([2 * top_codes + 1, 2 * top_codes + 2], axis=-1)
        ch = ch.reshape(b, width)
        cs = jnp.minimum(ch, n_codes)
        m = meta_ext[cs]
        e = (m[..., 0] > 0).astype(jnp.int32)
        nxt = e * cs + (1 - e) * n_codes
        logits = table[jnp.minimum(cs, max_code)].sum(-1)
        ef = e.astype(jnp.float32)
        return nxt, ef * logits + (1.0 - ef) * NEG

    timeit("q1_no_where", q1_no_where, frontier, scores, meta, table)
    timeit("q2_where", q2_where, frontier, scores, meta, table)
    timeit("q3_arith", q3_arith, frontier, scores, meta, table)
    timeit("q4_where_barrier", q4_where_barrier, frontier, scores, meta, table)
    timeit("q5_sentinel_full", q5_sentinel_full, frontier, scores, meta_ext,
           table)

    @jax.jit
    def q5_scan16(frontier, scores, meta_ext, table):
        def step(carry, _):
            f, s = carry
            return q5_sentinel_full.__wrapped__(f, s, meta_ext, table), None
        (f, s), _ = jax.lax.scan(step, (frontier, scores), None, length=16)
        return f, s

    timeit("q5_scan16", q5_scan16, frontier, scores, meta_ext, table, iters=10)


if __name__ == "__main__":
    main()
