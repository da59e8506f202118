"""Cumulative variants of the dummy level body to pinpoint the 5ms step."""

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
    rng = np.random.default_rng(0)
    frontier = jnp.asarray(rng.integers(2**10, 2**11, size=(b, width)), jnp.int32)
    scores = jnp.asarray(rng.normal(size=(b, width)), jnp.float32)
    max_code = n_codes - 1
    NEG = jnp.float32(-3.4e38)

    def prefix(frontier, scores):
        top_scores, top_idx = jax.lax.top_k(scores, beam)
        top_codes = onehot_select(frontier, top_idx)
        top_alive = top_scores > NEG / 2
        ch = jnp.stack([2 * top_codes + 1, 2 * top_codes + 2], axis=-1)
        ch = ch.reshape(b, width)
        child_alive = jnp.repeat(top_alive, 2, axis=1)
        cc = jnp.clip(ch, 0, max_code)
        return ch, cc, child_alive

    @jax.jit
    def v0_gathers(frontier, scores, meta, table):
        ch, cc, child_alive = prefix(frontier, scores)
        return ch, meta[cc], table[cc], child_alive

    @jax.jit
    def v1_sum(frontier, scores, meta, table):
        ch, cc, child_alive = prefix(frontier, scores)
        return ch, meta[cc], table[cc].sum(-1), child_alive

    @jax.jit
    def v2_exists(frontier, scores, meta, table):
        ch, cc, child_alive = prefix(frontier, scores)
        exists = (meta[cc][..., 0] > 0) & child_alive
        return ch, exists, table[cc].sum(-1)

    @jax.jit
    def v3_full(frontier, scores, meta, table):
        ch, cc, child_alive = prefix(frontier, scores)
        exists = (meta[cc][..., 0] > 0) & child_alive
        return ch, jnp.where(exists, table[cc].sum(-1), NEG)

    @jax.jit
    def v4_no_alive(frontier, scores, meta, table):
        ch, cc, _ = prefix(frontier, scores)
        exists = meta[cc][..., 0] > 0
        return ch, jnp.where(exists, table[cc].sum(-1), NEG)

    for name, fn in [("v0_gathers", v0_gathers), ("v1_sum", v1_sum),
                     ("v2_exists", v2_exists), ("v3_full", v3_full),
                     ("v4_no_alive", v4_no_alive)]:
        timeit(name, fn, frontier, scores, meta, table)


if __name__ == "__main__":
    main()


def barrier_variants() -> None:
    import jax
    import jax.numpy as jnp

    from dismember_tpu.retrieval.tree_beam import onehot_select

    n_codes = 2_000_001
    b, beam, width = 4096, 20, 40
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (n_codes, 16), jnp.float32)
    meta = jax.random.normal(key, (n_codes, 2), jnp.float32)
    rng = np.random.default_rng(0)
    frontier = jnp.asarray(rng.integers(2**10, 2**11, size=(b, width)), jnp.int32)
    scores = jnp.asarray(rng.normal(size=(b, width)), jnp.float32)
    max_code = n_codes - 1
    NEG = jnp.float32(-3.4e38)
    barrier = jax.lax.optimization_barrier

    def prefix(frontier, scores, cut):
        top_scores, top_idx = jax.lax.top_k(scores, beam)
        top_codes = onehot_select(frontier, top_idx)
        top_alive = top_scores > NEG / 2
        ch = jnp.stack([2 * top_codes + 1, 2 * top_codes + 2], axis=-1)
        ch = ch.reshape(b, width)
        child_alive = jnp.repeat(top_alive, 2, axis=1)
        if cut:
            ch, child_alive = barrier((ch, child_alive))
        cc = jnp.clip(ch, 0, max_code)
        return ch, cc, child_alive

    @jax.jit
    def vb_full(frontier, scores, meta, table):
        ch, cc, child_alive = prefix(frontier, scores, True)
        exists = (meta[cc][..., 0] > 0) & child_alive
        return ch, jnp.where(exists, table[cc].sum(-1), NEG)

    @jax.jit
    def vb_full_i32alive(frontier, scores, meta, table):
        # also avoid bool carry: keep alive as the raw ch sign
        ch, cc, child_alive = prefix(frontier, scores, True)
        exists = (meta[cc][..., 0] > 0) & child_alive
        return ch, jnp.where(exists, table[cc].sum(-1), NEG)

    timeit("vb_full_barrier_cut", vb_full, frontier, scores, meta, table)


barrier_variants()
