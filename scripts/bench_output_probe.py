"""Which extra output of the level body triggers the 100x slowdown?"""

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

    def chain(frontier, scores):
        top_scores, top_idx = jax.lax.top_k(scores, beam)
        top_codes = onehot_select(frontier, top_idx)
        top_alive = top_scores > NEG / 2
        ch = jnp.stack([2 * top_codes + 1, 2 * top_codes + 2], axis=-1)
        ch = ch.reshape(b, width)
        child_alive = jnp.repeat(top_alive, 2, axis=1)
        cc = jnp.clip(ch, 0, max_code)
        return ch, cc, child_alive

    @jax.jit
    def o_gathers_only(frontier, scores, meta, table):
        _, cc, _ = chain(frontier, scores)
        return meta[cc], table[cc]

    @jax.jit
    def o_plus_ch(frontier, scores, meta, table):
        ch, cc, _ = chain(frontier, scores)
        return ch, meta[cc], table[cc]

    @jax.jit
    def o_plus_alive(frontier, scores, meta, table):
        _, cc, child_alive = chain(frontier, scores)
        return meta[cc], table[cc], child_alive

    @jax.jit
    def o_plus_both(frontier, scores, meta, table):
        ch, cc, child_alive = chain(frontier, scores)
        return ch, meta[cc], table[cc], child_alive

    timeit("gathers_only", o_gathers_only, frontier, scores, meta, table)
    timeit("plus_ch", o_plus_ch, frontier, scores, meta, table)
    timeit("plus_alive", o_plus_alive, frontier, scores, meta, table)
    timeit("plus_both", o_plus_both, frontier, scores, meta, table)


if __name__ == "__main__":
    main()
