"""Is a row gather fast ONLY when it is its own executable with entry-param
indices?

Programs:
  g_alone:    (table, meta, cc) -> (table[cc], meta[cc])        [pure gather]
  idx_only:   (frontier, scores) -> cc                          [index compute]
  three_step: idx_only -> g_alone -> combine (3 dispatches/level x 16 levels)
  g_fused:    (table, meta, frontier, scores) -> gathers        [one program]
"""

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
    return ms


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

    cc0 = jnp.clip(2 * frontier + 1, 0, max_code)

    @jax.jit
    def g_alone(table, meta, cc):
        return table[cc], meta[cc]

    timeit("g_alone_2d_idx", g_alone, table, meta, cc0)

    @jax.jit
    def g_table_only(table, cc):
        return table[cc]

    timeit("g_table_only", g_table_only, table, cc0)

    @jax.jit
    def idx_only(frontier, scores):
        _, top_idx = jax.lax.top_k(scores, beam)
        top_codes = onehot_select(frontier, top_idx)
        ch = jnp.stack([2 * top_codes + 1, 2 * top_codes + 2], axis=-1)
        ch = ch.reshape(b, width)
        return ch, jnp.clip(ch, 0, max_code)

    timeit("idx_only", idx_only, frontier, scores)

    @jax.jit
    def combine(ch, mrows, trows):
        exists = mrows[..., 0] > 0
        return ch, jnp.where(exists, trows.sum(-1), NEG)

    def three_step(frontier, scores):
        f, s = frontier, scores
        for _ in range(16):
            ch, cc = idx_only(f, s)
            trows, mrows = g_alone(table, meta, cc)
            f, s = combine(ch, mrows, trows)
        return f, s

    out = three_step(frontier, scores)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = three_step(frontier, scores)
    jax.block_until_ready(out)
    ms = 1e3 * (time.perf_counter() - t0) / 10
    print(json.dumps({"variant": "three_step_16_levels", "ms": round(ms, 3)}),
          flush=True)

    @jax.jit
    def g_fused(table, meta, frontier, scores):
        ch, cc = idx_only.__wrapped__(frontier, scores)
        return ch, table[cc], meta[cc]

    timeit("g_fused_one_program", g_fused, table, meta, frontier, scores)


if __name__ == "__main__":
    main()
