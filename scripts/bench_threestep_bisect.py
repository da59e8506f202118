"""Bisect three_step: which dispatch is slow when fed the previous one's
outputs (vs host-built inputs of identical shape/values)?"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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

    @jax.jit
    def idx_only(frontier, scores):
        _, top_idx = jax.lax.top_k(scores, beam)
        top_codes = onehot_select(frontier, top_idx)
        ch = jnp.stack([2 * top_codes + 1, 2 * top_codes + 2], axis=-1)
        ch = ch.reshape(b, width)
        return ch, jnp.clip(ch, 0, max_code)

    @jax.jit
    def g_alone(table, meta, cc):
        return table[cc], meta[cc]

    @jax.jit
    def combine(ch, mrows, trows):
        exists = mrows[..., 0] > 0
        return ch, jnp.where(exists, trows.sum(-1), NEG)

    def t(name, fn, *args, iters=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        ms = 1e3 * (time.perf_counter() - t0) / iters
        print(json.dumps({"variant": name, "ms": round(ms, 3)}), flush=True)
        return out

    # 1) device-chained inputs, each stage timed blocked
    ch, cc = t("idx_only", idx_only, frontier, scores)
    trows, mrows = t("g_alone_dev_idx", g_alone, table, meta, cc)
    t("combine_dev", combine, ch, mrows, trows)

    # 2) same VALUES but host-rebuilt indices
    cc_host = jnp.asarray(np.asarray(cc))
    ch_host = jnp.asarray(np.asarray(ch))
    trows2, mrows2 = t("g_alone_host_idx", g_alone, table, meta, cc_host)
    t("combine_host", combine, ch_host, mrows2, trows2)

    # 3) wider-spread indices (uniform over the whole table), host-built
    cc_wide = jnp.asarray(rng.integers(0, n_codes, size=(b, width)), jnp.int32)
    t("g_alone_wide_idx", g_alone, table, meta, cc_wide)

    # 4) leaf-level spread: contiguous block of 1M leaves
    cc_leaf = jnp.asarray(
        rng.integers(n_codes // 2, n_codes, size=(b, width)), jnp.int32)
    t("g_alone_leaf_idx", g_alone, table, meta, cc_leaf)


if __name__ == "__main__":
    main()
