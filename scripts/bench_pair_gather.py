"""Pair-table gather prototype: one wide gather per level instead of two
narrow ones.

pair_table[c] packs [emb(2c+1), exists(2c+1), emb(2c+2), exists(2c+2)] so a
level's frontier expansion is a single [B, beam] row gather of ~140B rows
(vs meta[B,2W] + table[B,W,E] tiny-row gathers).  Indices EVOLVE across
levels (doubling per level) to model the real access pattern.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(name, fn, *args, iters=10):
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
    e = 16
    key = jax.random.PRNGKey(0)
    # pair_table[c] = [emb(2c+1) | exists(2c+1) | emb(2c+2) | exists(2c+2)]
    pw = 2 * (e + 1)
    pair_table = jax.random.normal(key, (n_codes, pw), jnp.float32)
    rng = np.random.default_rng(0)
    frontier = jnp.asarray(rng.integers(2**4, 2**5, size=(b, width)), jnp.int32)
    scores0 = jnp.asarray(rng.normal(size=(b, width)), jnp.float32)
    max_code = n_codes - 1
    NEG = jnp.float32(-3.4e38)

    @jax.jit
    def scan_pair(frontier, scores, pair_table):
        def step(carry, _):
            f, s = carry
            _, top_idx = jax.lax.top_k(s, beam)
            top_codes = onehot_select(f, top_idx)  # [B, beam]
            rows = pair_table[jnp.clip(top_codes, 0, max_code)]  # [B,beam,pw]
            pair = rows.reshape(b, beam, 2, e + 1)
            item_e = pair[..., :e]               # [B,beam,2,E]
            exists = pair[..., e] > 0            # [B,beam,2]
            alive = (top_codes >= 0)[..., None] & exists
            logits = item_e.sum(-1)              # dummy scorer
            c1 = 2 * top_codes + 1
            c2 = jnp.where(top_codes < 0, -1, 2 * top_codes + 2)
            children = jnp.stack([c1, c2], axis=-1)
            children = jnp.where(alive, children, -1).reshape(b, width)
            s2 = jnp.where(alive, logits, NEG).reshape(b, width)
            return (children, s2), None

        (f, s), _ = jax.lax.scan(step, (frontier, scores), None, length=16)
        return f, s

    timeit("scan16_pair_gather", scan_pair, frontier, scores0, pair_table)

    pair_bf16 = pair_table.astype(jnp.bfloat16)

    @jax.jit
    def scan_pair_bf16(frontier, scores, pt):
        def step(carry, _):
            f, s = carry
            _, top_idx = jax.lax.top_k(s, beam)
            top_codes = onehot_select(f, top_idx)
            rows = pt[jnp.clip(top_codes, 0, max_code)]
            pair = rows.reshape(b, beam, 2, e + 1)
            item_e = pair[..., :e].astype(jnp.float32)
            exists = pair[..., e] > 0
            alive = (top_codes >= 0)[..., None] & exists
            logits = item_e.sum(-1)
            c1 = 2 * top_codes + 1
            c2 = jnp.where(top_codes < 0, -1, 2 * top_codes + 2)
            children = jnp.stack([c1, c2], axis=-1)
            children = jnp.where(alive, children, -1).reshape(b, width)
            s2 = jnp.where(alive, logits, NEG).reshape(b, width)
            return (children, s2), None

        (f, s), _ = jax.lax.scan(step, (frontier, scores), None, length=16)
        return f, s

    timeit("scan16_pair_gather_bf16", scan_pair_bf16, frontier, scores0,
           pair_bf16)


if __name__ == "__main__":
    main()
