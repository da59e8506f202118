"""16-level loop: q1-style gather program + separate combine micro-programs.

Any program that BOTH gathers from the big tables and combines the
(exists, logits) pair runs its gather ~100x slow; the q1-shaped program
(returns ch, logits, exists separately) measures fast.  Keep the combines in
their own tiny executables.
"""

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
    scores0 = jnp.asarray(rng.normal(size=(b, width)), jnp.float32)
    max_code = n_codes - 1
    NEG = jnp.float32(-3.4e38)

    @jax.jit
    def gather_step(frontier, scores, meta, table):
        _, top_idx = jax.lax.top_k(scores, beam)
        top_codes = onehot_select(frontier, top_idx)
        c1 = 2 * top_codes + 1
        c2 = jnp.where(top_codes < 0, -1, 2 * top_codes + 2)
        children = jnp.stack([c1, c2], axis=-1).reshape(b, width)
        cc = jnp.clip(children, 0, max_code)
        exists = (meta[cc][..., 0] > 0) & (children >= 0)
        logits = table[cc].sum(-1)
        return children, logits, exists

    @jax.jit
    def combine(children, logits, exists):
        return jnp.where(exists, children, -1), jnp.where(exists, logits, NEG)

    def run(frontier, scores):
        f, s = frontier, scores
        for _ in range(16):
            ch, l, e = gather_step(f, s, meta, table)
            f, s = combine(ch, l, e)
        return f, s

    out = run(frontier, scores0)
    jax.block_until_ready(out)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(frontier, scores0)
    jax.block_until_ready(out)
    ms = 1e3 * (time.perf_counter() - t0) / iters
    print(json.dumps({"variant": "16_levels_split_programs",
                      "ms": round(ms, 3)}), flush=True)

    # sanity: per-iteration blocking (no pipelining flattery)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(frontier, scores0)
        jax.block_until_ready(out)
    ms = 1e3 * (time.perf_counter() - t0) / iters
    print(json.dumps({"variant": "16_levels_split_programs_blocked",
                      "ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
