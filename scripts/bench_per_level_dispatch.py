"""Per-level jit dispatch vs single-scan beam loop at 1M items.

The scan fuses the exists/logits combine with the gathers and hits a ~100x
slow gather path.  Here each level is ONE cached executable whose first op
combines the previous level's (exists, logits) — entry parameters, already
materialized — and Python queues 16 async dispatches.
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
    logits0 = jnp.asarray(rng.normal(size=(b, width)), jnp.float32)
    exists0 = jnp.ones((b, width), bool)
    max_code = n_codes - 1
    NEG = jnp.float32(-3.4e38)

    @jax.jit
    def level_step(frontier, exists, logits, meta, table):
        # all combines act on entry params (materialized) only
        f = jnp.where(exists, frontier, -1)
        scores = jnp.where(exists, logits, NEG)
        _, top_idx = jax.lax.top_k(scores, beam)
        top_codes = onehot_select(f, top_idx)
        c1 = 2 * top_codes + 1
        c2 = jnp.where(top_codes < 0, -1, 2 * top_codes + 2)
        children = jnp.stack([c1, c2], axis=-1).reshape(b, width)
        cc = jnp.clip(children, 0, max_code)
        m = meta[cc]
        e2 = (m[..., 0] > 0) & (children >= 0)
        l2 = table[cc].sum(-1)
        return children, e2, l2

    @jax.jit
    def harvest(frontier, exists, logits):
        return jnp.where(exists, logits, NEG), jnp.where(exists, frontier, -1)

    def run(frontier, exists, logits):
        f, e, l = frontier, exists, logits
        for _ in range(16):
            f, e, l = level_step(f, e, l, meta, table)
        return harvest(f, e, l)

    out = run(frontier, exists0, logits0)
    jax.block_until_ready(out)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(frontier, exists0, logits0)
    jax.block_until_ready(out)
    ms = 1e3 * (time.perf_counter() - t0) / iters
    print(json.dumps({"variant": "16_levels_per_level_dispatch",
                      "ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
