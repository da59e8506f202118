"""Level body with deadness encoded in codes (-1) — no alive-mask expansion.

Also checks numerical equivalence with the current level body on a random
frontier that respects the carry invariant (dead <=> code == -1).
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
    def body_code_encoded(frontier, scores, meta, table):
        _, top_idx = jax.lax.top_k(scores, beam)
        top_codes = onehot_select(frontier, top_idx)  # -1 == dead
        c1 = 2 * top_codes + 1  # -1 -> -1
        c2 = jnp.where(top_codes < 0, -1, 2 * top_codes + 2)
        children = jnp.stack([c1, c2], axis=-1).reshape(b, width)
        cc = jnp.clip(children, 0, max_code)
        exists = (meta[cc][..., 0] > 0) & (children >= 0)
        masked = jnp.where(exists, children, -1)
        logits = table[jnp.clip(masked, 0, max_code)].sum(-1)
        return masked, jnp.where(exists, logits, NEG)

    timeit("body_code_encoded", body_code_encoded, frontier, scores, meta,
           table)

    # full 16-level scan with this body
    @jax.jit
    def scan16(frontier, scores, meta, table):
        def step(carry, _):
            f, s = carry
            return body_code_encoded.__wrapped__(f, s, meta, table), None
        (f, s), _ = jax.lax.scan(step, (frontier, scores), None, length=16)
        return f, s

    timeit("scan16_code_encoded", scan16, frontier, scores, meta, table,
           iters=10)


if __name__ == "__main__":
    main()
