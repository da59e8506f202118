"""Dump optimized HLO for fast (q1) and slow (q2) select variants."""

import os
import sys

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

    def chain(frontier, scores):
        _, top_idx = jax.lax.top_k(scores, beam)
        top_codes = onehot_select(frontier, top_idx)
        ch = jnp.stack([2 * top_codes + 1, 2 * top_codes + 2], axis=-1)
        ch = ch.reshape(b, width)
        return ch, jnp.clip(ch, 0, max_code)

    def q1(frontier, scores, meta, table):
        ch, cc = chain(frontier, scores)
        exists = meta[cc][..., 0] > 0
        return ch, table[cc].sum(-1), exists

    def q2(frontier, scores, meta, table):
        ch, cc = chain(frontier, scores)
        exists = meta[cc][..., 0] > 0
        return ch, jnp.where(exists, table[cc].sum(-1), NEG)

    for name, fn in [("q1", q1), ("q2", q2)]:
        txt = jax.jit(fn).lower(frontier, scores, meta, table).compile().as_text()
        with open(f"/tmp/{name}_hlo.txt", "w") as f:
            f.write(txt)
        print(name, len(txt))


if __name__ == "__main__":
    main()
