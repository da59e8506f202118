"""Dump optimized HLO for the slow dummy level body to find the bad fusion."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dismember_tpu.retrieval.tree_beam import onehot_select

    n_codes = 2_000_001
    b, beam, width, e = 4096, 20, 40, 16
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (n_codes, e), jnp.float32)
    meta = jax.random.normal(key, (n_codes, 2), jnp.float32)
    rng = np.random.default_rng(0)
    frontier = jnp.asarray(rng.integers(2**10, 2**11, size=(b, width)), jnp.int32)
    scores = jnp.asarray(rng.normal(size=(b, width)), jnp.float32)
    max_code = n_codes - 1
    NEG = jnp.float32(-3.4e38)

    def body(frontier, scores, meta, table):
        top_scores, top_idx = jax.lax.top_k(scores, beam)
        top_codes = onehot_select(frontier, top_idx)
        top_alive = top_scores > NEG / 2
        ch = jnp.stack([2 * top_codes + 1, 2 * top_codes + 2], axis=-1)
        ch = ch.reshape(b, width)
        child_alive = jnp.repeat(top_alive, 2, axis=1)
        cc = jnp.clip(ch, 0, max_code)
        m = meta[cc]
        emb = table[cc]
        exists = (m[..., 0] > 0) & child_alive
        logits = emb.sum(-1)
        return ch, jnp.where(exists, logits, NEG)

    txt = (
        jax.jit(body)
        .lower(frontier, scores, meta, table)
        .compile()
        .as_text()
    )
    out = "/tmp/dummy_body_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print("wrote", out, len(txt), "bytes")


if __name__ == "__main__":
    main()
