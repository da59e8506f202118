"""Stride-d beam steps via explicit block tables gathered as wide rows.

block_table_d[c] = concat of the 2^d depth-d descendant rows of c (each
E+1 floats: emb + exists).  Row gathers stay on XLA's fast kCustom path;
descriptor count per level drops by 2^d/2 vs the pair baseline.
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

    n_codes = 2_000_001
    b, beam = 4096, 20
    e = 16
    c1 = e + 1
    NEG = jnp.float32(-3.4e38)
    rng = np.random.default_rng(0)
    frontier0 = jnp.asarray(rng.integers(2**4, 2**5, size=(b, beam)), jnp.int32)
    scores0 = jnp.asarray(rng.normal(size=(b, beam)), jnp.float32)

    def make_run(d, n_steps, dtype):
        import jax.numpy as jnp

        blk = 1 << d
        key = jax.random.PRNGKey(0)
        table = jax.random.normal(key, (n_codes, blk * c1), dtype)

        @jax.jit
        def run(frontier, scores, table):
            def step(carry, _):
                f, s = carry
                rows = table[jnp.clip(f, 0, n_codes - 1)]  # [B,beam,blk*C]
                rows = rows.reshape(b, beam, blk, c1).astype(jnp.float32)
                emb = rows[..., :e]
                exists = (rows[..., e] > 0) & (f >= 0)[..., None]
                logits = emb.sum(-1)
                cand = (f[..., None] * blk + (blk - 1)
                        + jnp.arange(blk, dtype=jnp.int32))
                cand = cand.reshape(b, beam * blk)
                cand_s = jnp.where(exists.reshape(b, beam * blk),
                                   logits.reshape(b, beam * blk), NEG)
                top_s, top_i = jax.lax.top_k(cand_s, beam)
                iota = jnp.arange(beam * blk, dtype=jnp.int32)
                onehot = (top_i[..., :, None] == iota).astype(jnp.int32)
                top_c = jnp.einsum("bkw,bw->bk", onehot, cand)
                top_c = jnp.where(top_s > NEG / 2, top_c, -1)
                return (top_c, top_s), None

            (f, s), _ = jax.lax.scan(step, (frontier, scores), None,
                                     length=n_steps)
            return f, s

        return lambda f0, s0: run(f0, s0, table)

    for dtype, tag in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        for d, steps in [(2, 8), (3, 6)]:
            fn = make_run(d, steps, dtype)
            timeit(f"blocktable_d{d}_{steps}steps_{tag}", fn, frontier0,
                   scores0)


if __name__ == "__main__":
    main()
