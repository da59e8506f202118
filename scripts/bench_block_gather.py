"""Descendant-block gather beam loop: lax.gather slice_sizes=(2^d, C).

Children of heap code c are rows 2c+1..2c+2; depth-d descendants are the
contiguous range [c*2^d + 2^d - 1, ...+2^d).  One DMA per (query, beam slot)
per d levels.  Measures d=1 (exact reference semantics) and d=2,3 (wider
exploration) with evolving indices and a dummy scorer.
"""

import functools
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
    c = e + 1  # emb + exists
    key = jax.random.PRNGKey(0)
    aug = jax.random.normal(key, (n_codes, c), jnp.float32)
    rng = np.random.default_rng(0)
    frontier0 = jnp.asarray(rng.integers(2**4, 2**5, size=(b, beam)), jnp.int32)
    scores0 = jnp.asarray(rng.normal(size=(b, beam)), jnp.float32)
    NEG = jnp.float32(-3.4e38)

    def make_scan(d, table, n_steps):
        blk = 1 << d
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(2, 3),
            collapsed_slice_dims=(),
            start_index_map=(0, 1),
        )

        @jax.jit
        def run(frontier, scores):
            def step(carry, _):
                f, s = carry  # [B, beam] codes (-1 dead), scores
                start = f * blk + (blk - 1)  # [B, beam]
                start = jnp.where(f < 0, n_codes + 1, start)
                idx = jnp.stack(
                    [start, jnp.zeros_like(start)], axis=-1
                )  # [B,beam,2]
                rows = jax.lax.gather(
                    table, idx, dnums, (blk, c),
                    mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
                    fill_value=0.0,
                )  # [B, beam, blk, C]
                emb = rows[..., :e]
                exists = rows[..., e] > 0
                logits = emb.sum(-1)  # dummy scorer [B, beam, blk]
                cand = (f[..., None] * blk + (blk - 1)
                        + jnp.arange(blk, dtype=jnp.int32))
                cand = cand.reshape(b, beam * blk)
                cand_s = jnp.where(
                    exists.reshape(b, beam * blk),
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

        return run

    # 16 levels: d=1 -> 16 steps, d=2 -> 8 steps, d=3 -> 6 steps (18 lv)
    for d, steps in [(1, 16), (2, 8), (3, 6)]:
        fn = make_scan(d, aug, steps)
        timeit(f"blockgather_d{d}_{steps}steps_f32", fn, frontier0, scores0)

    aug16 = aug.astype(jnp.bfloat16)
    for d, steps in [(1, 16), (2, 8), (3, 6)]:
        fn = make_scan(d, aug16, steps)
        timeit(f"blockgather_d{d}_{steps}steps_bf16", fn, frontier0, scores0)


if __name__ == "__main__":
    main()
