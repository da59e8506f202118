"""Split-carry beam body: combine gather-derived masks only across scan
iterations (on loop-carried, materialized values)."""

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
    S = n_codes  # sentinel row index
    b, beam, width = 4096, 20, 40
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (n_codes, 16), jnp.float32)
    meta = jax.random.normal(key, (n_codes, 2), jnp.float32)
    meta_ext = jnp.concatenate([meta, jnp.zeros((1, 2), jnp.float32)], axis=0)
    rng = np.random.default_rng(0)
    frontier = jnp.asarray(rng.integers(2**10, 2**11, size=(b, width)), jnp.int32)
    logits0 = jnp.asarray(rng.normal(size=(b, width)), jnp.float32)
    e0 = jnp.ones((b, width), bool)
    NEG = jnp.float32(-3.4e38)

    @jax.jit
    def scan_r2(frontier, logits, e, meta_ext, table):
        def step(carry, _):
            cs_prev, e_prev, l_prev = carry
            ei = e_prev.astype(jnp.int32)
            f = ei * cs_prev + (1 - ei) * S       # carried combine
            scores = jnp.where(e_prev, l_prev, NEG)  # carried combine
            _, idx = jax.lax.top_k(scores, beam)
            tc = onehot_select(f, idx)
            ch = jnp.stack([2 * tc + 1, 2 * tc + 2], axis=-1).reshape(b, width)
            cs = jnp.minimum(ch, S)
            m = meta_ext[cs]
            e2 = m[..., 0] > 0
            l2 = table[jnp.minimum(cs, n_codes - 1)].sum(-1)
            return (cs, e2, l2), None
        (cs, e2, l2), _ = jax.lax.scan(
            step, (frontier, e, logits), None, length=16
        )
        return jnp.where(e2, l2, NEG), cs

    timeit("scan16_split_carry", scan_r2, frontier, logits0, e0, meta_ext,
           table)

    @jax.jit
    def scan_r1(frontier, logits, e, meta_ext, table):
        # in-iteration int combine for the carry codes, rest split
        def step(carry, _):
            f_prev, e_prev, l_prev = carry
            scores = jnp.where(e_prev, l_prev, NEG)
            _, idx = jax.lax.top_k(scores, beam)
            tc = onehot_select(f_prev, idx)
            ch = jnp.stack([2 * tc + 1, 2 * tc + 2], axis=-1).reshape(b, width)
            cs = jnp.minimum(ch, S)
            m = meta_ext[cs]
            e2 = m[..., 0] > 0
            ei = e2.astype(jnp.int32)
            f2 = ei * cs + (1 - ei) * S           # in-iteration combine
            l2 = table[jnp.minimum(cs, n_codes - 1)].sum(-1)
            return (f2, e2, l2), None
        (f, e2, l2), _ = jax.lax.scan(
            step, (frontier, e, logits), None, length=16
        )
        return jnp.where(e2, l2, NEG), f

    timeit("scan16_incode_combine", scan_r1, frontier, logits0, e0, meta_ext,
           table)


if __name__ == "__main__":
    main()


def layout_pin_variant() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout, with_layout_constraint

    from dismember_tpu.retrieval.tree_beam import onehot_select

    n_codes = 2_000_001
    S = n_codes
    b, beam, width = 4096, 20, 40
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (n_codes, 16), jnp.float32)
    meta = jax.random.normal(key, (n_codes, 2), jnp.float32)
    meta_ext = jnp.concatenate([meta, jnp.zeros((1, 2), jnp.float32)], axis=0)
    rng = np.random.default_rng(0)
    frontier = jnp.asarray(rng.integers(2**10, 2**11, size=(b, width)), jnp.int32)
    scores0 = jnp.asarray(rng.normal(size=(b, width)), jnp.float32)
    NEG = jnp.float32(-3.4e38)
    rm2 = Format(layout=Layout((0, 1)))  # row-major [N, k]: major_to_minor
    rm3 = Format(layout=Layout((0, 1, 2)))

    @jax.jit
    def scan_pin(frontier, scores, meta_ext, table):
        meta_ext = with_layout_constraint(meta_ext, rm2)
        table = with_layout_constraint(table, rm2)

        def step(carry, _):
            f, s = carry
            _, idx = jax.lax.top_k(s, beam)
            tc = onehot_select(f, idx)
            ch = jnp.stack([2 * tc + 1, 2 * tc + 2], axis=-1).reshape(b, width)
            cs = jnp.minimum(ch, S)
            m = with_layout_constraint(meta_ext[cs], rm3)
            emb = with_layout_constraint(
                table[jnp.minimum(cs, n_codes - 1)], rm3
            )
            e2 = m[..., 0] > 0
            ei = e2.astype(jnp.int32)
            f2 = ei * cs + (1 - ei) * S
            l2 = emb.sum(-1)
            return (f2, jnp.where(e2, l2, NEG)), None

        (f, s), _ = jax.lax.scan(step, (frontier, scores), None, length=16)
        return f, s

    timeit("scan16_layout_pinned", scan_pin, frontier, scores0, meta_ext, table)


layout_pin_variant()
