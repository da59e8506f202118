"""Second round: isolate bool-mask vs reduce triggers in the level body."""

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

    def chain(frontier, scores):
        top_scores, top_idx = jax.lax.top_k(scores, beam)
        top_codes = onehot_select(frontier, top_idx)
        top_alive = top_scores > NEG / 2
        ch = jnp.stack([2 * top_codes + 1, 2 * top_codes + 2], axis=-1)
        ch = ch.reshape(b, width)
        cc = jnp.clip(ch, 0, max_code)
        return ch, cc, top_alive

    @jax.jit
    def p_sum(frontier, scores, meta, table):
        ch, cc, _ = chain(frontier, scores)
        return ch, meta[cc], table[cc].sum(-1)

    @jax.jit
    def p_exists_bool(frontier, scores, meta, table):
        ch, cc, _ = chain(frontier, scores)
        return ch, table[cc], meta[cc][..., 0] > 0

    @jax.jit
    def p_exists_f32(frontier, scores, meta, table):
        ch, cc, _ = chain(frontier, scores)
        return ch, table[cc], meta[cc][..., 0]

    @jax.jit
    def p_where_f32mask(frontier, scores, meta, table):
        ch, cc, top_alive = chain(frontier, scores)
        alive_f = jnp.repeat(top_alive.astype(jnp.float32), 2, axis=1)
        exists_f = (meta[cc][..., 0] > 0).astype(jnp.f32 if hasattr(jnp, "f32") else jnp.float32) * alive_f
        logits = table[cc].sum(-1)
        out = logits * exists_f + NEG * (1.0 - exists_f)
        return ch, out

    @jax.jit
    def p_alive_f32(frontier, scores, meta, table):
        ch, cc, top_alive = chain(frontier, scores)
        alive_f = jnp.repeat(top_alive.astype(jnp.float32), 2, axis=1)
        return ch, meta[cc], table[cc], alive_f

    @jax.jit
    def p_alive_bcast(frontier, scores, meta, table):
        ch, cc, top_alive = chain(frontier, scores)
        alive2 = jnp.broadcast_to(top_alive[:, :, None], (b, beam, 2))
        alive_w = alive2.reshape(b, width)
        return ch, meta[cc], table[cc], alive_w

    @jax.jit
    def p_full_f32(frontier, scores, meta, table):
        # full body, no bool intermediates or outputs at all
        ch, cc, top_alive = chain(frontier, scores)
        alive_f = jnp.repeat(top_alive.astype(jnp.float32), 2, axis=1)
        exists_f = jnp.sign(meta[cc][..., 0]) * alive_f
        logits = table[cc].sum(-1)
        return ch, jnp.where(exists_f > 0, logits, NEG)

    for name, fn in [
        ("p_sum", p_sum),
        ("p_exists_bool", p_exists_bool),
        ("p_exists_f32", p_exists_f32),
        ("p_where_f32mask", p_where_f32mask),
        ("p_alive_f32", p_alive_f32),
        ("p_alive_bcast", p_alive_bcast),
        ("p_full_f32", p_full_f32),
    ]:
        timeit(name, fn, frontier, scores, meta, table)


if __name__ == "__main__":
    main()
