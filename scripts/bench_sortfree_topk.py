"""Sort-free top-k for the beam level body: rank-mask + one-hot compaction.

lax.top_k lowers to a sort whose transposed layout propagates into the level
body's table gathers (3.5ms for a 10MB gather + a transposing whole-table
VMEM prefetch).  This prototype replaces it with O(W^2) rank comparison and
cumsum compaction — row-major friendly ops only — and checks both speed of
the full dummy body and set-equality with lax.top_k.
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

    def topk_compact(scores, codes, k):
        """Return (top_codes [B,k] int32, top_alive [B,k] bool): the set of
        codes holding the k largest scores per row (ties -> lower index),
        compacted in index order.  No sort anywhere."""
        w = scores.shape[-1]
        s_i = scores[..., :, None]  # [B,W,1] rank target
        s_j = scores[..., None, :]  # [B,1,W]
        jj = jnp.arange(w, dtype=jnp.int32)
        beats = (s_j > s_i) | ((s_j == s_i) & (jj[None, None, :] < jj[None, :, None]))
        rank = beats.astype(jnp.float32).sum(-1)  # [B,W]
        mask = rank < k
        pos = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1  # slot per kept
        slot = jnp.arange(k, dtype=jnp.int32)
        onehot = (mask[..., :, None] & (pos[..., :, None] == slot)).astype(
            jnp.int32
        )  # [B,W,k]
        top_codes = jnp.einsum("bwk,bw->bk", onehot, codes)
        alive = mask & (scores > NEG / 2)
        top_alive = jnp.einsum("bwk,bw->bk", onehot, alive.astype(jnp.int32)) > 0
        return top_codes, top_alive

    @jax.jit
    def body_sortfree(frontier, scores, meta, table):
        top_codes, top_alive = topk_compact(scores, frontier, beam)
        ch = jnp.stack([2 * top_codes + 1, 2 * top_codes + 2], axis=-1)
        ch = ch.reshape(b, width)
        child_alive = jnp.repeat(top_alive, 2, axis=1)
        cc = jnp.clip(ch, 0, max_code)
        exists = (meta[cc][..., 0] > 0) & child_alive
        return ch, jnp.where(exists, table[cc].sum(-1), NEG)

    timeit("body_sortfree", body_sortfree, frontier, scores, meta, table)

    # correctness: same SET as lax.top_k per row
    tc, ta = jax.jit(lambda s, f: topk_compact(s, f, beam))(scores, frontier)
    _, ti = jax.lax.top_k(scores, beam)
    ref = np.take_along_axis(np.asarray(frontier), np.asarray(ti), axis=1)
    got = np.asarray(tc)
    same = all(
        set(ref[i].tolist()) == set(got[i].tolist()) for i in range(b)
    )
    print(json.dumps({"set_equal_to_lax_topk": bool(same),
                      "alive_all": bool(np.asarray(ta).all())}), flush=True)


if __name__ == "__main__":
    main()
