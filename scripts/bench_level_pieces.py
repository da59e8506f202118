"""Microbench the deep-catalog beam level body piece by piece.

Times, on the real chip: the random row gather from the node table, the
DIN apply_with_ctx scorer, top_k + one-hot selection, and the full level
body — to locate where the ~5ms/level at 1M items goes.

Usage: python scripts/bench_level_pieces.py [--items 1000000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(name, fn, *args, iters=50):
    out = fn(*args)
    import jax

    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = 1e3 * (time.perf_counter() - t0) / iters
    print(json.dumps({"piece": name, "ms": round(ms, 3)}), flush=True)
    return ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--embed", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dismember_tpu.models import din
    from dismember_tpu.retrieval.tree_beam import onehot_select

    n_codes = 2 * args.items + 1
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (n_codes, args.embed), jnp.float32)
    b, w, l = args.batch, 40, 10
    rng = np.random.default_rng(0)
    items = jnp.asarray(rng.integers(0, n_codes, size=(b, w)), jnp.int32)
    seqs = jnp.asarray(rng.integers(0, n_codes, size=(b, l)), jnp.int32)
    scores = jax.random.normal(key, (b, w), jnp.float32)
    meta = jax.random.normal(key, (n_codes, 2), jnp.float32)

    params = din.init_params(jax.random.PRNGKey(0), n_codes, args.embed)
    params = dict(params, embedding=table)

    gather = jax.jit(lambda t, i: t[i])
    timeit("row_gather_f32_[B,W]", gather, table, items)
    table_bf16 = table.astype(jnp.bfloat16)
    timeit("row_gather_bf16_[B,W]", gather, table_bf16, items)
    timeit("meta_gather_[B,W,2]", gather, meta, items)

    topk = jax.jit(lambda s: jax.lax.top_k(s, 20))
    timeit("top_k_20", topk, scores)
    ohs = jax.jit(lambda f, i: onehot_select(f, i))
    timeit("onehot_select", ohs, items, topk(scores)[1])

    ctx = jax.jit(din.precompute_seq)(params, seqs)
    apply_fn = jax.jit(din.apply_with_ctx)
    timeit("din_apply_with_ctx", apply_fn, params, items, ctx)
    fwd = jax.jit(din.forward)
    timeit("din_forward_full", fwd, params, items, seqs)


if __name__ == "__main__":
    main()
