"""Bisect the deep-catalog beam loop: where do 5ms/level go?

Variants timed on the real chip at 1M items:
  - full beam loop (reference semantics)           [baseline]
  - single level_body jitted standalone            (per-level cost x16?)
  - beam loop with a dummy scorer (sum of embeds)  (loop skeleton + gather)
  - beam loop with NO meta gather (exists=always)  (isolate node_meta)
  - beam loop with scorer only, no top_k/select    (isolate selection)

Usage: python scripts/bench_beam_bisect.py [--items 1000000]
"""

import argparse
import functools
import json
import os
import sys
import tempfile
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
    return ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--embed", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dismember_tpu.index.arraytree import ArrayTree
    from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
    from dismember_tpu.models import din
    from dismember_tpu.retrieval import tree_beam
    from dismember_tpu.retrieval.tree_beam import make_beam_fn, onehot_select

    ids = np.arange(1, args.items + 1)
    sorted_ids, codes = category_sorted_codes(ids, ids % 97)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t.bin")
        write_tree(p, sorted_ids, codes)
        tree = ArrayTree.from_file(p)

    num_index = (1 << (tree.max_level + 1)) - 1
    params = din.init_params(jax.random.PRNGKey(0), num_index, args.embed)
    rng = np.random.default_rng(0)
    seq_codes = tree.ids_to_codes(
        rng.integers(1, args.items + 1, size=(args.batch, 10))
    )
    x = jnp.asarray(seq_codes)
    node_meta = jnp.asarray(tree.node_meta)
    b = args.batch
    beam, width = 20, 40
    n_levels = tree.max_level - 4

    # 1) full beam loop
    fn = make_beam_fn(din.forward, tree, beam=20,
                      precompute=din.precompute_seq, apply=din.apply_with_ctx)
    full_ms = timeit("full_beam_loop", fn, params, x)

    # 2) one level body standalone
    ctx = jax.jit(din.precompute_seq)(params, x)
    max_code = node_meta.shape[0] - 1

    @jax.jit
    def one_level(frontier, scores, meta, params, ctx):
        top_scores, top_idx = jax.lax.top_k(scores, beam)
        top_codes = onehot_select(frontier, top_idx)
        top_alive = top_scores > tree_beam._NEG_INF / 2
        children = jnp.stack(
            [2 * top_codes + 1, 2 * top_codes + 2], axis=-1
        ).reshape(b, width)
        child_alive = jnp.repeat(top_alive, 2, axis=1)
        m = meta[jnp.clip(children, 0, max_code)]
        exists = (m[..., 0] > 0) & child_alive
        logits = din.apply_with_ctx(params, jnp.where(exists, children, -1), ctx)
        return children, jnp.where(exists, logits, tree_beam._NEG_INF)

    frontier0 = jnp.asarray(
        rng.integers(2**10, 2**11, size=(b, width)), jnp.int32
    )
    scores0 = jnp.asarray(rng.normal(size=(b, width)), jnp.float32)
    lvl_ms = timeit("one_level_standalone", one_level,
                    frontier0, scores0, node_meta, params, ctx)
    print(json.dumps({"derived": "n_levels*standalone",
                      "ms": round(lvl_ms * n_levels, 2)}), flush=True)

    # 3) scan over the same body (is lax.scan the problem?)
    @jax.jit
    def scan_levels(frontier, scores, meta, params, ctx):
        def body(carry, _):
            f, s = carry
            return one_level.__wrapped__(f, s, meta, params, ctx), None
        (f, s), _ = jax.lax.scan(body, (frontier, scores), None,
                                 length=n_levels)
        return f, s

    timeit("scan_same_body", scan_levels, frontier0, scores0, node_meta,
           params, ctx)

    # 4) scan with dummy scorer (embedding-sum): loop skeleton + gathers
    table = params["embedding"]

    @jax.jit
    def scan_dummy(frontier, scores, meta, table):
        def body(carry, _):
            f, s = carry
            top_scores, top_idx = jax.lax.top_k(s, beam)
            top_codes = onehot_select(f, top_idx)
            children = jnp.stack(
                [2 * top_codes + 1, 2 * top_codes + 2], axis=-1
            ).reshape(b, width)
            m = meta[jnp.clip(children, 0, max_code)]
            exists = m[..., 0] > 0
            emb = table[jnp.clip(children, 0, max_code)]
            logits = emb.sum(-1)
            return (children, jnp.where(exists, logits,
                                        tree_beam._NEG_INF)), None
        (f, s), _ = jax.lax.scan(body, (frontier, scores), None,
                                 length=n_levels)
        return f, s

    timeit("scan_dummy_scorer", scan_dummy, frontier0, scores0, node_meta,
           table)


if __name__ == "__main__":
    main()
