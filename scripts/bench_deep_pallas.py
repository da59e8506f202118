"""Deep-catalog serving shootout: XLA scorer vs Pallas DIN kernel vs variants.

VERDICT r1 #3: make the Pallas path win at depth (1M+ items, 20 levels,
24 sequential level dispatches) or retire it with profile evidence.  This
script measures the full beam-search loop per configuration on the real
chip and prints one JSON line per variant.

Usage: python scripts/bench_deep_pallas.py [--items 1000000] [--batch 4096]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_beam(name, forward, tree, params, seq_codes, beam=20, iters=10,
               precompute=None, apply=None):
    import jax.numpy as jnp

    from dismember_tpu.retrieval.tree_beam import make_beam_fn

    fn = make_beam_fn(forward, tree, beam=beam, precompute=precompute, apply=apply)
    x = jnp.asarray(seq_codes)
    out, _ = fn(params, x)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out, _ = fn(params, x)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    qps = iters * len(seq_codes) / dt
    print(json.dumps({"variant": name, "qps": round(qps, 1),
                      "ms_per_batch": round(1e3 * dt / iters, 2)}), flush=True)
    return qps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--embed", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tile-b", type=int, default=128)
    ap.add_argument("--profile", default="", help="trace dir for jax.profiler")
    args = ap.parse_args()

    import tempfile

    import jax
    import jax.numpy as jnp

    from dismember_tpu.index.arraytree import ArrayTree
    from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
    from dismember_tpu.models import din
    from dismember_tpu.ops.din_kernel import make_din_pallas_forward

    ids = np.arange(1, args.items + 1)
    sorted_ids, codes = category_sorted_codes(ids, ids % 97)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t.bin")
        write_tree(p, sorted_ids, codes)
        tree = ArrayTree.from_file(p)
    print(json.dumps({"items": args.items, "levels": tree.max_level}), flush=True)

    num_index = (1 << (tree.max_level + 1)) - 1
    params = din.init_params(jax.random.PRNGKey(0), num_index, args.embed)
    rng = np.random.default_rng(0)
    seq_codes = tree.ids_to_codes(
        rng.integers(1, args.items + 1, size=(args.batch, 10))
    )

    # 1) XLA grouped forward with hoisted sequence side (current default)
    q_xla = bench_beam(
        "xla_hoisted", din.forward, tree, params, seq_codes, iters=args.iters,
        precompute=din.precompute_seq, apply=din.apply_with_ctx,
    )
    # 2) XLA grouped forward, no hoisting
    bench_beam("xla_plain", din.forward, tree, params, seq_codes, iters=args.iters)
    # 3) Pallas fused scorer (no hoisting; kernel refuses ctx shape)
    pallas_fwd = make_din_pallas_forward(tile_b=args.tile_b)
    q_pallas = bench_beam(
        "pallas_fused", pallas_fwd, tree, params, seq_codes, iters=args.iters
    )
    # 4) bf16 embedding table (half the random-gather bytes), XLA hoisted
    params_bf16 = dict(params)
    params_bf16["embedding"] = params["embedding"].astype(jnp.bfloat16)
    bench_beam(
        "xla_hoisted_bf16_table", din.forward, tree, params_bf16, seq_codes,
        iters=args.iters, precompute=din.precompute_seq, apply=din.apply_with_ctx,
    )

    if args.profile:
        from dismember_tpu.retrieval.tree_beam import make_beam_fn

        fn = make_beam_fn(
            din.forward, tree, beam=20,
            precompute=din.precompute_seq, apply=din.apply_with_ctx,
        )
        x = jnp.asarray(seq_codes)
        fn(params, x)[0].block_until_ready()
        with jax.profiler.trace(args.profile):
            for _ in range(3):
                out, _ = fn(params, x)
            out.block_until_ready()
        print(json.dumps({"trace": args.profile}), flush=True)

    print(json.dumps({"pallas_vs_xla": round(q_pallas / q_xla, 3)}), flush=True)


if __name__ == "__main__":
    main()
