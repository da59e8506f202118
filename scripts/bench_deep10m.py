"""10M-item deep-catalog measurement: hybrid bf16 pair-table serving + train.

The deepest regime in BASELINE.md (24 levels).  The f32 pair table would be
8.6GB; the bf16 table (exact base-256 id digit lanes) is 4.3GB and gathers at
the same ns/row (scripts/bench_gather_width.py), so this is the serving
configuration `TDMServing` auto-selects at this scale.

Round-1 reference numbers to beat: ~30k QPS (classic loop), 108k expanded
train rows/s.

Usage: python scripts/bench_deep10m.py [--items 10000000] [--batch 4096]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from devtime import device_time_ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=10_000_000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--embed", type=int, default=16)
    ap.add_argument("--beam", type=int, default=20)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dismember_tpu.index.arraytree import ArrayTree
    from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
    from dismember_tpu.models import din
    from dismember_tpu.retrieval.packed_beam import (
        make_hybrid_beam_fn,
        make_packed_tree,
    )
    from dismember_tpu.train.tdm import TDMTrainer

    t0 = time.perf_counter()
    ids = np.arange(1, args.items + 1)
    sorted_ids, codes = category_sorted_codes(ids, ids % 97)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t.bin")
        write_tree(p, sorted_ids, codes)
        tree = ArrayTree.from_file(p)
    print(json.dumps({"items": args.items, "levels": tree.max_level,
                      "build_s": round(time.perf_counter() - t0, 1)}),
          flush=True)

    rng = np.random.default_rng(0)

    if not args.skip_train:
        # train and serving measured in separate sections; the trainer's Adam
        # moments (2 x 2.1GB at 10M) + the 4.3GB pair table don't co-reside
        neg_counts = ",".join(
            str(min(i, 2**i - 1)) for i in range(tree.max_level + 1)
        )
        trainer = TDMTrainer(
            tree=tree, model_type="din", embed_size=args.embed,
            layer_neg_counts=neg_counts, topk=10, beam_size=args.beam, seed=0,
        )
        b = trainer.num_targets_per_batch
        seqs = rng.integers(1, args.items + 1, size=(b, 10))
        targets = rng.integers(1, args.items + 1, size=b)
        trainer.train(seqs, targets, iterations=3, progress_interval=100)
        n_steps = 20
        t0 = time.perf_counter()
        # dependent chain: each step reads the previous step's params
        trainer.train(seqs, targets, iterations=n_steps, progress_interval=100)
        dt = time.perf_counter() - t0
        rows_per_s = n_steps * b * trainer.sampler.unit / dt
        print(json.dumps({"train_rows_per_s": round(rows_per_s),
                          "ms_per_step": round(dt / n_steps * 1e3, 2)}),
              flush=True)
        return

    import gc

    params = din.init_params(
        jax.random.PRNGKey(0), (1 << (tree.max_level + 1)) - 1, args.embed
    )
    packed = make_packed_tree(
        tree, params["embedding"], beam=args.beam, dtype=jnp.bfloat16
    )
    gc.collect()
    gb = packed.pair_table.nbytes / (1 << 30)
    beam_fn = make_hybrid_beam_fn(packed, din.precompute_seq, din.apply_from_emb)
    seq_codes = jnp.asarray(tree.ids_to_codes(
        rng.integers(1, args.items + 1, size=(args.batch, 10))
    ))
    out, _ = beam_fn(params, seq_codes)
    out.block_until_ready()
    ms = device_time_ms(lambda: beam_fn(params, seq_codes),
                        iters=args.iters)
    qps = args.batch / (ms / 1e3) if ms > 0 else 0.0
    print(json.dumps({"variant": "hybrid_bf16", "table_gb": round(gb, 2),
                      "device_ms_per_batch": round(ms, 2),
                      "qps": round(qps)}), flush=True)


if __name__ == "__main__":
    main()
