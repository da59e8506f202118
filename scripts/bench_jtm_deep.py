"""Catalog-scale JTM tree learning: full level sweep at 1M items.

Exercises the two scaling fixes in train/jtm.py:
- batched (row, candidate, chain-level) scoring — one [rows, 2^gap] grouped
  forward per chain level (the reference fans out per-item thread tasks,
  TreeLearning.scala:152-174);
- the vectorized argmax assignment fast path (the per-node host scan was
  O(items x occupied-nodes) — hours at deep levels).

Usage: python scripts/bench_jtm_deep.py [--items 1000000] [--rows-per-item 2]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--rows-per-item", type=int, default=2)
    ap.add_argument("--seq-len", type=int, default=10)
    ap.add_argument("--embed", type=int, default=16)
    ap.add_argument("--gap", type=int, default=2)
    ap.add_argument("--score-batch", type=int, default=65536)
    args = ap.parse_args()

    import jax

    from dismember_tpu.index.arraytree import ArrayTree
    from dismember_tpu.index.tree_io import write_tree
    from dismember_tpu.models import din
    from dismember_tpu.train.jtm import TreeLearner

    n = args.items
    rng = np.random.default_rng(0)
    ids = np.arange(1, n + 1, dtype=np.int64)  # 0 is PADDING_ID
    leaf_level = int(np.ceil(np.log2(n)))
    codes = (1 << leaf_level) - 1 + rng.permutation(n)

    t0 = time.perf_counter()
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "tree.bin")
        write_tree(path, ids, codes)
        tree = ArrayTree.from_file(path)
    t_tree = time.perf_counter() - t0

    r = n * args.rows_per_item
    train_targets = np.repeat(ids, args.rows_per_item)
    train_seqs = rng.integers(1, n + 1, size=(r, args.seq_len)).astype(np.int64)

    key = jax.random.PRNGKey(0)
    num_index = (1 << (tree.max_level + 1)) - 1
    params = din.init_params(key, num_index, args.embed)

    t0 = time.perf_counter()
    learner = TreeLearner(
        tree=tree, params=params, forward=din.forward,
        train_seqs=train_seqs, train_targets=train_targets,
        gap=args.gap, score_batch_rows=args.score_batch,
    )
    t_setup = time.perf_counter() - t0

    t0 = time.perf_counter()
    proj = learner.optimize()
    t_opt = time.perf_counter() - t0

    tree_ids = np.asarray(tree.item_ids)
    codes_new = np.asarray([proj[int(i)] for i in tree_ids], dtype=np.int64)
    lo = (1 << tree.max_level) - 1
    assert len(proj) == n
    assert (codes_new >= lo).all() and (codes_new < 2 * lo + 1).all()
    assert len(np.unique(codes_new)) == n, "projection must be bijective"
    moved = float(np.mean(codes_new != np.asarray(tree.item_codes)))

    print(json.dumps({
        "items": n, "rows": r, "max_level": tree.max_level, "gap": args.gap,
        "tree_build_s": round(t_tree, 1), "setup_s": round(t_setup, 1),
        "tree_learning_s": round(t_opt, 1),
        "frac_items_moved": round(moved, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
