"""Quality A/B: lazy row-sparse Adam vs dense Adam on the bundled data.

The sparse path (train/sparse_adam.py) is exact for touched rows but skips
the dense step's momentum-only updates of untouched rows; this run checks
the end-metric effect on movielens (expected: within the ±0.003 recall seed
band recorded in BASELINE.md).

Usage: python scripts/sparse_quality_check.py [--iters 2000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dismember_tpu.data.ingest import (
    read_csv,
    unique_items_with_category,
    user_interactions,
)
from dismember_tpu.data.tdm_dataset import generate_split_samples
from dismember_tpu.index.arraytree import ArrayTree
from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
from dismember_tpu.train.tdm import TDMTrainer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NEG = "0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,17,19,22,25,30,76,200"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    import tempfile

    raw = read_csv(os.path.join(ROOT, "data", "example_data.csv"))
    inter = user_interactions(raw)
    s = generate_split_samples(inter, 10, 2, 0.8)
    ids, cats = unique_items_with_category(raw)
    sid, codes = category_sorted_codes(ids, cats)
    with tempfile.TemporaryDirectory() as td:
        tree_path = os.path.join(td, "tree.bin")
        write_tree(tree_path, sid, codes, stat=s.stat)
        tree = ArrayTree.from_file(tree_path)

    for mode in (False, True):
        t0 = time.perf_counter()
        trainer = TDMTrainer(
            tree=tree, model_type="din", embed_size=16, learning_rate=1e-4,
            total_batch_size=8192, total_eval_batch_size=8192,
            layer_neg_counts=NEG, topk=10, beam_size=20, seed=args.seed,
            sparse_embed_update=mode,
        )
        trainer.train(
            s.train_seqs, s.train_targets, iterations=args.iters,
            progress_interval=1000,
        )
        ev = trainer.evaluate(
            (s.eval_seqs, s.eval_labels, s.eval_users), s.user_consumed
        )
        c = max(ev.count, 1)
        print(json.dumps({
            "mode": "sparse" if mode else "dense",
            "iters": args.iters,
            "recall": round(ev.recall / c, 6),
            "precision": round(ev.precision / c, 6),
            "ndcg": round(ev.ndcg / c, 6),
            "loss": round(ev.loss / c, 4),
            "seconds": round(time.perf_counter() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
