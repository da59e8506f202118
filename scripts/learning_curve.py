"""Learning-curve / saturation study on the movielens sample (VERDICT r2 #10).

Question: is the ~0.027 recall@10 plateau data-bound, capacity-bound, or
schedule-bound?  Protocol: train TDM DIN at E in {64, 96} with periodic
checkpoints of train loss, TRAIN-subset recall (memorization capacity) and
eval recall (generalization), far past the 2k-8k iterations the quality
sweeps used.  Eval protocol matches the reference
(tdm/.../evaluation/Evaluator.scala:12-75): beam=20, topk=10, consumed
filtering.

Readout rules:
- eval recall still rising at the end  -> schedule-bound (train longer);
- train recall high & flat, eval flat  -> data-bound (90k rows saturated);
- train recall low & flat at both E    -> capacity/optimization-bound.

Usage: python scripts/learning_curve.py [--embeds 64,96] [--iters 24000]
       [--every 2000] [--seed 3]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from dismember_tpu.core.metrics import compute_metrics_batch
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


def _recall(trainer, seqs, labels, consumed_lists, topk=10):
    recs = trainer.recommend_batch(seqs, consumed=consumed_lists)
    rec_padded = np.full((len(recs), topk), -1, dtype=np.int64)
    for i, r in enumerate(recs):
        rec_padded[i, :len(r)] = r
    _, r, nd = compute_metrics_batch(rec_padded, labels)
    return float(r.mean()), float(nd.mean())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--embeds", default="64,96")
    ap.add_argument("--iters", type=int, default=24_000)
    ap.add_argument("--every", type=int, default=2_000)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--lr", type=float, default=3e-3)
    args = ap.parse_args()

    raw = read_csv(os.path.join(ROOT, "data", "example_data.csv"))
    s = generate_split_samples(user_interactions(raw), 10, 2, 0.8)
    ids, cats = unique_items_with_category(raw)
    sid, codes = category_sorted_codes(ids, cats)
    tree_path = "/tmp/lc_tree.bin"
    write_tree(tree_path, sid, codes, stat=s.stat)
    tree = ArrayTree.from_file(tree_path)

    # train-subset probe: can the model at least memorize its own data?
    # next-item "labels" are the training targets themselves.
    n_probe = 2048
    tr_seqs = s.train_seqs[:n_probe]
    tr_labels = s.train_targets[:n_probe, None]

    ev_seqs, ev_labels = s.eval_seqs, s.eval_labels
    ev_consumed = [
        s.user_consumed.get(int(u), np.empty(0, np.int64))
        for u in s.eval_users
    ]

    for e in [int(x) for x in args.embeds.split(",")]:
        trainer = TDMTrainer(
            tree=tree, model_type="din", embed_size=e, learning_rate=args.lr,
            total_batch_size=8192, layer_neg_counts=NEG, topk=10,
            beam_size=20, seed=args.seed,
        )
        done = 0
        while done < args.iters:
            step = min(args.every, args.iters - done)
            logs = trainer.train(
                s.train_seqs, s.train_targets, iterations=step,
                progress_interval=step,
            )
            done += step
            tr_rec, _ = _recall(trainer, tr_seqs, tr_labels, None)
            ev_rec, ev_nd = _recall(trainer, ev_seqs, ev_labels, ev_consumed)
            print(json.dumps({
                "embed": e, "iters": done,
                "train_loss": round(logs[-1]["train_loss"], 4),
                "train_recall@10": round(tr_rec, 5),
                "eval_recall@10": round(ev_rec, 5),
                "eval_ndcg@10": round(ev_nd, 5),
            }), flush=True)


if __name__ == "__main__":
    main()
