"""Best-combo quality push: deep TDM -> re-cluster -> retrain -> JTM -> retrain.

Reproduces and extends the round-2 best combo (BASELINE.md: E=64, 6000
iters/round -> recall@10 0.0245).  Variants sweep embed size / iterations;
each stage trains a fresh scorer on the current tree (the reference's
alternation protocol, doc/TDM.md + doc/JTM.md).

Usage: python scripts/quality_push.py [variant ...]   (default: e64x8k e96x6k)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from dismember_tpu.data.ingest import (
    read_csv,
    unique_items_with_category,
    user_interactions,
)
from dismember_tpu.data.tdm_dataset import generate_split_samples
from dismember_tpu.index.arraytree import ArrayTree
from dismember_tpu.index.cluster import cluster_tree_from_embeddings
from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
from dismember_tpu.train.jtm import TreeLearner, write_projection_tree
from dismember_tpu.train.tdm import TDMTrainer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CSV = os.path.join(ROOT, "data", "example_data.csv")
OUT = os.path.join(ROOT, "data", "push")
os.makedirs(OUT, exist_ok=True)
NEG = "0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,17,19,22,25,30,76,200"

VARIANTS = {
    "e64x6k": dict(embed=64, iters=6000, lr=3e-3),  # the 0.0245 recipe
    "e64x8k": dict(embed=64, iters=8000, lr=3e-3),
    "e96x6k": dict(embed=96, iters=6000, lr=3e-3),
    "e64x6k-lr2": dict(embed=64, iters=6000, lr=2e-3),
    "e128x6k": dict(embed=128, iters=6000, lr=3e-3),
}

raw = read_csv(CSV)
inter = user_interactions(raw)
s = generate_split_samples(inter, 10, 2, 0.8)
ids, cats = unique_items_with_category(raw)
sid, codes = category_sorted_codes(ids, cats)
ev = (s.eval_seqs, s.eval_labels, s.eval_users)


def train_eval(tree_path, cfg, seed):
    tree = ArrayTree.from_file(tree_path)
    tr = TDMTrainer(
        tree=tree, model_type="din", embed_size=cfg["embed"],
        learning_rate=cfg["lr"], total_batch_size=8192,
        layer_neg_counts=NEG, topk=10, beam_size=20, seed=seed,
    )
    tr.train(s.train_seqs, s.train_targets, iterations=cfg["iters"],
             progress_interval=cfg["iters"])
    e = tr.evaluate(ev, s.user_consumed)
    c = max(e.count, 1)
    return tr, dict(recall=round(e.recall / c, 6),
                    precision=round(e.precision / c, 6),
                    ndcg=round(e.ndcg / c, 6))


def run_variant(name, cfg, seed=1):
    t0 = time.perf_counter()
    tp = os.path.join(OUT, f"{name}_t1.bin")
    write_tree(tp, sid, codes, stat=s.stat)

    tr, m = train_eval(tp, cfg, seed)
    print(json.dumps({"run": f"{name}-stage1-category", **m}), flush=True)

    # stage 2: re-cluster from learned embeddings
    emb_csv = os.path.join(OUT, f"{name}_emb1.csv")
    tr.export_embeddings(emb_csv)
    tp2 = os.path.join(OUT, f"{name}_t2.bin")
    cluster_tree_from_embeddings(emb_csv, tp2, cluster_iter=10)
    tr, m = train_eval(tp2, cfg, seed)
    print(json.dumps({"run": f"{name}-stage2-cluster", **m}), flush=True)

    # stage 3: JTM tree learning on the clustered tree's scorer
    learner = TreeLearner(
        tree=tr.tree, params=tr.params, forward=tr.forward,
        train_seqs=s.train_seqs, train_targets=s.train_targets, gap=2,
    )
    proj = learner.optimize()
    tp3 = os.path.join(OUT, f"{name}_t3.bin")
    write_projection_tree(tr.tree, proj, tp3)
    tr, m = train_eval(tp3, cfg, seed)
    print(json.dumps({"run": f"{name}-stage3-jtm", "seconds":
                      round(time.perf_counter() - t0, 1), **m}), flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["e64x8k", "e96x6k"]
    for n in names:
        base, _, seed = n.partition(":")
        run_variant(n.replace(":", "-s"), VARIANTS[base], seed=int(seed or 1))
