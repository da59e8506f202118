"""Does a co-occurrence-clustered tree beat the random tree on RECALL?

The decisive pre-1M experiment for the re-clustering fix (VERDICT r3 #2):
the 200k-item diagnose protocol (scripts/diagnose_alternation.py) showed
ground-truth structure helps (+40%) while structured-but-wrong trees built
from 2-epoch leaf embeddings hurt (-35%, purity 0.028).  Co-occurrence
features (index/cluster.cooccurrence_embeddings) reach purity ~0.19 — this
script trains the same TDM config on (a) a random tree and (b) the
cooc-clustered tree and compares held-out recall.

Usage: python scripts/cooc_recall_200k.py [--items 200000] [--iters 3000]
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

from quality_1m import _popularity_recall, _recall_tdm, gen_catalog


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=200_000)
    ap.add_argument("--users", type=int, default=30_000)
    ap.add_argument("--genres", type=int, default=400)
    ap.add_argument("--embed", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--batch", type=int, default=65_536)
    ap.add_argument("--iters", type=int, default=3_000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--cooc-iters", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from dismember_tpu.index.arraytree import ArrayTree
    from dismember_tpu.index.cluster import (
        cooccurrence_embeddings,
        tree_cluster,
    )
    from dismember_tpu.index.tree_io import write_tree
    from dismember_tpu.train.tdm import TDMTrainer

    n = args.items
    (train_seqs, train_targets, eval_seqs, eval_labels, eval_users,
     consumed) = gen_catalog(n, args.users, args.genres, args.seed)
    ids = np.arange(1, n + 1, dtype=np.int64)
    leaf_level = int(np.ceil(np.log2(n)))
    rng = np.random.default_rng(args.seed)
    per_genre = n // args.genres
    anc_level = int(np.ceil(np.log2(args.genres)))

    pop_rec, _ = _popularity_recall(
        train_targets, eval_labels, consumed, eval_users
    )
    print(json.dumps({"stage": "popularity_baseline",
                      "recall@10": round(pop_rec, 5)}), flush=True)

    def purity(codes):
        anc = codes.copy()
        for _ in range(leaf_level - anc_level):
            anc = (anc - 1) >> 1
        g = (ids - 1) // per_genre
        tot = 0
        for a_ in np.unique(anc):
            tot += np.bincount(g[anc == a_]).max()
        return tot / n

    neg_counts = ",".join(
        str(min(i, 2**i - 1)) for i in range(leaf_level + 1)
    )

    def run(name, codes):
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "t.bin")
            write_tree(p, ids, codes)
            tree = ArrayTree.from_file(p)
        tr = TDMTrainer(
            tree=tree, model_type="din", embed_size=args.embed,
            learning_rate=args.lr, total_batch_size=args.batch,
            layer_neg_counts=neg_counts, topk=10, beam_size=20,
            seed=args.seed,
        )
        t0 = time.perf_counter()
        logs = tr.train(train_seqs, train_targets, iterations=args.iters,
                        progress_interval=max(args.iters // 4, 1))
        rec, nd = _recall_tdm(tr, eval_seqs, eval_labels, consumed, eval_users)
        print(json.dumps({
            "stage": name, "purity": round(purity(codes), 4),
            "loss_last": round(logs[-1]["train_loss"], 4),
            "recall@10": round(rec, 5), "ndcg@10": round(nd, 5),
            "wall_s": round(time.perf_counter() - t0, 1),
        }), flush=True)
        return rec

    t0 = time.perf_counter()
    feats = cooccurrence_embeddings(
        train_seqs - 1, train_targets - 1, n,
        dim=args.dim, n_iters=args.cooc_iters, seed=args.seed,
    )
    _, codes_cooc = tree_cluster(ids, feats, cluster_iter=5, seed=args.seed)
    print(json.dumps({
        "stage": "cooc_cluster", "wall_s": round(time.perf_counter() - t0, 1),
        "purity": round(purity(codes_cooc), 4),
    }), flush=True)

    codes_rand = (1 << leaf_level) - 1 + rng.permutation(n)
    r_rand = run("random_tree", codes_rand)
    r_cooc = run("cooc_tree", codes_cooc)
    print(json.dumps({
        "stage": "summary", "recall_random": round(r_rand, 5),
        "recall_cooc": round(r_cooc, 5),
        "improved": bool(r_cooc > r_rand),
    }), flush=True)


if __name__ == "__main__":
    main()
