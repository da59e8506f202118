"""Why did tree alternation REDUCE recall at 1M items? (VERDICT r2 #4)

The 1M quality run (scripts/quality_1m.py, /tmp/q1m_tdm3.log) showed
training learns (recall@10 0.0738 vs 0.0163 popularity) but each
"model-matched" tree made recall WORSE: random 0.0738 -> clustered
0.0620 -> JTM 0.0420, while the training loss on the structured trees
was LOWER (0.212 -> 0.106 -> 0.078).  This script separates the
candidate explanations on a 200k-item version of the same catalog:

  H-cluster  the learned-embedding clusters are bad (e.g. grouped by
             popularity, not genre)  -> measure cluster purity against
             the TRUE genre blocks (item ids encode genre), and train on
             the GROUND-TRUTH genre tree: if GT also loses to random,
             clustering quality is not the issue.
  H-beam     structured trees concentrate a user's items under few
             subtrees; beam errors prune whole genres  -> recall vs
             candidate_num {20, 40, 80}: structured trees recovering
             faster with wider beams = pruning losses.
  H-diversity beam commits to one genre block; eval labels mix two
             genres (85/15)  -> mean #distinct genres in the top-10.

Run AFTER the 1M runs (same TPU; serialize):
  python scripts/diagnose_alternation.py [--items 200000 ...]
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

from quality_1m import gen_catalog, _popularity_recall

N_EVAL = 20_000


def genre_of(ids: np.ndarray, per_genre: int) -> np.ndarray:
    return (ids - 1) // per_genre


def cluster_purity(codes: np.ndarray, ids: np.ndarray, per_genre: int,
                   leaf_level: int, anc_level: int) -> float:
    """Weighted modal-genre fraction of each level-``anc_level`` subtree."""
    anc = codes.copy()
    for _ in range(leaf_level - anc_level):
        anc = (anc - 1) // 2
    g = genre_of(ids, per_genre)
    # purity = sum over ancestors of max genre count / n
    order = np.lexsort((g, anc))
    anc_s, g_s = anc[order], g[order]
    # count per (anc, genre) run
    new_run = np.ones(len(anc_s), bool)
    new_run[1:] = (anc_s[1:] != anc_s[:-1]) | (g_s[1:] != g_s[:-1])
    run_ids = np.cumsum(new_run) - 1
    run_counts = np.bincount(run_ids)
    run_anc = anc_s[new_run]
    # max run count per ancestor
    best = {}
    for a, c in zip(run_anc, run_counts):
        if c > best.get(a, 0):
            best[a] = c
    return float(sum(best.values())) / len(ids)


def eval_tree(name, trainer, eval_seqs, eval_labels, eval_users, consumed,
              per_genre, beams=(20, 40, 80)):
    from dismember_tpu.core.metrics import compute_metrics_batch

    sel = slice(0, min(N_EVAL, len(eval_users)))
    cons = [consumed[int(u)] for u in eval_users[sel]]
    out = {"stage": name}
    for cn in beams:
        t0 = time.perf_counter()
        recs = trainer.recommend_batch(
            eval_seqs[sel], candidate_num=cn, consumed=cons, batch_size=4096
        )
        rec_padded = np.full((len(recs), trainer.topk), -1, np.int64)
        for i, r in enumerate(recs):
            rec_padded[i, : len(r)] = r
        _, r, nd = compute_metrics_batch(rec_padded, eval_labels[sel])
        out[f"recall@10_beam{cn}"] = round(float(r.mean()), 5)
        if cn == beams[0]:
            # genre diversity of the top-10 under the default beam
            valid = rec_padded > 0
            g = np.where(valid, genre_of(np.maximum(rec_padded, 1), per_genre), -1)
            div = [len(set(row[row >= 0].tolist())) for row in g]
            out["mean_distinct_genres@10"] = round(float(np.mean(div)), 3)
            out["eval_wall_s"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=200_000)
    ap.add_argument("--users", type=int, default=30_000)
    ap.add_argument("--genres", type=int, default=400)
    ap.add_argument("--embed", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--batch", type=int, default=65_536)
    ap.add_argument("--iters", type=int, default=3_000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from dismember_tpu.index.arraytree import ArrayTree
    from dismember_tpu.index.cluster import tree_cluster
    from dismember_tpu.index.tree_io import write_tree
    from dismember_tpu.train.tdm import TDMTrainer

    per_genre = args.items // args.genres
    (train_seqs, train_targets, eval_seqs, eval_labels, eval_users,
     consumed) = gen_catalog(args.items, args.users, args.genres, args.seed)
    n = args.items
    ids = np.arange(1, n + 1, dtype=np.int64)
    leaf_level = int(np.ceil(np.log2(n)))
    rng = np.random.default_rng(args.seed)
    anc_level = int(np.ceil(np.log2(args.genres)))

    pop_rec, _ = _popularity_recall(
        train_targets, eval_labels, consumed, eval_users,
        n_eval=min(N_EVAL, len(eval_users)),
    )
    print(json.dumps({"stage": "popularity_baseline",
                      "recall@10": round(pop_rec, 5)}), flush=True)

    neg_counts = None

    def make_trainer(codes):
        nonlocal neg_counts
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "t.bin")
            write_tree(p, ids, codes)
            tree = ArrayTree.from_file(p)
        if neg_counts is None:
            neg_counts = ",".join(
                str(min(i, 2**i - 1)) for i in range(tree.max_level + 1)
            )
        return TDMTrainer(
            tree=tree, model_type="din", embed_size=args.embed,
            learning_rate=args.lr, total_batch_size=args.batch,
            layer_neg_counts=neg_counts, topk=10, beam_size=20,
            seed=args.seed,
        ), tree

    def train(name, codes, trainer=None, tree=None):
        """Train ``args.iters`` more iterations (fresh trainer unless given
        one to continue — the schedule-bound check)."""
        if trainer is None:
            trainer, tree = make_trainer(codes)
        t0 = time.perf_counter()
        logs = trainer.train(train_seqs, train_targets, iterations=args.iters,
                             progress_interval=max(args.iters // 4, 1))
        print(json.dumps({
            "stage": f"{name}_train",
            "loss_first": round(logs[0]["train_loss"], 4),
            "loss_last": round(logs[-1]["train_loss"], 4),
            "train_wall_s": round(time.perf_counter() - t0, 1),
        }), flush=True)
        return trainer, tree

    # 1) random tree
    codes_rand = (1 << leaf_level) - 1 + rng.permutation(n)
    tr_rand, tree_rand = train("random", codes_rand)
    eval_tree("random", tr_rand, eval_seqs, eval_labels, eval_users,
              consumed, per_genre)

    # 2) ground-truth genre tree (ids are genre-contiguous by construction)
    codes_gt = (1 << leaf_level) - 1 + (ids - 1)
    print(json.dumps({
        "stage": "gt_purity",
        "purity": round(cluster_purity(codes_gt, ids, per_genre,
                                       leaf_level, anc_level), 4),
    }), flush=True)
    tr_gt, tree_gt = train("ground_truth_genre", codes_gt)
    eval_tree("ground_truth_genre", tr_gt, eval_seqs, eval_labels,
              eval_users, consumed, per_genre)
    # schedule-bound check: does the structured tree catch up with 2x budget?
    train("ground_truth_genre_2x", codes_gt, trainer=tr_gt, tree=tree_gt)
    eval_tree("ground_truth_genre_2x", tr_gt, eval_seqs, eval_labels,
              eval_users, consumed, per_genre)

    # 3) recluster from the random-tree run's learned embeddings
    emb = np.asarray(tr_rand.params["embedding"])[
        tree_rand.ids_to_codes(ids)
    ].astype(np.float32)
    _, codes_cl = tree_cluster(ids, emb, cluster_iter=5, seed=args.seed)
    print(json.dumps({
        "stage": "recluster_purity",
        "purity": round(cluster_purity(codes_cl, ids, per_genre,
                                       leaf_level, anc_level), 4),
        "purity_random": round(cluster_purity(codes_rand, ids, per_genre,
                                              leaf_level, anc_level), 4),
    }), flush=True)
    tr_cl, _ = train("reclustered", codes_cl)
    eval_tree("reclustered", tr_cl, eval_seqs, eval_labels, eval_users,
              consumed, per_genre)


if __name__ == "__main__":
    main()
