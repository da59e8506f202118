"""Full-data quality runs with reference-config hyperparameters.

Runs all four algorithms on data/example_data.csv with the configs/*.conf
hyperparameters (TDM 2000 iters + cluster + retrain; JTM 1000 iters + tree
learning + retrain; OTM 5 epochs; DR 5 epochs + coordinate descent + 1
epoch), printing one JSON line per result row for BASELINE.md.
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
from dismember_tpu.train.tdm import TDMTrainer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CSV = os.path.join(ROOT, "data", "example_data.csv")
OUT = os.path.join(ROOT, "data", "quality")
NEG = "0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,17,19,22,25,30,76,200"


def report(name, metrics, seconds):
    print(
        json.dumps({"run": name, "seconds": round(seconds, 1), **metrics}),
        flush=True,
    )


def eval_to_dict(ev):
    c = max(ev.count, 1)
    return {
        "loss": round(ev.loss / c, 4),
        "precision": round(ev.precision / c, 6),
        "recall": round(ev.recall / c, 6),
        "ndcg": round(ev.ndcg / c, 6),
    }


def tdm_like(name, iterations, lr, do_cluster, do_jtm):
    os.makedirs(OUT, exist_ok=True)
    raw = read_csv(CSV)
    inter = user_interactions(raw)
    s = generate_split_samples(inter, 10, 2, 0.8)
    ids, cats = unique_items_with_category(raw)
    sid, codes = category_sorted_codes(ids, cats)
    tree_path = os.path.join(OUT, f"{name}_tree.bin")
    write_tree(tree_path, sid, codes, stat=s.stat)
    eval_data = (s.eval_seqs, s.eval_labels, s.eval_users)

    def train_round(tree_path, tag, seed):
        tree = ArrayTree.from_file(tree_path)
        tr = TDMTrainer(
            tree=tree, model_type="din", embed_size=16, learning_rate=lr,
            total_batch_size=8192, total_eval_batch_size=8192,
            layer_neg_counts=NEG, topk=10, beam_size=20, seed=seed,
        )
        t0 = time.perf_counter()
        tr.train(s.train_seqs, s.train_targets, iterations=iterations,
                 progress_interval=iterations)
        train_t = time.perf_counter() - t0
        ev = tr.evaluate(eval_data, s.user_consumed)
        report(f"{name}-{tag}", eval_to_dict(ev), train_t)
        return tr

    tr = train_round(tree_path, "round1", 7)
    if do_cluster:
        embed_path = os.path.join(OUT, f"{name}_embed.csv")
        tr.export_embeddings(embed_path)
        tree2_path = os.path.join(OUT, f"{name}_tree2.bin")
        t0 = time.perf_counter()
        cluster_tree_from_embeddings(embed_path, tree2_path, 10, "kmeans")
        report(f"{name}-cluster", {}, time.perf_counter() - t0)
        train_round(tree2_path, "round2", 8)
    if do_jtm:
        from dismember_tpu.train.jtm import TreeLearner, write_projection_tree

        t0 = time.perf_counter()
        learner = TreeLearner(
            tree=tr.tree, params=tr.params, forward=tr.forward,
            train_seqs=s.train_seqs, train_targets=s.train_targets, gap=2,
        )
        proj = learner.optimize()
        tree3_path = os.path.join(OUT, f"{name}_tree3.bin")
        write_projection_tree(tr.tree, proj, tree3_path)
        report(f"{name}-treelearn", {}, time.perf_counter() - t0)
        train_round(tree3_path, "round2", 9)


def otm_run():
    from dismember_tpu.data.otm_dataset import build_otm_data
    from dismember_tpu.train.otm import OTMTrainer

    data = build_otm_data(CSV, 10, 2, 0.8, leaf_init_mode="random",
                          label_num=5, seed=42)
    tr = OTMTrainer(data, model_type="din", embed_size=16, learning_rate=3e-3,
                    total_train_batch_size=8192, total_eval_batch_size=8192,
                    beam_size=20, topk=10, target_mode="pseudo", seed=42)
    t0 = time.perf_counter()
    logs = tr.train(num_epochs=5)
    for log in logs:
        report(
            f"otm-epoch{log['epoch']}",
            {
                "loss": round(log["eval_loss"], 4),
                "precision": round(log["precision"], 6),
                "recall": round(log["recall"], 6),
                "ndcg": round(log["ndcg"], 6),
            },
            log["time"],
        )
    report("otm-total", {}, time.perf_counter() - t0)


def dr_run():
    from dismember_tpu.data.dr_dataset import build_dr_data
    from dismember_tpu.train.dr import DRTrainer
    from dismember_tpu.train.dr_coordinate import coordinate_descent

    data = build_dr_data(CSV, 10, 2, 0.8)
    tr = DRTrainer(data, num_layers=3, num_nodes=100, num_paths_per_item=2,
                   embed_size=16, learning_rate=3e-3, train_batch_size=8192,
                   eval_batch_size=8192, num_sampled=1, topk=10, beam_size=20,
                   seed=0)
    t0 = time.perf_counter()
    res = tr.train(num_epochs=5)
    for i, r in enumerate(res, 1):
        report(f"dr-epoch{i}", {
            "layer_loss": [round(x, 4) for x in r.layer_loss],
            "rerank_loss": round(r.rerank_loss, 4),
            "precision": round(r.precision, 6),
            "recall": round(r.recall, 6),
            "ndcg": round(r.ndcg, 6),
        }, 0)
    t_cd = time.perf_counter()
    tr.path_index = coordinate_descent(
        tr, data.train_seqs, data.train_targets, num_iteration=1,
        num_candidate_path=20, batch_size=4096, mode="streaming",
    )
    report("dr-cd", {}, time.perf_counter() - t_cd)
    res2 = tr.train(num_epochs=1)
    report("dr-after-cd", {
        "layer_loss": [round(x, 4) for x in res2[-1].layer_loss],
        "rerank_loss": round(res2[-1].rerank_loss, 4),
        "precision": round(res2[-1].precision, 6),
        "recall": round(res2[-1].recall, 6),
        "ndcg": round(res2[-1].ndcg, 6),
    }, time.perf_counter() - t0)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "tdm"):
        tdm_like("tdm", 2000, 1e-4, do_cluster=True, do_jtm=False)
    if which in ("all", "jtm"):
        tdm_like("jtm", 1000, 1e-4, do_cluster=False, do_jtm=True)
    if which in ("all", "dr"):
        dr_run()
    if which in ("all", "otm"):
        otm_run()
