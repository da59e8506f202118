"""Full-data quality runs with reference-config hyperparameters.

Runs all four algorithms on data/example_data.csv with the configs/*.conf
hyperparameters (TDM 2000 iters + cluster + retrain; JTM 1000 iters + tree
learning + retrain; OTM 5 epochs + tree construction + retrain; DR 5 epochs
+ coordinate descent + 1 epoch), printing one JSON line per result row for
BASELINE.md.

TDM/JTM/OTM alternation all run through the stage-checkpointed pipeline
drivers (dismember_tpu.train.pipeline), so a killed run resumes at the last
completed stage; each invocation starts from a clean workdir by default.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dismember_tpu.data.ingest import (
    read_csv,
    unique_items_with_category,
    user_interactions,
)
from dismember_tpu.data.tdm_dataset import generate_split_samples
from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
from dismember_tpu.train.pipeline import (
    run_jtm_alternation,
    run_otm_alternation,
    run_tdm_alternation,
)

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


def _workdir(name, resume):
    wd = os.path.join(OUT, name)
    if not resume:
        shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(wd, exist_ok=True)
    return wd


def _samples_and_tree(wd):
    raw = read_csv(CSV)
    inter = user_interactions(raw)
    s = generate_split_samples(inter, 10, 2, 0.8)
    ids, cats = unique_items_with_category(raw)
    sid, codes = category_sorted_codes(ids, cats)
    tree_path = os.path.join(wd, "tree_round1.bin")
    write_tree(tree_path, sid, codes, stat=s.stat)
    return s, tree_path


def tdm_run(resume=False):
    wd = _workdir("tdm_pipe", resume)
    s, tree_path = _samples_and_tree(wd)
    t0 = time.perf_counter()
    _, results = run_tdm_alternation(
        wd, s, tree_path, rounds=2, iterations_per_round=2000,
        cluster_type="kmeans", cluster_iter=10,
        trainer_kwargs=dict(
            model_type="din", embed_size=16, learning_rate=1e-4,
            total_batch_size=8192, total_eval_batch_size=8192,
            layer_neg_counts=NEG, topk=10, beam_size=20, seed=7,
        ),
    )
    for i, ev in enumerate(results, 1):
        report(f"tdm-round{i}", eval_to_dict(ev), 0)
    report("tdm-total", {}, time.perf_counter() - t0)


def jtm_run(resume=False, iterations=1000, lr=1e-4, embed=16, rounds=2):
    wd = _workdir("jtm_pipe", resume)
    s, tree_path = _samples_and_tree(wd)
    t0 = time.perf_counter()
    _, results = run_jtm_alternation(
        wd, s, tree_path, rounds=rounds, iterations_per_round=iterations,
        gap=2,
        trainer_kwargs=dict(
            model_type="din", embed_size=embed, learning_rate=lr,
            total_batch_size=8192, total_eval_batch_size=8192,
            layer_neg_counts=NEG, topk=10, beam_size=20, seed=7,
        ),
    )
    for i, ev in enumerate(results, 1):
        report(f"jtm-round{i}", eval_to_dict(ev), 0)
    report("jtm-total", {}, time.perf_counter() - t0)


def otm_run(resume=False):
    wd = _workdir("otm_pipe", resume)
    t0 = time.perf_counter()
    _, results = run_otm_alternation(
        wd, CSV, rounds=2, epochs_per_round=5, label_num=5,
        leaf_init_mode="random", seed=42,
        trainer_kwargs=dict(
            model_type="din", embed_size=16, learning_rate=3e-3,
            total_train_batch_size=8192, total_eval_batch_size=8192,
            beam_size=20, topk=10, target_mode="pseudo", seed=42,
        ),
    )
    for r in results:
        report(
            f"otm-round{r['round']}",
            {
                "loss": round(r["loss"], 4),
                "precision": round(r["precision"], 6),
                "recall": round(r["recall"], 6),
                "ndcg": round(r["ndcg"], 6),
            },
            0,
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
    resume = "--resume" in sys.argv
    if which in ("all", "tdm"):
        tdm_run(resume)
    if which in ("all", "jtm"):
        jtm_run(resume)
    if which in ("all", "dr"):
        dr_run()
    if which in ("all", "otm"):
        otm_run(resume)
