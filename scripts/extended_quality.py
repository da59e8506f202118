"""Extended alternation runs: multi-round JTM / DR EM / longer OTM."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from dismember_tpu.data.ingest import read_csv, unique_items_with_category, user_interactions
from dismember_tpu.data.tdm_dataset import generate_split_samples
from dismember_tpu.index.arraytree import ArrayTree
from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
from dismember_tpu.train.tdm import TDMTrainer
from dismember_tpu.train.jtm import TreeLearner, write_projection_tree

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CSV = os.path.join(ROOT, "data", "example_data.csv")
OUT = os.path.join(ROOT, "data", "ext"); os.makedirs(OUT, exist_ok=True)
NEG = "0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,17,19,22,25,30,76,200"

def log(name, **kw):
    print(json.dumps({"run": name, **kw}), flush=True)

raw = read_csv(CSV); inter = user_interactions(raw)
s = generate_split_samples(inter, 10, 2, 0.8)
ids, cats = unique_items_with_category(raw)
sid, codes = category_sorted_codes(ids, cats)
ev = (s.eval_seqs, s.eval_labels, s.eval_users)

def train_eval(tree_path, seed, iters=3000):
    tree = ArrayTree.from_file(tree_path)
    tr = TDMTrainer(tree=tree, model_type="din", embed_size=32, learning_rate=3e-3,
                    total_batch_size=8192, layer_neg_counts=NEG, topk=10, beam_size=20, seed=seed)
    tr.train(s.train_seqs, s.train_targets, iterations=iters, progress_interval=iters)
    e = tr.evaluate(ev, s.user_consumed)
    c = max(e.count, 1)
    return tr, dict(recall=round(e.recall/c,6), precision=round(e.precision/c,6), ndcg=round(e.ndcg/c,6))

# --- JTM multi-round ---
tp = os.path.join(OUT, "jtm1.bin")
write_tree(tp, sid, codes, stat=s.stat)
for rnd in range(1, 5):
    tr, m = train_eval(tp, seed=rnd)
    log(f"jtm-ext-round{rnd}", **m)
    if rnd < 4:
        learner = TreeLearner(tree=tr.tree, params=tr.params, forward=tr.forward,
                              train_seqs=s.train_seqs, train_targets=s.train_targets, gap=2)
        proj = learner.optimize()
        tp = os.path.join(OUT, f"jtm{rnd+1}.bin")
        write_projection_tree(tr.tree, proj, tp)

# --- DR 2 EM rounds with bigger model ---
from dismember_tpu.data.dr_dataset import build_dr_data
from dismember_tpu.train.dr import DRTrainer
from dismember_tpu.train.dr_coordinate import coordinate_descent
dd = build_dr_data(CSV, 10, 2, 0.8)
dr = DRTrainer(dd, num_layers=3, num_nodes=100, num_paths_per_item=2, embed_size=32,
               learning_rate=3e-3, train_batch_size=8192, beam_size=20, topk=10, seed=0)
for em in range(1, 4):
    res = dr.train(num_epochs=4 if em == 1 else 2)
    log(f"dr-ext-em{em}", recall=round(res[-1].recall,6), ndcg=round(res[-1].ndcg,6))
    if em < 3:
        dr.path_index = coordinate_descent(dr, dd.train_seqs, dd.train_targets,
                                           num_iteration=1, num_candidate_path=20,
                                           batch_size=4096, mode="streaming")

# --- OTM longer with fast batches ---
from dismember_tpu.data.otm_dataset import build_otm_data
from dismember_tpu.train.otm import OTMTrainer
od = build_otm_data(CSV, 10, 2, 0.8, leaf_init_mode="random", label_num=5, seed=42)
otm = OTMTrainer(od, embed_size=32, learning_rate=3e-3, total_train_batch_size=8192,
                 beam_size=20, topk=10, target_mode="pseudo", seed=42)
logs = otm.train(num_epochs=10)
best = max(logs, key=lambda l: l["recall"])
log("otm-ext-best", epoch=best["epoch"], recall=round(best["recall"],6), ndcg=round(best["ndcg"],6))
