"""Tuned-hyperparameter TDM alternation: shows headroom over the conf defaults."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from dismember_tpu.data.ingest import read_csv, unique_items_with_category, user_interactions
from dismember_tpu.data.tdm_dataset import generate_split_samples
from dismember_tpu.index.arraytree import ArrayTree
from dismember_tpu.index.cluster import cluster_tree_from_embeddings
from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
from dismember_tpu.train.tdm import TDMTrainer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CSV = os.path.join(ROOT, "data", "example_data.csv")
OUT = os.path.join(ROOT, "data", "tuned"); os.makedirs(OUT, exist_ok=True)
NEG = "0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,17,19,22,25,30,76,200"

raw = read_csv(CSV); inter = user_interactions(raw)
s = generate_split_samples(inter, 10, 2, 0.8)
ids, cats = unique_items_with_category(raw)
sid, codes = category_sorted_codes(ids, cats)
tree_path = os.path.join(OUT, "tree1.bin")
write_tree(tree_path, sid, codes, stat=s.stat)
eval_data = (s.eval_seqs, s.eval_labels, s.eval_users)

for rnd in range(1, 4):
    tree = ArrayTree.from_file(tree_path)
    tr = TDMTrainer(tree=tree, model_type="din", embed_size=32, learning_rate=3e-3,
                    total_batch_size=8192, layer_neg_counts=NEG, topk=10, beam_size=20,
                    seed=rnd)
    t0 = time.perf_counter()
    tr.train(s.train_seqs, s.train_targets, iterations=3000, progress_interval=3000)
    ev = tr.evaluate(eval_data, s.user_consumed)
    c = max(ev.count, 1)
    print(json.dumps({"run": f"tuned-tdm-round{rnd}", "seconds": round(time.perf_counter()-t0,1),
                      "recall": round(ev.recall/c, 6), "precision": round(ev.precision/c, 6),
                      "ndcg": round(ev.ndcg/c, 6)}), flush=True)
    if rnd < 3:
        ep = os.path.join(OUT, f"embed{rnd}.csv")
        tr.export_embeddings(ep)
        tree_path = os.path.join(OUT, f"tree{rnd+1}.bin")
        cluster_tree_from_embeddings(ep, tree_path, 10, "kmeans")
