"""JTM alternation-decay study (VERDICT r1, weak #4).

Round-1 observation: tuned JTM recall peaks at alternation round 2 then
degrades (0.0168 -> 0.0226 -> 0.0200 -> 0.0188).  This reproduces the tuned
4-round run across several seeds to decide whether the decay is seed noise
(+-0.003 band, BASELINE.md) or a real re-learning bug.

Usage: python scripts/jtm_decay_study.py [seed ...]   (default: 7 17 27)
Prints one JSON line per (seed, round) with recall/ndcg.
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
from dismember_tpu.train.pipeline import run_jtm_alternation

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CSV = os.path.join(ROOT, "data", "example_data.csv")
OUT = os.path.join(ROOT, "data", "quality", "jtm_decay")
NEG = "0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,17,19,22,25,30,76,200"


def main() -> None:
    seeds = [int(s) for s in sys.argv[1:]] or [7, 17, 27]
    raw = read_csv(CSV)
    s = generate_split_samples(user_interactions(raw), 10, 2, 0.8)
    ids, cats = unique_items_with_category(raw)
    sid, codes = category_sorted_codes(ids, cats)

    for seed in seeds:
        wd = os.path.join(OUT, f"seed{seed}")
        shutil.rmtree(wd, ignore_errors=True)
        os.makedirs(wd, exist_ok=True)
        tree_path = os.path.join(wd, "tree_round1.bin")
        write_tree(tree_path, sid, codes, stat=s.stat)
        t0 = time.perf_counter()
        _, results = run_jtm_alternation(
            wd, s, tree_path, rounds=4, iterations_per_round=3000, gap=2,
            trainer_kwargs=dict(
                model_type="din", embed_size=32, learning_rate=3e-3,
                total_batch_size=8192, total_eval_batch_size=8192,
                layer_neg_counts=NEG, topk=10, beam_size=20, seed=seed,
            ),
        )
        for rnd, ev in enumerate(results, 1):
            c = max(ev.count, 1)
            print(
                json.dumps(
                    {
                        "seed": seed,
                        "round": rnd,
                        "recall": round(ev.recall / c, 6),
                        "ndcg": round(ev.ndcg / c, 6),
                    }
                ),
                flush=True,
            )
        print(
            json.dumps(
                {"seed": seed, "total_seconds": round(time.perf_counter() - t0, 1)}
            ),
            flush=True,
        )
        shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    main()
