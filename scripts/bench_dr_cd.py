"""Catalog-scale DR coordinate descent (M-step) measurement.

Exercises the vectorized batch-mode aggregation in train/dr_coordinate.py
(composite int64 path keys + lexsort/segment sums; the per-sample dict loop
was the scale hazard) and the item-sequential greedy J-path selection.

Usage: python scripts/bench_dr_cd.py [--items 1000000] [--rows-per-item 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--rows-per-item", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--cand", type=int, default=20)
    ap.add_argument("--mode", choices=["batch", "streaming", "both"],
                    default="batch")
    args = ap.parse_args()
    import logging

    logging.basicConfig(level=logging.INFO)  # CD phase walls

    from dismember_tpu.data.dr_dataset import DRData
    from dismember_tpu.train.dr import DRTrainer
    from dismember_tpu.train.dr_coordinate import coordinate_descent

    n = args.items
    r = n * args.rows_per_item
    rng = np.random.default_rng(0)
    data = DRData(
        item_to_id={}, id_to_item={}, num_items=n,
        train_seqs=rng.integers(0, n, size=(r, 10)).astype(np.int64),
        train_targets=rng.integers(0, n, size=r).astype(np.int64),
        eval_seqs=np.empty((0, 10), np.int64),
        eval_labels=np.empty((0, 1), np.int64),
        eval_users=np.empty((0,), np.int64),
        user_consumed={},
    )
    trainer = DRTrainer(
        data, num_layers=3, num_nodes=100, num_paths_per_item=2,
        embed_size=16, train_batch_size=args.batch, num_sampled=8, seed=0,
    )
    modes = ["batch", "streaming"] if args.mode == "both" else [args.mode]
    for mode in modes:
        t0 = time.perf_counter()
        new_index = coordinate_descent(
            trainer, data.train_seqs, data.train_targets, num_iteration=1,
            num_candidate_path=args.cand, batch_size=args.batch, mode=mode,
        )
        t_cd = time.perf_counter() - t0
        assert new_index.item_paths.shape == (n, 2, 3)
        assert (new_index.item_paths >= 0).all()
        assert (new_index.item_paths < 100).all()
        print(json.dumps({
            "items": n, "rows": r, "mode": mode, "cd_wall_s": round(t_cd, 1),
            "rows_per_s": round(r / t_cd),
        }), flush=True)


if __name__ == "__main__":
    main()
