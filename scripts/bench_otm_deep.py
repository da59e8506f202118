"""Deep-catalog OTM measurement: whole-batch train dispatch at 1M/10M items.

OTM is the worst dense-Adam case of the four algorithms: every batch pays
``n_levels`` sequential BCE+Adam level steps (the lax.scan in
train/otm.OTMTrainer._train_batch_impl), each O(node table) HBM traffic
under dense Adam — at a 10M-item catalog that is ~20 rewrites of a
33.5M-row table + f32 moments per batch.  ``sparse_embed_update`` swaps the
embedding update inside the scan for lazy row-sparse Adam
(train/sparse_adam.py) so each level step touches only the gathered rows.

Usage: python scripts/bench_otm_deep.py [--items 1000000] [--mode both]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synthetic_otm_data(n_items: int, n_rows: int, seq_len: int, label_num: int):
    from dismember_tpu.data.otm_dataset import OTMData, upper_log2

    rng = np.random.default_rng(0)
    leaf_level = upper_log2(n_items)
    lo = (1 << leaf_level) - 1
    seqs = rng.integers(lo, lo + n_items, size=(n_rows, seq_len))
    labels = rng.integers(lo, lo + n_items, size=(n_rows, label_num))
    return OTMData(
        item_to_code={}, code_to_item={}, leaf_level=leaf_level,
        num_items=n_items, all_nodes=np.empty(0, bool),
        train_seqs=seqs.astype(np.int64),
        train_labels=labels.astype(np.int64),
        train_users=np.zeros(n_rows, np.int64),
        eval_seqs=np.empty((0, seq_len), np.int64),
        eval_labels=np.empty((0, label_num), np.int64),
        eval_users=np.empty(0, np.int64),
        user_consumed={}, label_num=label_num,
    )


def measure(
    data, sparse: bool, steps: int, batch_rows: int,
    sparse_format: str = "auto",
) -> dict:
    import jax.numpy as jnp

    from devtime import device_time_ms
    from dismember_tpu.train.otm import OTMTrainer

    tr = OTMTrainer(
        data, embed_size=16, total_train_batch_size=batch_rows * 40,
        beam_size=20, target_mode="pseudo", seed=0,
        sparse_embed_update=sparse, sparse_format=sparse_format,
    )
    seqs = jnp.asarray(data.train_seqs[: tr.train_batch_size], jnp.int32)
    targets = jnp.asarray(data.train_labels[: tr.train_batch_size], jnp.int32)

    def one_batch():
        tr.params, tr.opt_state, losses = tr._train_batch(
            tr.params, tr.opt_state, seqs, targets
        )
        return losses

    ms = device_time_ms(one_batch, iters=steps)
    losses = np.asarray(one_batch())
    return {
        "mode": (
            ("sparse-pmv" if tr._pmv else "sparse-mv") if sparse else "dense"
        ),
        "device_ms_per_batch": round(ms, 2),
        "rows_per_s": round(tr.train_batch_size / (ms / 1e3)),
        "n_levels": tr.n_levels,
        "batch_rows": tr.train_batch_size,
        "loss_first_last": [round(float(losses[0]), 4),
                            round(float(losses[-1]), 4)],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--rows", type=int, default=256, help="samples per batch")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--mode", choices=["sparse", "dense", "both", "formats"],
                    default="both")
    ap.add_argument("--format", choices=["auto", "mv", "pmv"], default="auto")
    args = ap.parse_args()

    data = synthetic_otm_data(args.items, 4 * args.rows, 10, 5)
    print(json.dumps({"items": args.items, "n_rows": len(data.train_seqs),
                      "tree_nodes": data.num_tree_nodes}), flush=True)
    if args.mode == "formats":
        # mv vs pmv: the r2 #9 decision measurement.  gc between runs: at
        # 10M items one trainer's table+state is ~6GB; two alive at once
        # exhaust HBM (the jitted-closure cycles delay collection).
        import gc

        for fmt in ("mv", "pmv"):
            print(
                json.dumps(
                    measure(data, True, args.steps, args.rows,
                            sparse_format=fmt)
                ),
                flush=True,
            )
            gc.collect()
        return
    if args.mode in ("sparse", "both"):
        print(json.dumps(measure(data, True, args.steps, args.rows,
                                 sparse_format=args.format)),
              flush=True)
    if args.mode in ("dense", "both"):
        print(json.dumps(measure(data, False, args.steps, args.rows)),
              flush=True)


if __name__ == "__main__":
    main()
