"""DR E-step batch-size sweep at 10M items (VERDICT r4 #5).

TDM's knee methodology (scripts/bench_tdm_batch_sweep.py) applied to the
DR E-step: the r4 roofline put it at 17.9% of the gather-issue floor with
the rerank step 9.2 of 16.6 ms at batch 4096 — fixed per-dispatch apparatus
that bigger batches amortize.  Each batch size is a fresh program shape
(one compile each, same process); xplane device times.

Usage: python scripts/bench_dr_estep_sweep.py [--items 10000000]
       [--batches 4096,8192,16384,32768]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=10_000_000)
    ap.add_argument("--batches", default="4096,8192,16384,32768")
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from devtime import device_time_ms
    from dismember_tpu.data.dr_dataset import DRData
    from dismember_tpu.train.dr import DRTrainer

    n = args.items
    rng = np.random.default_rng(0)
    batches = [int(b) for b in args.batches.split(",")]
    bmax = max(batches)
    data = DRData(
        item_to_id={}, id_to_item={}, num_items=n,
        train_seqs=rng.integers(0, n, size=(bmax, 10)).astype(np.int64),
        train_targets=rng.integers(0, n, size=bmax).astype(np.int64),
        eval_seqs=np.empty((0, 10), np.int64),
        eval_labels=np.empty((0, 1), np.int64),
        eval_users=np.empty((0,), np.int64), user_consumed={},
    )

    for batch in batches:
        trainer = DRTrainer(
            data, num_layers=3, num_nodes=100, num_paths_per_item=2,
            embed_size=16, train_batch_size=batch * 2, num_sampled=8, seed=0,
        )
        seqs = jnp.asarray(data.train_seqs[:batch], jnp.int32)
        paths = jnp.asarray(
            trainer.path_index.item_paths[data.train_targets[:batch]],
            jnp.int32,
        )
        labels = jnp.asarray(data.train_targets[:batch], jnp.int32)
        key = jax.random.PRNGKey(1)

        if getattr(trainer, "_estep_pmv", None):
            thunk = lambda: trainer._estep_fused(key, seqs, paths, labels)[1]
        else:
            def thunk():
                trainer.layer_params, trainer.layer_opt_state, _ = (
                    trainer._layer_step(
                        trainer.layer_params, trainer.layer_opt_state,
                        seqs, paths))
                trainer.rerank_params, trainer.rerank_opt_state, r = (
                    trainer._rerank_step(
                        trainer.rerank_params, trainer.rerank_opt_state,
                        key, seqs, labels))
                return r

        ms = device_time_ms(thunk, iters=args.steps)
        rows = batch * 2
        print(json.dumps({
            "batch": batch,
            "device_ms_per_step": round(ms, 2),
            "rows_per_s": round(rows / (ms / 1e3)) if ms > 0 else 0,
            "fused": bool(getattr(trainer, "_estep_pmv", None)),
        }), flush=True)
        del trainer


if __name__ == "__main__":
    main()
