"""TDM 10M-item pmv train step vs batch size (roofline follow-up, r4).

scripts/roofline.py showed the 2.60 ms/step headline runs at 6.0% of any
hardware floor: at the default 25-target batch the step is dominated by
fixed apparatus (dedup sort, per-op latency), not by the gather/HBM/MXU
floors.  Bigger batches amortize the apparatus — this sweep measures
expanded rows/s at several total batch sizes to find the knee.

Usage: python scripts/bench_tdm_batch_sweep.py [--items 10000000]
"""

import argparse
import gc
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=10_000_000)
    ap.add_argument("--batches", default="8192,32768,131072,524288")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _deep_tree
    from devtime import device_time_ms
    from dismember_tpu.train.tdm import TDMTrainer

    rng = np.random.default_rng(0)
    n = args.items
    tree = _deep_tree(n)
    neg_counts = ",".join(
        str(min(i, 2**i - 1)) for i in range(tree.max_level + 1)
    )
    for total in (int(x) for x in args.batches.split(",")):
        trainer = TDMTrainer(
            tree=tree, model_type="din", embed_size=16,
            layer_neg_counts=neg_counts, topk=10, beam_size=20, seed=0,
            total_batch_size=total,
        )
        b = trainer.num_targets_per_batch
        sc = jnp.asarray(
            tree.ids_to_codes(rng.integers(1, n + 1, size=(b, 10)))
        )
        tc = jnp.asarray(tree.ids_to_codes(rng.integers(1, n + 1, size=b)))
        key = jax.random.PRNGKey(1)

        def thunk():
            trainer.params, trainer.opt_state, loss = trainer._train_step(
                trainer.params, trainer.opt_state, key, tc, sc
            )
            return loss

        ms = device_time_ms(thunk, iters=10)
        rows = b * trainer.sampler.unit
        print(json.dumps({
            "total_batch": total, "targets": b, "expanded_rows": rows,
            "device_ms_per_step": round(ms, 2),
            "rows_per_s": round(rows / (ms / 1e3)),
        }), flush=True)
        del trainer, sc, tc
        gc.collect()


if __name__ == "__main__":
    main()
