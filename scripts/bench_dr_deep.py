"""Deep-catalog Deep Retrieval measurement: E-step train + device serving.

Before this round the rerank trainer materialized a [B, num_items] Gumbel
tensor per step (exact without-replacement sampling) — fine at movielens
scale, impossible at 1M+ items.  With the rejection sampler
(models/dr_models.sample_negatives) and lazy row-sparse Adam on the three
item-scaled tables (layer embedding, rerank embedding, softmax weights) the
E-step runs at catalog scale.

Usage: python scripts/bench_dr_deep.py [--items 1000000] [--batch 4096]
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
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--embed", type=int, default=16)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--nodes", type=int, default=100)
    ap.add_argument("--paths", type=int, default=2)
    ap.add_argument("--sampled", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--dense", action="store_true", help="force dense Adam")
    ap.add_argument("--sparse", action="store_true", help="force sparse Adam")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dismember_tpu.data.dr_dataset import DRData
    from dismember_tpu.train.dr import DRTrainer

    n = args.items
    rng = np.random.default_rng(0)
    n_rows = 4 * args.batch
    data = DRData(
        item_to_id={}, id_to_item={}, num_items=n,
        train_seqs=rng.integers(0, n, size=(n_rows, 10)).astype(np.int64),
        train_targets=rng.integers(0, n, size=n_rows).astype(np.int64),
        eval_seqs=np.empty((0, 10), np.int64),
        eval_labels=np.empty((0, 1), np.int64),
        eval_users=np.empty((0,), np.int64),
        user_consumed={},
    )
    trainer = DRTrainer(
        data, num_layers=args.layers, num_nodes=args.nodes,
        num_paths_per_item=args.paths, embed_size=args.embed,
        train_batch_size=args.batch * args.paths,
        num_sampled=args.sampled, seed=0,
        sparse_embed_update=(
            False if args.dense else True if args.sparse else None
        ),
    )
    print(json.dumps({"items": n, "sparse": trainer._sparse,
                      "targets_per_batch": trainer.num_targets_per_batch}),
          flush=True)

    seqs = jnp.asarray(data.train_seqs[: trainer.num_targets_per_batch],
                       jnp.int32)
    targets = data.train_targets[: trainer.num_targets_per_batch]
    paths = jnp.asarray(trainer.path_index.item_paths[targets], jnp.int32)
    labels = jnp.asarray(targets, jnp.int32)

    key = jax.random.PRNGKey(1)

    def one_step():
        nonlocal key
        key, sub = jax.random.split(key)
        trainer.layer_params, trainer.layer_opt_state, losses = (
            trainer._layer_step(
                trainer.layer_params, trainer.layer_opt_state, seqs, paths))
        trainer.rerank_params, trainer.rerank_opt_state, rloss = (
            trainer._rerank_step(
                trainer.rerank_params, trainer.rerank_opt_state, sub, seqs,
                labels))
        return losses, rloss

    # device time via xplane — host wall-clock lies through the relay even
    # for dependent chains (CLAUDE.md measurement rules)
    from devtime import device_time_ms

    ms = device_time_ms(lambda: one_step(), iters=args.steps)
    rows_per_s = trainer.num_targets_per_batch * args.paths / (ms / 1e3)
    losses, rloss = one_step()
    print(json.dumps({
        "dr_train_rows_per_s": round(rows_per_s),
        "device_ms_per_step": round(ms, 2),
        "layer_loss": [round(float(x), 4) for x in np.asarray(losses)],
        "rerank_loss": round(float(rloss), 4),
    }), flush=True)

    # device serving QPS (path beam + rerank over candidate union)
    from dismember_tpu.retrieval.dr_serve import make_dr_serving_fn

    fn = make_dr_serving_fn(trainer, beam=20, topk=10)
    if fn is None:
        print(json.dumps({"dr_serving": "path table too large"}), flush=True)
        return
    q = jnp.asarray(data.train_seqs[: args.batch], jnp.int32)
    ms = device_time_ms(
        lambda: fn(trainer.layer_params, trainer.rerank_params, q), iters=10
    )
    qps = args.batch / (ms / 1e3) if ms > 0 else 0.0
    print(json.dumps({"dr_serving_qps": round(qps),
                      "device_ms_per_batch": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
