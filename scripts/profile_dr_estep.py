"""Per-op xplane profile of the DR E-step at deep-catalog scale.

Separates the layer step and the rerank step, printing each one's top device
ops, to locate the dense-Adam HBM traffic (STATUS.md: 10M-item E-step 45 ms
near the O(table) roofline for the three item-scaled tables).

Usage: python scripts/profile_dr_estep.py [--items 10000000] [--dense|--sparse]
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
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--embed", type=int, default=16)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--nodes", type=int, default=100)
    ap.add_argument("--paths", type=int, default=2)
    ap.add_argument("--sampled", type=int, default=8)
    ap.add_argument("--dense", action="store_true")
    ap.add_argument("--sparse", action="store_true")
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
    print(json.dumps({"items": n, "sparse": trainer._sparse}), flush=True)

    seqs = jnp.asarray(data.train_seqs[: trainer.num_targets_per_batch],
                       jnp.int32)
    targets = data.train_targets[: trainer.num_targets_per_batch]
    paths = jnp.asarray(trainer.path_index.item_paths[targets], jnp.int32)
    labels = jnp.asarray(targets, jnp.int32)
    key = jax.random.PRNGKey(1)

    from devtime import top_ops, device_time_ms

    def layer_only():
        trainer.layer_params, trainer.layer_opt_state, losses = (
            trainer._layer_step(
                trainer.layer_params, trainer.layer_opt_state, seqs, paths))
        return losses

    def rerank_only():
        nonlocal key
        key, sub = jax.random.split(key)
        trainer.rerank_params, trainer.rerank_opt_state, rloss = (
            trainer._rerank_step(
                trainer.rerank_params, trainer.rerank_opt_state, sub, seqs,
                labels))
        return rloss

    ms_l = device_time_ms(layer_only, iters=10)
    print(json.dumps({"layer_step_ms": round(ms_l, 2)}), flush=True)
    for name, ms in top_ops(layer_only, iters=10):
        print(f"  layer  {ms:8.3f}  {name}")
    ms_r = device_time_ms(rerank_only, iters=10)
    print(json.dumps({"rerank_step_ms": round(ms_r, 2)}), flush=True)
    for name, ms in top_ops(rerank_only, iters=10):
        print(f"  rerank {ms:8.3f}  {name}")


if __name__ == "__main__":
    main()
