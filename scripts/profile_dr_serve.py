"""Full per-op device-time dump of DR 10M block serving (VERDICT r4 #1).

The r5 roofline put the plane-major serve at 12.8 ms/batch (6.4% of the
HBM floor) with a 1.56 ms physical reshape + 1.43 ms relayout copy — the
[width] -> [item_lanes, m_pad] view is NOT free when m_pad (48 at the
J=2/K=100 bench config) sits below the 128-lane tile.  This dumps the top
ops so each fix can be attributed.

Usage: python scripts/profile_dr_serve.py [--items 10000000] [--top 30]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=10_000_000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax.numpy as jnp

    from devtime import profile_ops
    from dismember_tpu.data.dr_dataset import DRData
    from dismember_tpu.retrieval.dr_serve import make_dr_serving_fn
    from dismember_tpu.train.dr import DRTrainer

    n, batch = args.items, args.batch
    rng = np.random.default_rng(0)
    data = DRData(
        item_to_id={}, id_to_item={}, num_items=n,
        train_seqs=rng.integers(0, n, size=(batch, 10)).astype(np.int64),
        train_targets=rng.integers(0, n, size=batch).astype(np.int64),
        eval_seqs=np.empty((0, 10), np.int64),
        eval_labels=np.empty((0, 1), np.int64),
        eval_users=np.empty((0,), np.int64), user_consumed={},
    )
    trainer = DRTrainer(
        data, num_layers=3, num_nodes=100, num_paths_per_item=2,
        embed_size=16, train_batch_size=batch * 2, num_sampled=8, seed=0,
    )
    trainer._sync_mirrors()
    trainer.layer_opt_state = None
    trainer.rerank_opt_state = None
    fn = make_dr_serving_fn(trainer, beam=20, topk=10)
    q = jnp.asarray(data.train_seqs[:batch], jnp.int32)
    durs = profile_ops(
        lambda: fn(trainer.layer_params, trainer.rerank_params, q),
        iters=args.iters,
    )
    total = sum(v for k, v in durs.items() if "jit_" in k) / args.iters
    print(f"serve: {total:.3f} ms/batch  qps={batch / (total / 1e3):,.0f}",
          flush=True)
    for name, t in sorted(durs.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {t / args.iters:8.3f} ms  {name[:130]}", flush=True)


if __name__ == "__main__":
    main()
