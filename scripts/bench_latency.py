"""Single-query / small-batch serving latency (VERDICT r4 missing #3).

The reference disciplines itself with an avg-of-100 single-query latency
microbench (examples/.../retrieval/tdm/package.scala:119-126,
examples/src/main/java/com/mass/retrieval/tdm/JavaRecommend.java:19-28);
every repo serving row so far is batch-4096 throughput.  This measures
xplane DEVICE time per batch at batch sizes 1 / 64 / 4096 for

- TDM hybrid packed-beam serving at 1M and 10M items,
- DR block-rerank serving at 1M and 10M items,

giving per-query device latency and showing how much of the beam scan is
fixed per-dispatch overhead vs per-query work.  Host wall through the relay
is meaningless here (CLAUDE.md); on an untunneled host add ~dispatch RTT.

Usage: python scripts/bench_latency.py [tdm|dr|all]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from devtime import device_time_ms

BATCHES = (1, 64, 4096)


def bench_tdm(n_items: int) -> None:
    import jax.numpy as jnp

    from dismember_tpu.models import din
    from dismember_tpu.retrieval.packed_beam import (
        make_hybrid_beam_fn,
        make_packed_tree,
    )

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as bench_mod

    rng = np.random.default_rng(0)
    tree = bench_mod._deep_tree(n_items)
    trainer = bench_mod._deep_trainer(tree)
    trainer.opt_state = None
    packed = make_packed_tree(
        tree, trainer.params["embedding"], beam=20,
        dtype=jnp.bfloat16 if n_items >= 4_000_000 else jnp.float32,
    )
    beam_fn = make_hybrid_beam_fn(packed, din.precompute_seq, din.apply_from_emb)
    for b in BATCHES:
        x = jnp.asarray(
            tree.ids_to_codes(rng.integers(1, n_items + 1, size=(b, 10)))
        )
        ms = device_time_ms(lambda: beam_fn(trainer.params, x), iters=10)
        print(json.dumps({
            "workload": f"tdm_serve_{n_items//1_000_000}m", "batch": b,
            "device_ms_per_batch": round(ms, 3),
            "device_us_per_query": round(ms * 1e3 / b, 1),
        }), flush=True)
    del trainer, tree, packed, beam_fn


def bench_dr(n_items: int) -> None:
    import jax.numpy as jnp

    from dismember_tpu.data.dr_dataset import DRData
    from dismember_tpu.retrieval.dr_serve import make_dr_serving_fn
    from dismember_tpu.train.dr import DRTrainer

    rng = np.random.default_rng(0)
    data = DRData(
        item_to_id={}, id_to_item={}, num_items=n_items,
        train_seqs=rng.integers(0, n_items, size=(8192, 10)).astype(np.int64),
        train_targets=rng.integers(0, n_items, size=8192).astype(np.int64),
        eval_seqs=np.empty((0, 10), np.int64),
        eval_labels=np.empty((0, 1), np.int64),
        eval_users=np.empty((0,), np.int64), user_consumed={},
    )
    trainer = DRTrainer(
        data, num_layers=3, num_nodes=100, num_paths_per_item=2,
        embed_size=16, train_batch_size=8192, num_sampled=8, seed=0,
    )
    trainer._sync_mirrors()
    trainer.layer_opt_state = None
    trainer.rerank_opt_state = None
    fn = make_dr_serving_fn(trainer, beam=20, topk=10)
    for b in BATCHES:
        q = jnp.asarray(data.train_seqs[:b], jnp.int32)
        ms = device_time_ms(
            lambda: fn(trainer.layer_params, trainer.rerank_params, q),
            iters=10,
        )
        print(json.dumps({
            "workload": f"dr_serve_{n_items//1_000_000}m", "batch": b,
            "device_ms_per_batch": round(ms, 3),
            "device_us_per_query": round(ms * 1e3 / b, 1),
        }), flush=True)
    del trainer, fn, data


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("tdm", "all"):
        bench_tdm(1_000_000)
        bench_tdm(10_000_000)
    if which in ("dr", "all"):
        bench_dr(1_000_000)
        bench_dr(10_000_000)


if __name__ == "__main__":
    main()
