"""Where does the TDM train step's time go at the batch knee? (VERDICT r4 #6)

The r4 roofline put TDM 10M train at 6.0% of its gather floor, naming the
dedup sort apparatus as the suspect at small batches, and the batch sweep
put the knee at total_batch=65536 (3.44M rows/s, 19.0 ms/step).  Before
building a sort-free dedup, this profiles the pmv step's per-op device time
at the knee config and isolates the sort (lax.sort_key_val), the row
gathers, the segment sums, the Pallas row write, and the forward/backward.

Usage: python scripts/profile_dedup.py [--items 10000000] [--batch 65536]
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
    ap.add_argument("--batch", type=int, default=65_536)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from devtime import device_time_ms, profile_ops

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as bench_mod

    tree = bench_mod._deep_tree(args.items)
    from dismember_tpu.train.tdm import TDMTrainer

    neg_counts = ",".join(
        str(min(i, 2**i - 1)) for i in range(tree.max_level + 1)
    )
    trainer = TDMTrainer(
        tree=tree, model_type="din", embed_size=16,
        layer_neg_counts=neg_counts, topk=10, beam_size=20, seed=0,
        total_batch_size=args.batch,
    )
    b = trainer.num_targets_per_batch
    rng = np.random.default_rng(0)
    sc = jnp.asarray(tree.ids_to_codes(rng.integers(1, args.items + 1, size=(b, 10))))
    tc = jnp.asarray(tree.ids_to_codes(rng.integers(1, args.items + 1, size=b)))
    key = jax.random.PRNGKey(1)

    def thunk():
        trainer.params, trainer.opt_state, loss = trainer._train_step(
            trainer.params, trainer.opt_state, key, tc, sc
        )
        return loss

    ms = device_time_ms(thunk, iters=10)
    rows = b * trainer.sampler.unit
    print(f"step: {ms:.3f} ms/step  targets/step={b}  "
          f"expanded rows/s={rows / (ms / 1e3):,.0f}")
    ops = profile_ops(thunk, iters=10)
    total = sum(ops.values())
    print(f"top ops (of {total:.1f} ms total / 10 iters):")
    for name, t in sorted(ops.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"  {t / 10:8.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
