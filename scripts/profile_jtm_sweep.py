"""Where do JTM's 375s (1M-item sweep) go?  (VERDICT r2 #8)

The sweep alternates, per chain level, HOST work (ancestor math,
np.add.at accumulation) with BLOCKED device scoring calls (np.asarray on
each score batch forces a sync through the ~30ms-RTT relay).  This script
times one representative level pair of the 1M-item sweep with the phases
split out:

  prep    — _seq_codes_at_level + chain-candidate host math
  h2d+fwd — the blocked device score call (transfer + forward + fetch)
  addat   — np.add.at accumulation into the [N, 2^d] weight matrix
  assign  — vectorized argmax + overflow rebalance

Coarse wall-clock is the right tool here: every phase is a multi-second
host-synchronous section (the device-call phase pays the relay RTT per
batch by design of the current code).

Usage: python scripts/profile_jtm_sweep.py [--items 1000000] [--levels 8]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--rows-per-item", type=int, default=2)
    ap.add_argument("--embed", type=int, default=16)
    ap.add_argument("--gap", type=int, default=2)
    ap.add_argument("--old-level", type=int, default=8)
    ap.add_argument("--score-batch", type=int, default=65536)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dismember_tpu.index.arraytree import ArrayTree
    from dismember_tpu.index.tree_io import write_tree
    from dismember_tpu.models import din
    from dismember_tpu.train.jtm import TreeLearner

    n = args.items
    rng = np.random.default_rng(0)
    ids = np.arange(1, n + 1, dtype=np.int64)
    leaf_level = int(np.ceil(np.log2(n)))
    codes = (1 << leaf_level) - 1 + rng.permutation(n)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t.bin")
        write_tree(p, ids, codes)
        tree = ArrayTree.from_file(p)

    r = n * args.rows_per_item
    train_seqs = rng.integers(1, n + 1, size=(r, 10)).astype(np.int64)
    train_targets = np.repeat(ids, args.rows_per_item)
    num_index = (1 << (tree.max_level + 1)) - 1
    params = din.init_params(jax.random.PRNGKey(0), num_index, args.embed)

    t0 = time.perf_counter()
    learner = TreeLearner(
        tree, params, din.forward, train_seqs, train_targets,
        gap=args.gap, score_batch_rows=args.score_batch,
    )
    print(f"learner build: {time.perf_counter() - t0:.1f}s")

    old_level = args.old_level
    level = min(tree.max_level, old_level + args.gap)
    d = level - old_level
    n_cand = 1 << d
    proj = learner._old_ancestors_at_level(old_level)

    # --- phase-split re-run of compute_weights for this level pair -------
    phases = {"prep": 0.0, "h2d+fwd": 0.0, "addat": 0.0}
    weights = np.zeros((n, n_cand), dtype=np.float64)
    cand = (proj.astype(np.int64)[:, None] * n_cand + (n_cand - 1)) + np.arange(n_cand)
    n_calls = 0
    for k in range(d):
        lvl = level - k
        t0 = time.perf_counter()
        chain = cand.copy()
        for _ in range(k):
            chain = (chain - 1) >> 1
        seq_codes = learner._seq_codes_at_level(lvl)
        row_chain = chain[learner.row_item_pos]
        phases["prep"] += time.perf_counter() - t0
        for s in range(0, r, args.score_batch):
            e = min(s + args.score_batch, r)
            t0 = time.perf_counter()
            logits = np.asarray(
                learner._score_fn(
                    learner.params,
                    jnp.asarray(row_chain[s:e], jnp.int32),
                    jnp.asarray(seq_codes[s:e], jnp.int32),
                ),
                dtype=np.float64,
            )
            phases["h2d+fwd"] += time.perf_counter() - t0
            n_calls += 1
            t0 = time.perf_counter()
            np.add.at(weights, learner.row_item_pos[s:e], logits)
            phases["addat"] += time.perf_counter() - t0

    t0 = time.perf_counter()
    choice = proj * n_cand + (n_cand - 1) + np.argmax(weights, axis=1)
    np.unique(choice, return_counts=True)
    assign_s = time.perf_counter() - t0

    total = sum(phases.values()) + assign_s
    print(f"level pair {old_level}->{level}: {total:.1f}s total, "
          f"{n_calls} blocked device calls")
    for k, v in phases.items():
        print(f"  {k:8s} {v:7.1f}s ({100*v/total:.0f}%)")
    print(f"  assign   {assign_s:7.1f}s ({100*assign_s/total:.0f}%)")

    # device time of one score call, for the dispatch-gap estimate
    from devtime import device_time_ms
    sb = args.score_batch
    rc = jnp.asarray(np.ascontiguousarray(chain[learner.row_item_pos][:sb]), jnp.int32)
    sc = jnp.asarray(learner._seq_codes_at_level(level)[:sb], jnp.int32)
    ms = device_time_ms(lambda: learner._score_fn(learner.params, rc, sc), iters=10)
    print(f"one score batch ({sb} rows): {ms:.2f} ms device "
          f"vs {phases['h2d+fwd']/n_calls*1e3:.0f} ms blocked wall")


if __name__ == "__main__":
    main()
