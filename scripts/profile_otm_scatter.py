"""OTM deep-catalog sparse step: what does the per-level table scatter cost?

VERDICT r2 #9 follow-up: TDM moved to the pmv packed format (zero XLA table
scatters); OTM's sparse level step (train/otm.py _sparse_level_step) still
pays one XLA scatter-add into the [V, E] node table per level inside its
lax.scan.  Porting OTM to pmv would thread the packed table through the
pseudo-target and beam-trajectory forwards too (they run in the SAME jit as
the scan, so a [V, E] mirror cannot help) — a large refactor.  This script
measures whether it could pay: per-op xplane breakdown of the OTM 10M-item
whole-batch dispatch, scatter ops vs total.

Usage: python scripts/profile_otm_scatter.py [--items 10000000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=10_000_000)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import jax.numpy as jnp

    from devtime import profile_ops
    from dismember_tpu.data.otm_dataset import OTMData
    from dismember_tpu.train.otm import OTMTrainer

    n = args.items
    leaf_level = int(np.ceil(np.log2(n)))
    leaf_lo = (1 << leaf_level) - 1
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    n_nodes = (1 << (leaf_level + 1)) - 1
    # membership mask: all ancestors of occupied leaves (vector sweep)
    all_nodes = np.zeros(n_nodes, bool)
    occ = leaf_lo + perm
    all_nodes[occ] = True
    cur = occ
    for _ in range(leaf_level):
        cur = np.unique((cur - 1) >> 1)
        all_nodes[cur] = True

    item_ids = np.arange(1, n + 1)
    codes = leaf_lo + perm
    L = 10
    n_rows = 4096
    seqs = codes[rng.integers(0, n, size=(n_rows, L))]
    labels = codes[rng.integers(0, n, size=(n_rows, 2))]
    data = OTMData(
        item_to_code=dict(zip(item_ids[:1].tolist(), codes[:1].tolist())),
        code_to_item={},
        leaf_level=leaf_level,
        num_items=n,
        all_nodes=all_nodes,
        train_seqs=seqs.astype(np.int64),
        train_labels=labels.astype(np.int64),
        train_users=np.zeros(n_rows, np.int64),
        eval_seqs=seqs[:4].astype(np.int64),
        eval_labels=labels[:4].astype(np.int64),
        eval_users=np.zeros(4, np.int64),
        user_consumed={},
        label_num=2,
    )
    tr = OTMTrainer(
        data, embed_size=16, beam_size=20,
        total_train_batch_size=args.batch * 40, seq_len=L,
        sparse_embed_update=True,
    )
    print(f"table rows: {tr.params['embedding'].shape[0]:,}  sparse={tr._sparse}")
    sj = jnp.asarray(seqs[: args.batch], jnp.int32)
    tj = jnp.asarray(labels[: args.batch], jnp.int32)

    iters = 5
    state = [(tr.params, tr.opt_state)]

    def thunk():
        p, o = state[0]
        p, o, losses = tr._train_batch(p, o, sj, tj)
        state[0] = (p, o)
        return losses

    durs = profile_ops(thunk, iters)
    total = sum(v for k, v in durs.items() if "jit_" in k) / iters
    print(f"whole-batch device time: {total:.1f} ms")

    def group(pred, label):
        ms = sum(v for k, v in durs.items() if pred(k.lower())) / iters
        print(f"{label:<28s} {ms:8.2f} ms ({100 * ms / total:5.1f}%)")
        return ms

    group(lambda k: "scatter" in k, "scatter ops")
    group(lambda k: "gather" in k, "gather ops")
    group(lambda k: "dynamic-update-slice" in k, "dynamic-update-slice ops")
    group(lambda k: "copy" in k, "copy ops")

    import json

    with open("data/r4/otm_scatter_ops.json", "w") as f:
        json.dump(
            {k: v / iters for k, v in sorted(durs.items(), key=lambda kv: -kv[1])},
            f, indent=1,
        )
    print("full op dump -> data/r4/otm_scatter_ops.json")
    shown = 0
    for name, ms in sorted(durs.items(), key=lambda kv: -kv[1]):
        if "copy-start" in name or "copy-done" in name:
            continue
        print(f"  {ms/iters:8.3f} ms  {name[:100]}")
        shown += 1
        if shown >= 25:
            break


if __name__ == "__main__":
    main()
