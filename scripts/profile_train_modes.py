"""Device-time (xplane) comparison of dense vs sparse TDM train steps.

Host wall-clock through the relay is unreliable (CLAUDE.md); this is the
calibration source for the sparse-vs-dense auto rule
(train/sparse_adam.sparse_worthwhile).

Usage: python scripts/profile_train_modes.py [--items 1000000]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from devtime import profile_ops


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1_000_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dismember_tpu.index.arraytree import ArrayTree
    from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
    from dismember_tpu.train.tdm import TDMTrainer

    n = args.items
    ids = np.arange(1, n + 1)
    sorted_ids, codes = category_sorted_codes(ids, ids % 97)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t.bin")
        write_tree(p, sorted_ids, codes)
        tree = ArrayTree.from_file(p)
    neg = ",".join(str(min(i, 2**i - 1)) for i in range(tree.max_level + 1))
    rng = np.random.default_rng(0)

    for mode in (False, True):
        tr = TDMTrainer(
            tree=tree, model_type="din", embed_size=16,
            layer_neg_counts=neg, seed=0, sparse_embed_update=mode,
        )
        b = tr.num_targets_per_batch
        seqs = rng.integers(1, n + 1, size=(b, 10))
        targets = rng.integers(1, n + 1, size=b)
        sc = jnp.asarray(tree.ids_to_codes(seqs))
        tc = jnp.asarray(tree.ids_to_codes(targets))
        key = jax.random.PRNGKey(1)

        def thunk():
            tr.params, tr.opt_state, loss = tr._train_step(
                tr.params, tr.opt_state, key, tc, sc
            )
            return loss

        durs = profile_ops(thunk, iters=5)
        ms = sum(v for k, v in durs.items() if "jit_" in k) / 5
        print(json.dumps({
            "items": n, "mode": "sparse" if mode else "dense",
            "device_ms_per_step": round(ms, 3),
            "touched_rows": b * (tr.sampler.unit + 10),
            "table_rows": int(tr.params["embedding"].shape[0]),
        }), flush=True)
        del tr


if __name__ == "__main__":
    main()
