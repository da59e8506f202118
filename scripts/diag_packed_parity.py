"""Diagnose packed-vs-classic divergence at depth: where and how big?"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dismember_tpu.index.arraytree import ArrayTree
    from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
    from dismember_tpu.models import din
    from dismember_tpu.retrieval.packed_beam import (
        make_packed_beam_fn, make_packed_tree,
    )
    from dismember_tpu.retrieval.tree_beam import make_beam_fn

    items = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ids = np.arange(1, items + 1)
    sorted_ids, codes = category_sorted_codes(ids, ids % 97)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t.bin")
        write_tree(p, sorted_ids, codes)
        tree = ArrayTree.from_file(p)

    num_index = (1 << (tree.max_level + 1)) - 1
    params = din.init_params(jax.random.PRNGKey(0), num_index, 16)
    rng = np.random.default_rng(0)
    seqs = jnp.asarray(tree.ids_to_codes(
        rng.integers(1, items + 1, size=(64, 10))))

    classic = make_beam_fn(
        din.forward, tree, beam=20,
        precompute=din.precompute_seq, apply=din.apply_with_ctx)
    packed = make_packed_tree(tree, params["embedding"], beam=20)
    packed_fn = make_packed_beam_fn(packed, din.precompute_seq, din.apply_from_emb)

    ids_c, sc_c = jax.device_get(classic(params, seqs))
    ids_p, sc_p = jax.device_get(packed_fn(params, seqs))

    row_mismatch = (ids_p != ids_c).any(axis=1)
    print("mismatching rows:", int(row_mismatch.sum()), "/", len(ids_c))
    # set-level comparison (ordering/tie differences vs real divergence)
    set_diff = 0
    for i in range(len(ids_c)):
        a = set(ids_c[i][ids_c[i] >= 0].tolist())
        b = set(ids_p[i][ids_p[i] >= 0].tolist())
        if a != b:
            set_diff += 1
            if set_diff <= 3:
                print(f"row {i}: only-classic={sorted(a - b)[:5]} "
                      f"only-packed={sorted(b - a)[:5]}")
    print("rows with different item SETS:", set_diff)

    alive = (ids_c >= 0) & (ids_p == ids_c)
    d = np.abs(sc_p[alive] - sc_c[alive])
    rel = d / np.maximum(np.abs(sc_c[alive]), 1e-30)
    print(json.dumps({"max_abs_diff": float(d.max()),
                      "max_rel_diff": float(rel.max()),
                      "median_score": float(np.median(np.abs(sc_c[alive])))}))


if __name__ == "__main__":
    main()
