"""Stride2 depth divergence: score sets equal (tie flips) or ids broken?"""

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
        make_stride2_beam_fn, make_subtree_tree,
    )

    items = 1_000_000
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

    packed = make_packed_tree(tree, params["embedding"], beam=20)
    packed_fn = make_packed_beam_fn(packed, din.precompute_seq, din.apply_from_emb)
    st = make_subtree_tree(tree, params["embedding"], beam=20)
    stride_fn = make_stride2_beam_fn(st, din.precompute_seq, din.apply_from_emb)

    ids_p, sc_p = jax.device_get(packed_fn(params, seqs))
    ids_s, sc_s = jax.device_get(stride_fn(params, seqs))

    rows_diff = int((ids_p != ids_s).any(axis=1).sum())
    print("rows with id diffs:", rows_diff, "/ 64")
    bogus = np.isin(ids_s, np.concatenate([tree.item_ids, [-1]])) == False  # noqa
    print("stride2 bogus ids:", int(bogus.sum()), np.unique(ids_s[bogus])[:10])
    for i in range(64):
        if (ids_p[i] != ids_s[i]).any():
            a = np.sort(sc_p[i][ids_p[i] >= 0])
            b = np.sort(sc_s[i][ids_s[i] >= 0])
            n = min(len(a), len(b))
            print(f"row {i}: alive {len(a)} vs {len(b)}, "
                  f"max sorted-score diff {np.abs(a[-n:] - b[-n:]).max():.3e}")
            da = set(ids_p[i].tolist()) - set(ids_s[i].tolist())
            db = set(ids_s[i].tolist()) - set(ids_p[i].tolist())
            print("  only-packed:", sorted(da)[:6], " only-stride:", sorted(db)[:6])
            if i > 10:
                break


if __name__ == "__main__":
    main()
