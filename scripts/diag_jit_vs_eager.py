"""Compare jit-scan beam results vs the eager stepwise loop for both
variants, and measure level-1 score deltas between compilations."""

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
    from dismember_tpu.retrieval.tree_beam import make_beam_fn, make_config, onehot_select

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
        rng.integers(1, items + 1, size=(4, 10))))

    cfg = make_config(tree, 20)
    packed = make_packed_tree(tree, params["embedding"], beam=20)
    classic_fn = make_beam_fn(
        din.forward, tree, beam=20,
        precompute=din.precompute_seq, apply=din.apply_with_ctx)
    packed_fn = make_packed_beam_fn(packed, din.precompute_seq, din.apply_from_emb)

    # eager stepwise (ground truth, both variants agreed bitwise)
    node_meta = jnp.asarray(tree.node_meta)
    max_code = tree.node_meta.shape[0] - 1
    NEG = np.float32(-3.4e38)
    b, width = 4, 40
    ctx = din.precompute_seq(params, seqs)
    f = jnp.broadcast_to(jnp.asarray(cfg.start_codes_padded, jnp.int32), (b, width))
    s = jnp.where(f >= 0, 0.0, NEG).astype(jnp.float32)
    for _ in range(cfg.max_level - cfg.start_level):
        top_scores, top_idx = jax.lax.top_k(s, 20)
        top_codes = onehot_select(f, top_idx)
        top_alive = top_scores > NEG / 2
        children = jnp.stack([2 * top_codes + 1, 2 * top_codes + 2],
                             axis=-1).reshape(b, width)
        meta = node_meta[jnp.clip(children, 0, max_code)]
        exists = (meta[..., 0] > 0) & jnp.repeat(top_alive, 2, axis=1)
        logits = din.apply_with_ctx(params, jnp.where(exists, children, -1), ctx)
        f, s = children, jnp.where(exists, logits, NEG)
    ids_e = np.where(np.asarray(s) > NEG / 2,
                     np.asarray(node_meta)[np.clip(np.asarray(f), 0, max_code)][..., 1].astype(np.int64),
                     -1)

    ids_c, sc_c = jax.device_get(classic_fn(params, seqs))
    ids_p, sc_p = jax.device_get(packed_fn(params, seqs))
    print("classic-jit vs eager: same ids:", bool((ids_c == ids_e).all()))
    print("packed-jit  vs eager: same ids:", bool((ids_p == ids_e).all()))

    # level-1 logits from each jit path, by running 1-level trees... instead:
    # compare alive top-20 scores sorted, jit vs jit
    for name, sc, idd in [("classic", sc_c, ids_c), ("packed", sc_p, ids_p)]:
        alive = idd >= 0
        print(name, "top scores row0:", np.sort(sc[0][alive[0]])[-5:])


if __name__ == "__main__":
    main()
