"""Step both beam bodies level-by-level (eager) and find the first level
where frontier/scores diverge, then dump that level's inputs."""

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
    from dismember_tpu.retrieval.packed_beam import make_packed_tree
    from dismember_tpu.retrieval.tree_beam import make_config, onehot_select

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
        rng.integers(1, items + 1, size=(4, 10))))

    cfg = make_config(tree, 20)
    packed = make_packed_tree(tree, params["embedding"], beam=20)
    pair_table = packed.pair_table
    n_pairs = pair_table.shape[0]
    e = 16
    b, width = 4, 40
    NEG = np.float32(-3.4e38)

    node_meta = jnp.asarray(tree.node_meta)
    max_code = tree.node_meta.shape[0] - 1
    ctx = din.precompute_seq(params, seqs)

    frontier = jnp.broadcast_to(
        jnp.asarray(cfg.start_codes_padded, jnp.int32), (b, width))
    valid = frontier >= 0
    scores = jnp.where(valid, 0.0, NEG).astype(jnp.float32)
    f_c, s_c = frontier, scores
    f_p, s_p = frontier, scores

    for level in range(cfg.max_level - cfg.start_level):
        # classic step
        top_scores, top_idx = jax.lax.top_k(s_c, 20)
        top_codes = onehot_select(f_c, top_idx)
        top_alive = top_scores > NEG / 2
        children = jnp.stack([2 * top_codes + 1, 2 * top_codes + 2],
                             axis=-1).reshape(b, width)
        child_alive = jnp.repeat(top_alive, 2, axis=1)
        meta = node_meta[jnp.clip(children, 0, max_code)]
        exists_c = (meta[..., 0] > 0) & child_alive
        logits_c = din.apply_with_ctx(
            params, jnp.where(exists_c, children, -1), ctx)
        f_c, s_c = children, jnp.where(exists_c, logits_c, NEG)

        # packed step
        top_scores_p, top_idx_p = jax.lax.top_k(s_p, 20)
        top_codes_p = onehot_select(f_p, top_idx_p)
        top_alive_p = top_scores_p > NEG / 2
        rows = pair_table[jnp.clip(top_codes_p, 0, n_pairs - 1)]
        emb = rows[..., : 2 * e].reshape(b, width, e)
        exists_p = rows[..., 2 * e: 2 * e + 2].reshape(b, width) > 0
        alive_p = exists_p & jnp.repeat(top_alive_p, 2, axis=1)
        children_p = jnp.stack(
            [2 * top_codes_p + 1, 2 * top_codes_p + 2], axis=-1
        ).reshape(b, width)
        logits_p = din.apply_from_emb(params, emb, ctx)
        f_p, s_p = children_p, jnp.where(alive_p, logits_p, NEG)

        fc, fp = np.asarray(f_c), np.asarray(f_p)
        sc, sp = np.asarray(s_c), np.asarray(s_p)
        same_f = (fc == fp).all()
        a = sc > NEG / 2
        ap = sp > NEG / 2
        same_mask = (a == ap).all()
        dmax = np.abs(sc[a & ap] - sp[a & ap]).max() if (a & ap).any() else 0
        print(f"level +{level + 1}: frontier_eq={bool(same_f)} "
              f"alive_eq={bool(same_mask)} max_score_diff={dmax:.3e}")
        if not (same_f and same_mask):
            i, j = np.argwhere(fc != fp)[0] if not same_f else \
                np.argwhere(a != ap)[0]
            print("  first diff at", i, j,
                  "classic code", fc[i, j], "packed code", fp[i, j],
                  "classic score", sc[i, j], "packed score", sp[i, j])
            # dump the top selections feeding this level
            print("  top_codes classic:", np.asarray(top_codes)[i][:10])
            print("  top_codes packed :", np.asarray(top_codes_p)[i][:10])
            print("  exists_c:", np.asarray(exists_c)[i][:12])
            print("  exists_p:", np.asarray(alive_p)[i][:12])
            break


if __name__ == "__main__":
    main()
