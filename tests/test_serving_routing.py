"""Deep-catalog serving ROUTING tests (Recommender.scala:40-107 parity
surface): above the packed-table threshold — tree.max_level >= 8 with at
least one scored level below the beam start — TDM/OTM serving must go
through the packed pair-table beam, never the replicated-node_meta classic
path (a [V, 2] narrow-table relayout costs ~3.6ms/dispatch at 2M rows,
CLAUDE.md).  These tests pin the routing so it can't silently regress.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dismember_tpu.core import mesh as meshlib
from dismember_tpu.index.arraytree import ArrayTree
from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
from dismember_tpu.models import din
from dismember_tpu.serving import TDMServing
from dismember_tpu.train import spmd


def _tree(n_items, tmp_path, name):
    ids = np.arange(1, n_items + 1)
    cats = np.zeros(n_items, dtype=np.int64)
    sorted_ids, codes = category_sorted_codes(ids, cats)
    path = str(tmp_path / name)
    write_tree(path, sorted_ids, codes)
    return ArrayTree.from_file(path)


@pytest.fixture(scope="module")
def deep_tree(tmp_path_factory):
    # 300 items -> leaf level 9 >= the packed threshold (max_level >= 8)
    return _tree(300, tmp_path_factory.mktemp("route"), "deep.bin")


@pytest.fixture(scope="module")
def toy_tree(tmp_path_factory):
    # 32 items -> leaf level 5 < threshold
    return _tree(32, tmp_path_factory.mktemp("route"), "toy.bin")


def _params(tree, e=16):
    num_index = (1 << (tree.max_level + 1)) - 1
    return din.init_params(jax.random.PRNGKey(0), num_index, e)


def test_tdm_serving_routes_packed_above_threshold(deep_tree, toy_tree):
    """TDMServing auto mode: max_level >= 8 (and >= 1 scored level below
    the start) builds the pair table and serves hybrid; toy catalogs keep
    the classic loop (no pair table)."""
    deep = TDMServing(
        _params(deep_tree), din.forward, deep_tree,
        precompute=din.precompute_seq, apply=din.apply_with_ctx,
        apply_emb=din.apply_from_emb, model_type="din",
    )
    assert deep.tree.max_level >= 8  # names the threshold
    assert deep._use_packed(20)
    deep._beam_fn(20)
    assert deep._pair_table is not None  # packed path materialized

    toy = TDMServing(
        _params(toy_tree), din.forward, toy_tree,
        precompute=din.precompute_seq, apply=din.apply_with_ctx,
        apply_emb=din.apply_from_emb, model_type="din",
    )
    assert toy.tree.max_level < 8
    assert not toy._use_packed(20)
    toy._beam_fn(20)
    assert toy._pair_table is None  # classic path, no table built


def test_otm_deep_serving_uses_packed(monkeypatch):
    """OTM serving (batch_beam_search) at depth must go through the packed
    pair-table loop, never the classic trajectory: the classic path is
    poisoned and serving must still work."""
    from dismember_tpu.data.otm_dataset import OTMData
    from dismember_tpu.train.otm import OTMTrainer

    rng = np.random.default_rng(0)
    n_items, leaf_level, L = 300, 9, 8
    leaf_lo = (1 << leaf_level) - 1
    item_to_code = {i + 1: leaf_lo + i for i in range(n_items)}
    n_nodes = (1 << (leaf_level + 1)) - 1
    all_nodes = np.zeros(n_nodes, bool)
    for c in item_to_code.values():
        while c >= 0:
            all_nodes[c] = True
            c = (c - 1) >> 1
    codes = np.asarray(list(item_to_code.values()))
    seqs = codes[rng.integers(0, n_items, size=(32, L))]
    data = OTMData(
        item_to_code=item_to_code,
        code_to_item={v: k for k, v in item_to_code.items()},
        leaf_level=leaf_level, num_items=n_items, all_nodes=all_nodes,
        train_seqs=seqs.astype(np.int64),
        train_labels=codes[rng.integers(0, n_items, size=(32, 2))].astype(
            np.int64
        ),
        train_users=np.zeros(32, np.int64),
        eval_seqs=seqs[:4].astype(np.int64),
        eval_labels=codes[rng.integers(0, n_items, size=(4, 2))].astype(
            np.int64
        ),
        eval_users=np.zeros(4, np.int64),
        user_consumed={}, label_num=2,
    )
    tr = OTMTrainer(data, embed_size=8, beam_size=4, seq_len=L)

    def poisoned(*a, **k):  # classic trajectory must not serve
        raise AssertionError("classic trajectory used for deep serving")

    monkeypatch.setattr(tr, "_beam_traj", poisoned)
    ids, scores = tr.batch_beam_search(data.eval_seqs)
    assert ids.shape == (4, 2 * tr.beam)
    assert np.isfinite(np.asarray(scores)).any()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_serving_routes_by_depth(deep_tree, toy_tree):
    """spmd.make_sharded_tree_serving_fn: deep catalogs route to
    make_sharded_packed_beam_fn (row-sharded pair table), toy catalogs to
    the classic replicated-node_meta path; the packed route's ids match the
    unsharded hybrid beam exactly."""
    from dismember_tpu.retrieval.packed_beam import (
        PackedTree,
        build_pair_table,
        make_hybrid_beam_fn,
    )
    from dismember_tpu.retrieval.tree_beam import make_config
    from dismember_tpu.train.tdm import packed_fns

    mesh = meshlib.make_mesh(n_data=2, n_model=4)
    assert spmd.is_deep_catalog(deep_tree, 20)
    assert not spmd.is_deep_catalog(toy_tree, 20)

    params = _params(deep_tree)
    fn, route = spmd.make_sharded_tree_serving_fn(
        "din", params, deep_tree, 20, mesh
    )
    assert route == "packed"
    rng = np.random.default_rng(1)
    seqs = jnp.asarray(
        deep_tree.ids_to_codes(rng.integers(1, 301, size=(8, 10)))
    )
    ids, scores = jax.device_get(fn(seqs))

    pre, app_emb = packed_fns("din")
    table = build_pair_table(
        params["embedding"], deep_tree.node_exists, deep_tree.node_id,
        deep_tree.total_codes,
    )
    packed = PackedTree(
        pair_table=table, embed_size=16, cfg=make_config(deep_tree, 20)
    )
    ref_fn = make_hybrid_beam_fn(packed, pre, app_emb)
    ref_ids, _ = jax.device_get(ref_fn(params, seqs))
    np.testing.assert_array_equal(ids, ref_ids)

    fn2, route2 = spmd.make_sharded_tree_serving_fn(
        "din", _params(toy_tree), toy_tree, 20, mesh
    )
    assert route2 == "classic"
    seqs2 = jnp.asarray(
        toy_tree.ids_to_codes(rng.integers(1, 33, size=(8, 10)))
    )
    ids2, _ = jax.device_get(fn2(seqs2))
    assert ids2.shape[0] == 8
