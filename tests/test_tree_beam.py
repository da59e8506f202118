"""Batched tree beam-search tests: exactness vs exhaustive scoring."""

import jax.numpy as jnp
import numpy as np
import pytest

from dismember_tpu.data.ingest import read_csv, user_interactions, unique_items_with_category
from dismember_tpu.data.tdm_dataset import generate_split_samples
from dismember_tpu.index.arraytree import ArrayTree
from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
from dismember_tpu.models import din
from dismember_tpu.retrieval.tree_beam import filter_topk, make_beam_fn
import jax


@pytest.fixture(scope="module")
def small_tree(tmp_path_factory):
    # tiny synthetic tree: 16 items, ids 1..16
    ids = np.arange(1, 17)
    cats = np.zeros(16, dtype=np.int64)
    sorted_ids, codes = category_sorted_codes(ids, cats)
    path = str(tmp_path_factory.mktemp("bt") / "tree.bin")
    write_tree(path, sorted_ids, codes)
    return ArrayTree.from_file(path)


def test_full_beam_equals_exhaustive(small_tree):
    """With beam >= num leaves the beam search must return every leaf, and the
    scores must equal direct model scores on the leaf codes."""
    tree = small_tree
    key = jax.random.PRNGKey(0)
    num_index = (1 << (tree.max_level + 1)) - 1
    params = din.init_params(key, num_index, 8)
    # beam = 8 -> start level 3 (8 nodes), one expansion scores all 16 leaves
    beam_fn = make_beam_fn(din.forward, tree, beam=8)
    seqs = tree.ids_to_codes(np.array([[1, 2, 3, 0, 0]]))
    ids, scores = jax.device_get(beam_fn(params, jnp.asarray(seqs)))
    found = ids[0][ids[0] >= 0]
    assert set(found.tolist()) == set(tree.item_ids.tolist())

    direct = jax.device_get(
        din.forward(params, jnp.asarray(tree.item_codes)[None, :], jnp.asarray(seqs))
    )[0]
    # map: for each item, its direct score
    by_item = {int(i): float(s) for i, s in zip(tree.item_ids, direct)}
    for i, s in zip(ids[0], scores[0]):
        if i >= 0:
            np.testing.assert_allclose(s, by_item[int(i)], rtol=1e-5)


def test_greedy_property_small_beam(small_tree):
    """With beam=1 the search must follow the greedy argmax path."""
    tree = small_tree
    key = jax.random.PRNGKey(1)
    num_index = (1 << (tree.max_level + 1)) - 1
    params = din.init_params(key, num_index, 8)
    beam_fn = make_beam_fn(din.forward, tree, beam=1)
    seqs = tree.ids_to_codes(np.array([[4, 5, 0, 0, 0]]))
    ids, scores = jax.device_get(beam_fn(params, jnp.asarray(seqs)))
    valid = ids[0] >= 0
    assert valid.sum() == 2  # 2 leaves from the last expansion

    # greedy walk on host
    code = 0
    for level in range(tree.max_level):
        children = np.array([2 * code + 1, 2 * code + 2])
        ex = tree.node_exists[children]
        logits = np.array(
            jax.device_get(
                din.forward(params, jnp.asarray(children[None, :]), jnp.asarray(seqs))
            )[0]
        )
        logits[~ex] = -np.inf
        code = int(children[np.argmax(logits)])
    best_item = tree.node_id[code]
    got_best = ids[0][np.argmax(scores[0])]
    assert got_best == best_item


def test_filter_topk_removes_consumed():
    ids = np.array([[5, 3, 9, -1]])
    scores = np.array([[0.9, 0.8, 0.7, -3.4e38]])
    out = filter_topk(ids, scores, topk=2, consumed=[np.array([5])])
    np.testing.assert_array_equal(out[0], [3, 9])
