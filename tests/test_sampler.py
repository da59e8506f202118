"""Negative sampler tests: layout, positives, exclusion, without-replacement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dismember_tpu.data.ingest import read_csv, user_interactions, unique_items_with_category
from dismember_tpu.data.tdm_dataset import generate_split_samples
from dismember_tpu.index.arraytree import ArrayTree
from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
from dismember_tpu.train.sampler import TreeSampler, parse_layer_neg_counts

NEG_COUNTS = "0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,17,19,22,25,30,76,200"


@pytest.fixture(scope="module")
def tree(small_csv, tmp_path_factory):
    raw = read_csv(small_csv)
    inter = user_interactions(raw)
    samples = generate_split_samples(inter, 10, 2, 0.8)
    ids, cats = unique_items_with_category(raw)
    sorted_ids, codes = category_sorted_codes(ids, cats)
    path = str(tmp_path_factory.mktemp("tree") / "tree.bin")
    write_tree(path, sorted_ids, codes, stat=samples.stat)
    return ArrayTree.from_file(path)


def test_parse_neg_counts_validates():
    with pytest.raises(ValueError):
        parse_layer_neg_counts("0,5", 1)  # 5 >= 2^1
    counts = parse_layer_neg_counts("0,1,2,3", 3)
    assert counts == [0, 1, 2, 3]


def test_unit_layout(tree):
    sampler = TreeSampler.build(tree, NEG_COUNTS, start_level=1)
    counts = parse_layer_neg_counts(NEG_COUNTS, tree.max_level)
    expected_unit = sum(1 + counts[l] for l in range(1, tree.max_level + 1))
    assert sampler.unit == expected_unit
    assert sampler.unit_labels.sum() == tree.max_level  # one positive per level


def test_sample_positives_negatives(tree):
    sampler = TreeSampler.build(tree, NEG_COUNTS, start_level=1)
    key = jax.random.PRNGKey(0)
    target_codes = np.asarray(tree.item_codes[:16])
    codes, labels, weights = jax.device_get(
        sampler.sample(key, np.asarray(target_codes))
    )
    assert codes.shape == (16, sampler.unit)
    counts = sampler.neg_counts
    anc = tree.ancestor_matrix(target_codes)
    off = 0
    for level in range(1, tree.max_level + 1):
        # positive at this offset equals the ancestor at this level
        np.testing.assert_array_equal(codes[:, off], anc[:, level])
        assert (labels[:, off] == 1.0).all()
        neg = counts[level]
        if neg:
            negs = codes[:, off + 1 : off + 1 + neg]
            w = weights[:, off + 1 : off + 1 + neg]
            assert (labels[:, off + 1 : off + 1 + neg] == 0.0).all()
            for i in range(16):
                real = negs[i][w[i] > 0]
                # distinct, not the positive, existing at the level
                assert len(np.unique(real)) == len(real)
                assert anc[i, level] not in real
                lo, hi = (1 << level) - 1, (1 << (level + 1)) - 1
                assert ((real >= lo) & (real < hi)).all()
                assert tree.node_exists[real].all()
        off += 1 + neg
    assert off == sampler.unit


def test_sample_with_prob_prefers_heavy_nodes(tree):
    sampler = TreeSampler.build(tree, NEG_COUNTS, start_level=1, with_prob=True)
    key = jax.random.PRNGKey(1)
    target_codes = np.asarray(tree.item_codes[:8])
    codes, labels, weights = jax.device_get(sampler.sample(key, target_codes))
    assert codes.shape[1] == sampler.unit
    assert np.isfinite(codes[weights > 0]).all()


def test_rejection_sampler_matches_exact_semantics(tree):
    """Force the rejection path (max_exact_level=0 not allowed with prob;
    use tiny threshold) and check the same invariants as the exact path."""
    sampler = TreeSampler.build(tree, NEG_COUNTS, start_level=1, max_exact_level=4)
    assert not all(sampler.level_exact)  # deep levels use rejection
    key = jax.random.PRNGKey(3)
    target_codes = np.asarray(tree.item_codes[:16])
    codes, labels, weights = jax.device_get(sampler.sample(key, target_codes))
    anc = tree.ancestor_matrix(target_codes)
    off = 0
    for level in range(1, tree.max_level + 1):
        np.testing.assert_array_equal(codes[:, off], anc[:, level])
        neg = sampler.neg_counts[level]
        if neg:
            negs = codes[:, off + 1 : off + 1 + neg]
            w = weights[:, off + 1 : off + 1 + neg]
            for i in range(16):
                real = negs[i][w[i] > 0]
                assert len(np.unique(real)) == len(real)
                assert anc[i, level] not in real
                lo, hi = (1 << level) - 1, (1 << (level + 1)) - 1
                assert ((real >= lo) & (real < hi)).all()
                assert tree.node_exists[real].all()
        off += 1 + neg


def test_rejection_sampler_fill_rate(tree):
    """With 2x oversampling on dense levels nearly all slots should fill."""
    sampler = TreeSampler.build(tree, NEG_COUNTS, start_level=1, max_exact_level=4)
    key = jax.random.PRNGKey(4)
    target_codes = np.asarray(tree.item_codes[:256])
    _codes, _labels, weights = jax.device_get(sampler.sample(key, target_codes))
    assert weights.mean() > 0.9


def test_rejection_sampler_million_leaf_level():
    """Exactness/weight accounting at a 2^20-leaf bottom level (the regime
    where the rejection path actually engages; NegativeSampler.scala:116-158
    tolerance semantics: constrained draws first, existence-only fallback)."""
    import types

    level = 20
    lo, hi = (1 << level) - 1, (1 << (level + 1)) - 1
    rng = np.random.default_rng(0)
    n_items = 800_000  # occupancy ~0.76 — denser than any leaf-sunk tree's 0.5 min
    bottom = np.sort(rng.choice(np.arange(lo, hi), size=n_items, replace=False))
    node_exists = np.zeros(hi, dtype=bool)
    node_exists[bottom] = True

    from dismember_tpu.train.sampler import pack_exists_rows

    sampler = types.SimpleNamespace(
        oversample=2, tolerance=20, exists_rows=pack_exists_rows(node_exists)
    )
    neg = 200
    pos = jnp.asarray(bottom[rng.integers(0, n_items, size=64)].astype(np.int32))
    codes, weights = jax.device_get(
        TreeSampler._sample_rejection(sampler, jax.random.PRNGKey(1), pos, level, neg)
    )
    assert codes.shape == (64, neg)
    # dense level: every slot fills with weight 1
    np.testing.assert_array_equal(weights, 1.0)
    for i in range(64):
        row = codes[i]
        assert ((row >= lo) & (row < hi)).all()
        assert node_exists[row].all()
        assert len(np.unique(row)) == neg  # no duplicates
        assert int(pos[i]) not in row  # strict draws sufficed


def test_rejection_sampler_sparse_level_zero_weights():
    """When even relaxed draws cannot fill (pathologically sparse level),
    unfilled slots carry weight 0 and code -1 — loss-masked, not poisoned."""
    import types

    level = 20
    lo, hi = (1 << level) - 1, (1 << (level + 1)) - 1
    rng = np.random.default_rng(1)
    bottom = np.sort(rng.choice(np.arange(lo, hi), size=500, replace=False))
    node_exists = np.zeros(hi, dtype=bool)
    node_exists[bottom] = True

    from dismember_tpu.train.sampler import pack_exists_rows

    sampler = types.SimpleNamespace(
        oversample=2, tolerance=20, exists_rows=pack_exists_rows(node_exists)
    )
    neg = 50
    pos = jnp.asarray(bottom[:8].astype(np.int32))
    codes, weights = jax.device_get(
        TreeSampler._sample_rejection(sampler, jax.random.PRNGKey(2), pos, level, neg)
    )
    # occupancy 500/2^20: essentially no draw hits an existing node
    assert weights.mean() < 0.5
    assert (codes[weights == 0] == -1).all()
    filled = codes[weights == 1]
    assert node_exists[filled].all() if len(filled) else True
