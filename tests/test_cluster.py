"""Tree-clustering tests (ClusterTreeSpec parity: synthetic random embeddings,
kmeans and spectral, resulting codes form a valid balanced tree)."""

import numpy as np
import pytest

from dismember_tpu.index.arraytree import ArrayTree
from dismember_tpu.index.cluster import (
    cluster_tree_from_embeddings,
    read_embeddings_csv,
    tree_cluster,
)
from dismember_tpu.index.tree_io import write_tree


def _check_codes(ids, codes, n):
    # all codes distinct, every item assigned
    assert len(codes) == n
    assert len(np.unique(codes)) == n
    # balanced: after sinking, max level = ceil(log2(n))
    max_level = int(np.ceil(np.log2(n)))
    levels = np.floor(np.log2(codes + 1)).astype(int)
    assert levels.max() <= max_level


@pytest.mark.parametrize("cluster_type", ["kmeans", "spectral"])
def test_cluster_synthetic(cluster_type):
    rng = np.random.default_rng(0)
    n, e = 100, 8
    ids = np.arange(1, n + 1)
    # two well-separated blobs: clustering should separate them near the root
    embeds = np.concatenate(
        [rng.normal(0, 0.5, size=(n // 2, e)), rng.normal(5, 0.5, size=(n // 2, e))]
    )
    out_ids, codes = tree_cluster(ids, embeds, cluster_iter=5, cluster_type=cluster_type)
    _check_codes(out_ids, codes, n)

    # the root split should mostly separate the two blobs
    first_child = np.floor(np.log2(codes + 1)).astype(int)  # level of each code
    # walk each code up to level 1
    level1 = codes.copy()
    for i in range(len(level1)):
        c = level1[i]
        while c > 2:
            c = (c - 1) >> 1
        level1[i] = c
    blob = np.array([0] * (n // 2) + [1] * (n // 2))
    # majority of each blob lands on one side
    side0 = level1[blob == 0]
    side1 = level1[blob == 1]
    assert (side0 == np.bincount(side0.astype(int)).argmax()).mean() > 0.9
    assert (side1 == np.bincount(side1.astype(int)).argmax()).mean() > 0.9
    assert np.bincount(side0.astype(int)).argmax() != np.bincount(side1.astype(int)).argmax()


def test_cluster_roundtrip_tree(tmp_path):
    rng = np.random.default_rng(1)
    n, e = 37, 4  # odd, non-power-of-two
    ids = np.arange(1, n + 1)
    embeds = rng.normal(size=(n, e))
    out_ids, codes = tree_cluster(ids, embeds, cluster_iter=3)
    path = str(tmp_path / "tree.bin")
    write_tree(path, out_ids, codes)
    tree = ArrayTree.from_file(path)
    assert tree.num_items == n
    assert set(tree.item_ids.tolist()) == set(ids.tolist())


def test_cluster_from_embedding_csv(tmp_path):
    rng = np.random.default_rng(2)
    n, e = 20, 4
    csv = tmp_path / "embed.csv"
    with open(csv, "w") as f:
        for i in range(1, n + 1):
            vec = ", ".join(f"{v:.6f}" for v in rng.normal(size=e))
            f.write(f"{i}, {vec}\n")
    ids, embeds = read_embeddings_csv(str(csv))
    assert embeds.shape == (n, e)
    out = tmp_path / "tree.bin"
    cluster_tree_from_embeddings(str(csv), str(out), cluster_iter=3)
    tree = ArrayTree.from_file(str(out))
    assert tree.num_items == n


def test_tiny_sets():
    ids = np.array([7, 8])
    embeds = np.array([[0.0, 0.0], [1.0, 1.0]])
    out_ids, codes = tree_cluster(ids, embeds)
    assert sorted(codes.tolist()) == [1, 2]


def test_cooccurrence_embeddings_group_structure():
    """Items from the same 'genre' co-occur in sessions; their features
    must be mutually closer than cross-genre, and the recursive clusterer
    over them must put same-genre items under common subtrees (the r4
    cluster-input fix; recipe provenance in the docstring)."""
    from dismember_tpu.index.cluster import (
        cooccurrence_embeddings,
        tree_cluster,
    )

    rng = np.random.default_rng(0)
    n_items, n_genres = 256, 8
    per = n_items // n_genres
    rows = 3000
    g = rng.integers(0, n_genres, size=rows)
    seqs = (g[:, None] * per + rng.integers(0, per, size=(rows, 6))).astype(
        np.int64
    )
    targets = (g * per + rng.integers(0, per, size=rows)).astype(np.int64)
    feats = cooccurrence_embeddings(seqs, targets, n_items, dim=16, n_iters=6)
    assert feats.shape == (n_items, 16)
    # NN genre consistency well above chance (1/8)
    sims = feats @ feats.T
    np.fill_diagonal(sims, -9)
    nn = np.argmax(sims, axis=1)
    cons = ((np.arange(n_items) // per) == (nn // per)).mean()
    assert cons > 0.6, cons
    # clustering the features groups genres: purity at the genre level
    ids = np.arange(1, n_items + 1)
    ids_out, codes = tree_cluster(ids, feats, cluster_iter=5)
    order = np.argsort(ids_out)
    c = np.asarray(codes, np.int64)[order]
    lvl = np.floor(np.log2(c + 1)).astype(np.int64)
    anc = ((c + 1) >> np.maximum(lvl - 3, 0)) - 1
    genre = np.arange(n_items) // per
    purity = sum(
        np.bincount(genre[anc == a]).max() for a in np.unique(anc)
    ) / n_items
    assert purity > 0.5, purity


def test_cooccurrence_embeddings_padding_and_unseen():
    """-1 pads are dropped; never-seen items keep unit-norm random init."""
    from dismember_tpu.index.cluster import cooccurrence_embeddings

    seqs = np.array([[0, 1, -1], [1, 2, -1]], np.int64)
    targets = np.array([2, 0], np.int64)
    feats = cooccurrence_embeddings(seqs, targets, 6, dim=8, n_iters=2)
    assert feats.shape == (6, 8)
    assert np.isfinite(feats).all()
    np.testing.assert_allclose(
        np.linalg.norm(feats, axis=1), 1.0, rtol=1e-5
    )
