"""Tree building, persistence and array-tree invariants."""

import numpy as np
import pytest

from dismember_tpu.data.ingest import read_csv, user_interactions, unique_items_with_category
from dismember_tpu.data.tdm_dataset import generate_split_samples
from dismember_tpu.index import proto
from dismember_tpu.index.arraytree import ArrayTree
from dismember_tpu.index.tree_io import (
    ancestors_of,
    category_sorted_codes,
    read_tree,
    sink_leaf_codes,
    write_tree,
)


def test_proto_node_roundtrip():
    n = proto.Node(id=42, probality=3.5, leaf_cate_id=0, is_leaf=True, embed_vec=[1.0, 2.0])
    dec = proto.Node.decode(n.encode())
    assert dec.id == 42 and dec.is_leaf and dec.probality == 3.5
    assert dec.embed_vec == [1.0, 2.0]


def test_proto_kv_part_meta_roundtrip():
    pairs = [proto.IdCodePair(id=i, code=i * 2 + 1) for i in range(5)]
    part = proto.IdCodePart(part_id=b"Part_1", id_code_list=pairs)
    dec = proto.IdCodePart.decode(part.encode())
    assert [p.id for p in dec.id_code_list] == [0, 1, 2, 3, 4]
    meta = proto.TreeMeta(max_level=7, id_code_part=[b"Part_1"])
    dmeta = proto.TreeMeta.decode(meta.encode())
    assert dmeta.max_level == 7 and dmeta.id_code_part == [b"Part_1"]


def test_sink_leaf_codes():
    codes = np.array([0, 1, 4, 7])
    out = sink_leaf_codes(codes, 3)
    # all codes must land at the bottom level [7, 15)
    assert (out >= 7).all() and (out < 15).all()
    assert out[3] == 7  # already bottom


def test_ancestors():
    assert ancestors_of(7, 3) == [3, 1, 0]


def test_category_codes_are_permutation():
    ids = np.arange(100, 110)
    cats = np.array([1, 0, 1, 0, 2, 2, 1, 0, 2, 0])
    sorted_ids, codes = category_sorted_codes(ids, cats)
    assert len(np.unique(codes)) == len(codes)
    assert set(sorted_ids.tolist()) == set(ids.tolist())


@pytest.fixture(scope="module")
def built_tree(small_csv, tmp_path_factory):
    raw = read_csv(small_csv)
    inter = user_interactions(raw)
    samples = generate_split_samples(inter, 10, 2, 0.8)
    ids, cats = unique_items_with_category(raw)
    sorted_ids, codes = category_sorted_codes(ids, cats)
    path = str(tmp_path_factory.mktemp("tree") / "tree.bin")
    write_tree(path, sorted_ids, codes, stat=samples.stat)
    return path, sorted_ids, samples


def test_tree_roundtrip(built_tree):
    path, sorted_ids, _ = built_tree
    loaded = read_tree(path)
    assert set(loaded.item_ids.tolist()) == set(int(x) for x in sorted_ids)
    # all leaf codes at the bottom level
    lo = (1 << loaded.max_level) - 1
    hi = 2 * lo + 1
    assert (loaded.leaf_codes >= lo).all() and (loaded.leaf_codes < hi).all()
    # codes are unique
    assert len(np.unique(loaded.leaf_codes)) == len(loaded.leaf_codes)


def test_array_tree_invariants(built_tree):
    path, _, samples = built_tree
    tree = ArrayTree.from_file(path)
    # root exists; every leaf's ancestors exist
    assert tree.node_exists[0]
    anc = tree.ancestor_matrix(tree.item_codes)
    for level in range(tree.max_level + 1):
        codes = anc[:, level]
        assert tree.node_exists[codes].all()
    # id -> code -> id round trip
    codes = tree.ids_to_codes(tree.item_ids)
    np.testing.assert_array_equal(tree.codes_to_item_ids(codes), tree.item_ids)
    # padding maps to -1
    assert tree.ids_to_codes(np.array([0]))[0] == -1
    # non-leaf pseudo ids map back to their codes
    pseudo = np.array([tree.non_leaf_offset + 3])
    assert tree.ids_to_codes(pseudo)[0] == 3
    # node probabilities: leaf prob = stat count where present
    stat = samples.stat
    for iid, code in zip(tree.item_ids[:50], tree.item_codes[:50]):
        expected = float(stat.get(int(iid), 1.0))
        assert tree.node_prob[code] == pytest.approx(expected)
    # parent prob >= child prob for stat-ed subtrees (occurrence sums)
    parents = (tree.item_codes - 1) >> 1
    assert (tree.node_prob[parents] >= tree.node_prob[tree.item_codes] - 1e-5).all()


def test_level_codes_partition(built_tree):
    path, _, _ = built_tree
    tree = ArrayTree.from_file(path)
    total = sum(len(c) for c in tree.level_codes)
    assert total == int(tree.node_exists.sum())
    assert len(tree.level_codes[0]) == 1  # root only
