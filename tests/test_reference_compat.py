"""Wire-format compatibility against artifacts written BY the reference.

The reference repo checks in fixture files produced by its own Scala/scalapb
writers (tree KV protobuf, DR ItemSet blob, OTM mapping txt).  Parsing them
with our codecs is the strongest possible byte-compatibility evidence — no
re-encoding by our own writer involved.  Skipped when the reference mount is
absent.
"""

import os

import numpy as np
import pytest

REF = "/root/reference/data"


def _need(path):
    if not os.path.exists(path):
        pytest.skip(f"{path} not available")
    return path


def test_read_reference_jtm_tree():
    path = _need(os.path.join(REF, "jtm", "example_tree.bin"))
    from dismember_tpu.index.arraytree import ArrayTree
    from dismember_tpu.index.tree_io import read_tree

    lt = read_tree(path)
    assert lt.max_level == 12
    assert len(lt.item_ids) == 3706
    tree = ArrayTree.from_loaded(lt)
    assert tree.num_items == 3706
    # every leaf at the bottom level; root exists; probabilities positive
    lo = (1 << tree.max_level) - 1
    assert (tree.item_codes >= lo).all()
    assert tree.node_exists[0]
    assert (tree.node_prob[tree.item_codes] > 0).all()
    # id -> code -> id round trip through our ArrayTree
    codes = tree.ids_to_codes(tree.item_ids)
    np.testing.assert_array_equal(tree.codes_to_item_ids(codes), tree.item_ids)
    # ancestors of every leaf exist (the reference writer emitted them)
    anc = tree.ancestor_matrix(tree.item_codes)
    assert tree.node_exists[anc].all()


def test_read_reference_jtm_tree_python_codec():
    """The pure-Python fallback decoder must agree with the native one."""
    path = _need(os.path.join(REF, "jtm", "example_tree.bin"))
    from dismember_tpu.data import native
    from dismember_tpu.index.tree_io import read_tree

    a = read_tree(path)
    old_lib, old_tried = native._lib, native._tried
    os.environ["DISMEMBER_NO_NATIVE"] = "1"
    native._lib, native._tried = None, True
    try:
        b = read_tree(path)
    finally:
        del os.environ["DISMEMBER_NO_NATIVE"]
        native._lib, native._tried = old_lib, old_tried
    np.testing.assert_array_equal(a.item_ids, b.item_ids)
    np.testing.assert_array_equal(a.leaf_codes, b.leaf_codes)
    np.testing.assert_array_equal(np.sort(a.node_codes), np.sort(b.node_codes))
    assert a.max_level == b.max_level


def test_read_reference_dr_mapping():
    path = _need(os.path.join(REF, "dr", "example_mapping.bin"))
    from dismember_tpu.index.paths import PathIndex

    idx, item_to_id = PathIndex.read(path, num_nodes=100)
    # J paths of D nodes per item; dense ids cover the item set
    assert idx.item_paths.ndim == 3
    n, j, d = idx.item_paths.shape
    assert n == len(item_to_id)
    assert j >= 1 and d >= 2
    assert (idx.item_paths >= 0).all()
    assert set(item_to_id.values()) == set(range(n))


def test_read_reference_otm_mapping():
    path = _need(os.path.join(REF, "otm", "example_mapping.txt"))
    from dismember_tpu.data.otm_dataset import load_mapping, upper_log2

    fwd, rev = load_mapping(path)
    assert len(fwd) > 1000
    # codes land on the bottom level of the implicit tree
    leaf_level = upper_log2(len(fwd))
    lo, hi = (1 << leaf_level) - 1, (1 << (leaf_level + 1)) - 1
    codes = np.asarray(list(fwd.values()))
    assert (codes >= lo).all() and (codes < hi).all()
    assert len(set(codes.tolist())) == len(codes)
