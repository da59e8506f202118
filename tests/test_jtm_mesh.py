"""Mesh-sharded JTM tree learning: the scoring pass (the whole sweep cost,
jtm/.../optim/TreeLearning.scala:152-174) over the ('data','model') mesh
must reproduce the single-chip sweep bit-for-bit — the FIFO-pipelined
accumulation order is unchanged and the -1 pad rows are dropped on drain.
"""

import jax
import numpy as np
import pytest

from dismember_tpu.core import mesh as meshlib
from dismember_tpu.data.ingest import (
    read_csv,
    unique_items_with_category,
    user_interactions,
)
from dismember_tpu.data.tdm_dataset import generate_split_samples
from dismember_tpu.index.arraytree import ArrayTree
from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
from dismember_tpu.models import din
from dismember_tpu.train.jtm import TreeLearner, otm_tree_learner

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def setup(small_csv, tmp_path_factory):
    raw = read_csv(small_csv)
    inter = user_interactions(raw)
    samples = generate_split_samples(inter, 10, 2, 0.8)
    ids, cats = unique_items_with_category(raw)
    keep = set(ids[:120].tolist())
    mask = np.isin(samples.train_targets, list(keep))
    train_seqs = samples.train_seqs[mask]
    train_targets = samples.train_targets[mask]
    sorted_ids, codes = category_sorted_codes(ids[:120], cats[:120])
    path = str(tmp_path_factory.mktemp("jtm_mesh") / "tree.bin")
    write_tree(path, sorted_ids, codes, stat=samples.stat)
    tree = ArrayTree.from_file(path)
    num_index = (1 << (tree.max_level + 1)) - 1
    params = din.init_params(jax.random.PRNGKey(0), num_index, 8)
    return tree, params, train_seqs, train_targets


def test_mesh_sweep_matches_single_chip(setup):
    """Full optimize() parity: identical projection.  score_batch_rows=61
    forces ragged tail batches (61 % n_data != 0), exercising the -1 pad
    rows + drop-on-drain path."""
    tree, params, train_seqs, train_targets = setup
    mesh = meshlib.make_mesh(n_data=2, n_model=4)
    kw = dict(
        tree=tree, params=params, forward=din.forward,
        train_seqs=train_seqs, train_targets=train_targets, gap=2,
    )
    # host mode on the ref: the mesh path uses host-FIFO accumulation, so
    # the bit-parity claim is about sharding, not the accumulation format
    ref = TreeLearner(weights_mode="host", **kw)
    sh = TreeLearner(mesh=mesh, score_batch_rows=61, **kw)
    assert sh._score_params["embedding"].sharding.spec == (
        jax.sharding.PartitionSpec(meshlib.MODEL_AXIS, None)
    )
    proj_ref = ref.optimize()
    proj_sh = sh.optimize()
    assert proj_sh == proj_ref


def test_mesh_weights_bitwise(setup):
    """compute_weights on the mesh == single chip down to the accumulated
    f64 weight matrix (FIFO drain order preserved)."""
    tree, params, train_seqs, train_targets = setup
    mesh = meshlib.make_mesh(n_data=4, n_model=2)
    kw = dict(
        tree=tree, params=params, forward=din.forward,
        train_seqs=train_seqs, train_targets=train_targets, gap=2,
        hierarchical=True, min_level=2,
    )
    ref = TreeLearner(weights_mode="host", **kw)
    sh = TreeLearner(mesh=mesh, score_batch_rows=100, **kw)
    proj = np.zeros(len(ref.items), dtype=np.int64)
    w_ref = ref.compute_weights(proj, 0, 2)
    w_sh = sh.compute_weights(proj, 0, 2)
    np.testing.assert_allclose(w_sh, w_ref, rtol=1e-6, atol=1e-7)


def test_otm_learner_mesh(setup):
    """OTM tree construction through the same sharded scoring pass."""
    tree, params, train_seqs, train_targets = setup
    mesh = meshlib.make_mesh(n_data=2, n_model=4)
    items = np.asarray(tree.item_ids)
    item_to_code = {
        int(i): int(c)
        for i, c in zip(items, np.asarray(tree.item_codes))
    }
    seq_codes = tree.ids_to_codes(train_seqs[:200])
    label_codes = tree.ids_to_codes(train_targets[:200][:, None])
    kw = dict(
        params=params, forward=din.forward, item_to_code=item_to_code,
        train_seqs_codes=seq_codes, train_labels_codes=label_codes, gap=2,
    )
    ref = otm_tree_learner(**kw)
    sh = otm_tree_learner(mesh=mesh, **kw)
    sh.score_batch_rows = 37
    assert ref.optimize() == sh.optimize()
