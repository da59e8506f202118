"""Within-stage step-level checkpoint/resume (train/step_resume.py).

Protocol per trainer: run an uninterrupted reference train; then run a
partial train with periodic snapshots, throw the trainer away (the "kill"),
build a FRESH trainer with identical constructor args, and resume from the
last snapshot for the remaining budget.  The resumed trainer's parameters
must be BIT-IDENTICAL to the uninterrupted run's — the snapshot carries the
optimizer state, the JAX PRNG chain, and the numpy permutation cursor
(rng-state-before-perm + position), so the replay is exact.

The reference's OptimMethod.save (scalann OptimMethod.scala:28-33) snapshots
mid-run but has no resume path; this is the beat-it half of VERDICT r4 #4.
"""

import jax
import numpy as np
import pytest

from dismember_tpu.data.ingest import (
    read_csv,
    unique_items_with_category,
    user_interactions,
)
from dismember_tpu.data.tdm_dataset import generate_split_samples
from dismember_tpu.index.arraytree import ArrayTree
from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
from dismember_tpu.train import step_resume
from dismember_tpu.train.tdm import TDMTrainer

NEG_COUNTS = "0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,17,19,22,25,30,76,200"


def assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_load_roundtrip(tmp_path):
    tree = {"a": np.arange(6, dtype=np.float32), "b": {"c": np.eye(3)}}
    meta = {"iteration": 7, "rng": {"state": 2**80, "inc": 3}}
    p = str(tmp_path / "snap")
    step_resume.save_step_state(p, tree, meta)
    got, got_meta = step_resume.load_step_state(p, tree)
    assert_trees_equal(tree, got)
    assert got_meta == meta
    assert step_resume.load_step_state(str(tmp_path / "absent"), tree) is None


@pytest.fixture(scope="module")
def tdm_setup(small_csv, tmp_path_factory):
    raw = read_csv(small_csv)
    samples = generate_split_samples(user_interactions(raw), 10, 2, 0.8)
    ids, cats = unique_items_with_category(raw)
    sorted_ids, codes = category_sorted_codes(ids, cats)
    path = str(tmp_path_factory.mktemp("tree") / "tree.bin")
    write_tree(path, sorted_ids, codes, stat=samples.stat)
    tree = ArrayTree.from_file(path)
    # tiny train subset so 40 iterations cross several epoch (perm) refills,
    # exercising the rng-state-before-perm restore, not just the position
    return tree, samples.train_seqs[:30], samples.train_targets[:30]


def _tdm(tree, **kw):
    return TDMTrainer(
        tree=tree, model_type="din", embed_size=8, learning_rate=3e-3,
        total_batch_size=2048, layer_neg_counts=NEG_COUNTS, seed=11, **kw,
    )


@pytest.mark.parametrize("sparse_kw", [
    {"sparse_embed_update": False},
    {"sparse_embed_update": True, "sparse_format": "pmv"},
], ids=["dense", "pmv"])
def test_tdm_resume_bit_compatible(tdm_setup, tmp_path, sparse_kw):
    tree, seqs, targets = tdm_setup
    ckpt = str(tmp_path / "tdm_step")

    ref = _tdm(tree, **sparse_kw)
    ref.train(seqs, targets, iterations=40, progress_interval=100)

    part = _tdm(tree, **sparse_kw)
    part.train(
        seqs, targets, iterations=25, progress_interval=100,
        checkpoint_path=ckpt, checkpoint_every=10,
    )  # snapshots at 10 and 20; iterations 21-25 are "lost" to the kill
    del part

    res = _tdm(tree, **sparse_kw)
    res.train(
        seqs, targets, iterations=40, progress_interval=100,
        checkpoint_path=ckpt, checkpoint_every=10,
    )
    ref._sync_mirrors()
    res._sync_mirrors()
    assert_trees_equal(ref.params, res.params)


def test_otm_resume_bit_compatible(small_csv, tmp_path):
    from dismember_tpu.data.otm_dataset import build_otm_data
    from dismember_tpu.train.otm import OTMTrainer

    d = build_otm_data(
        small_csv, seq_len=10, min_seq_len=2, split_ratio=0.8,
        leaf_init_mode="category", label_num=3, seed=1,
    )
    d.train_seqs = d.train_seqs[:96]
    d.train_labels = d.train_labels[:96]
    d.train_users = d.train_users[:96]
    kw = dict(embed_size=8, beam_size=4, total_train_batch_size=64, seed=0)
    ckpt = str(tmp_path / "otm_step")

    ref = OTMTrainer(d, **kw)
    ref.train(num_epochs=2)

    part = OTMTrainer(d, **kw)
    part.train(num_epochs=1, checkpoint_path=ckpt, checkpoint_every=2)
    del part

    res = OTMTrainer(d, **kw)
    res.train(num_epochs=2, checkpoint_path=ckpt, checkpoint_every=2)
    ref._sync_mirrors()
    res._sync_mirrors()
    assert_trees_equal(ref.params, res.params)


def test_dr_resume_bit_compatible(small_csv, tmp_path):
    from dismember_tpu.data.dr_dataset import build_dr_data
    from dismember_tpu.train.dr import DRTrainer

    d = build_dr_data(small_csv, seq_len=10, min_seq_len=2, split_ratio=0.8)
    d.train_seqs = d.train_seqs[:256]
    d.train_targets = d.train_targets[:256]
    d.eval_seqs = d.eval_seqs[:16]
    d.eval_labels = d.eval_labels[:16]
    d.eval_users = d.eval_users[:16]
    kw = dict(
        num_layers=3, num_nodes=20, num_paths_per_item=2, embed_size=8,
        train_batch_size=128, num_sampled=4, seed=3,
    )
    ckpt = str(tmp_path / "dr_step")

    ref = DRTrainer(d, **kw)
    ref.train(num_epochs=2)

    part = DRTrainer(d, **kw)
    part.train(num_epochs=1, checkpoint_path=ckpt, checkpoint_every=1)
    del part

    res = DRTrainer(d, **kw)
    res.train(num_epochs=2, checkpoint_path=ckpt, checkpoint_every=1)
    ref._sync_mirrors()
    res._sync_mirrors()
    assert_trees_equal(ref.layer_params, res.layer_params)
    assert_trees_equal(ref.rerank_params, res.rerank_params)
