"""Device-resident chunked training driver (TDMTrainer.train_resident).

Invariants: chunk-size choice is bit-invariant (the PRNG streams are
counter-derived from the global step, not from dispatch structure); the
ResidentWindows on-device sliding-window gather trains identically to the
same rows materialized as flat (seqs, targets); loss decreases; and a
kill + resume from a resident checkpoint is bit-compatible with an
uninterrupted run.
"""

import numpy as np
import pytest

from dismember_tpu.index.arraytree import ArrayTree
from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
from dismember_tpu.train.tdm import ResidentWindows, TDMTrainer

SEQ_LEN = 5


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(7)
    n_items, n_users, stream = 500, 120, 12
    ids = np.arange(1, n_items + 1)
    sorted_ids, codes = category_sorted_codes(ids, ids % 13)
    path = str(tmp_path_factory.mktemp("tree") / "t.bin")
    write_tree(path, sorted_ids, codes)
    tree = ArrayTree.from_file(path)
    items = rng.integers(1, n_items + 1, size=(n_users, stream))
    t_lo, t_hi = SEQ_LEN, stream
    n_win = t_hi - t_lo
    # flat expansion in the SAME row order as ResidentWindows (r = u*n_win+w)
    idx = np.arange(SEQ_LEN)[None, :] + np.arange(n_win)[:, None]
    seqs = items[:, idx].reshape(n_users * n_win, SEQ_LEN)
    targets = items[:, t_lo:t_hi].reshape(-1)
    win = ResidentWindows.from_items(tree, items, SEQ_LEN, t_lo, t_hi)
    return tree, seqs, targets, win


def _trainer(tree, **kw):
    kw.setdefault("sparse_embed_update", False)
    return TDMTrainer(
        tree=tree, model_type="din", embed_size=8, learning_rate=3e-3,
        total_batch_size=1024, seq_len=SEQ_LEN,
        layer_neg_counts="0,1,2,3,4,5,6,7,8,9", seed=5, **kw,
    )


def assert_params_equal(a, b):
    import jax

    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("sparse_kw", [
    {"sparse_embed_update": False},
    {"sparse_embed_update": True, "sparse_format": "pmv"},
], ids=["dense", "pmv"])
def test_chunk_size_bit_invariant(setup, sparse_kw):
    tree, seqs, targets, _ = setup
    a = _trainer(tree, **sparse_kw)
    a.train_resident((seqs, targets), iterations=20, chunk=20)
    b = _trainer(tree, **sparse_kw)
    b.train_resident((seqs, targets), iterations=20, chunk=3)
    a._sync_mirrors(); b._sync_mirrors()
    assert_params_equal(a.params, b.params)


def test_windows_equals_flat(setup):
    tree, seqs, targets, win = setup
    a = _trainer(tree)
    a.train_resident((seqs, targets), iterations=12, chunk=4)
    b = _trainer(tree)
    b.train_resident(win, iterations=12, chunk=4)
    assert_params_equal(a.params, b.params)


def test_loss_decreases_and_epoch_crossing(setup):
    tree, seqs, targets, _ = setup
    tr = _trainer(tree)
    n = len(targets)
    steps_per_epoch = n // tr.num_targets_per_batch
    iters = steps_per_epoch * 2 + 3  # cross two epoch boundaries
    logs = tr.train_resident(
        (seqs, targets), iterations=iters, chunk=16, progress_interval=5
    )
    assert logs[-1]["iteration"] == iters or logs[-1]["iteration"] <= iters
    assert logs[-1]["train_loss"] < logs[0]["train_loss"]


def test_resident_resume_bit_compatible(setup, tmp_path):
    tree, seqs, targets, _ = setup
    ckpt = str(tmp_path / "res_step")
    ref = _trainer(tree)
    ref.train_resident((seqs, targets), iterations=30, chunk=7)

    part = _trainer(tree)
    part.train_resident(
        (seqs, targets), iterations=22, chunk=7,
        checkpoint_path=ckpt, checkpoint_every=10,
    )  # checkpoints at 10, 20; steps 21-22 lost to the "kill"
    del part

    res = _trainer(tree)
    res.train_resident(
        (seqs, targets), iterations=30, chunk=7,
        checkpoint_path=ckpt, checkpoint_every=10,
    )
    assert_params_equal(ref.params, res.params)
