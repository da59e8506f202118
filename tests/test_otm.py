"""OTM tests: mapping/dataset invariants, pseudo targets, end-to-end train."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dismember_tpu.data.otm_dataset import (
    all_nodes_bitmap,
    build_otm_data,
    load_mapping,
    save_mapping,
    upper_log2,
)
from dismember_tpu.train.otm import OTMTrainer, _row_group_parents


@pytest.fixture(scope="module")
def otm_data(small_csv):
    return build_otm_data(
        small_csv, seq_len=10, min_seq_len=2, split_ratio=0.8,
        leaf_init_mode="random", label_num=5, seed=42,
    )


def test_mapping_invariants(otm_data):
    d = otm_data
    leaf_level = upper_log2(d.num_items)
    lo, hi = (1 << leaf_level) - 1, (1 << (leaf_level + 1)) - 1
    codes = np.asarray(sorted(d.code_to_item))
    assert len(codes) == d.num_items
    assert (codes >= lo).all() and (codes < hi).all()
    # bijection
    assert len(set(d.item_to_code.values())) == d.num_items
    for item, code in list(d.item_to_code.items())[:50]:
        assert d.code_to_item[code] == item


def test_sample_shapes(otm_data):
    d = otm_data
    assert d.train_seqs.shape[1] == 10
    assert d.train_labels.shape == (len(d.train_seqs), 5)
    # every valid label/seq entry is a mapped code or -1
    valid = d.train_labels[d.train_labels >= 0]
    assert np.isin(valid, np.asarray(sorted(d.code_to_item))).all()
    # each train sample has at least 1 label
    assert (d.train_labels[:, 0] >= 0).all()


def test_all_nodes_bitmap():
    codes = np.array([7, 8, 10])
    bm = all_nodes_bitmap(codes, 3)
    # ancestors of 7: 3, 1, 0; of 8: 3, 1, 0; of 10: 4, 1, 0
    for c in [7, 8, 10, 3, 4, 1, 0]:
        assert bm[c]
    assert not bm[2] and not bm[9]


def test_mapping_file_roundtrip(otm_data, tmp_path):
    p = str(tmp_path / "mapping.txt")
    save_mapping(p, otm_data.item_to_code)
    fwd, rev = load_mapping(p)
    assert fwd == otm_data.item_to_code


def test_row_group_parents():
    parents = jnp.array([[3, 3, 5, -1, -1]])
    values = jnp.array([[0.6, 0.7, 1.0, 0.0, 0.0]])
    ids, labels = jax.device_get(_row_group_parents(parents, values))
    got = {int(i): float(l) for i, l in zip(ids[0], labels[0]) if i >= 0}
    assert got == {3: 1.0, 5: 1.0}  # 0.6+0.7 clipped to 1.0

    parents = jnp.array([[4, 6, 4, -1, 8]])
    values = jnp.array([[0.2, 0.3, 0.4, 0.0, 0.1]])
    ids, labels = jax.device_get(_row_group_parents(parents, values))
    got = {int(i): round(float(l), 5) for i, l in zip(ids[0], labels[0]) if i >= 0}
    assert got == {4: np.float32(0.2 + 0.4).round(5), 6: 0.3, 8: np.float32(0.1).round(5)}


@pytest.fixture(scope="module")
def tiny_otm(small_csv):
    # tiny but real data; small beam keeps levels cheap
    return build_otm_data(
        small_csv, seq_len=10, min_seq_len=2, split_ratio=0.8,
        leaf_init_mode="category", label_num=3, seed=1,
    )


def test_pseudo_targets_structure(tiny_otm):
    d = tiny_otm
    tr = OTMTrainer(d, embed_size=8, beam_size=4, total_train_batch_size=64, seed=0)
    seqs = jnp.asarray(d.train_seqs[:6], jnp.int32)
    targets = jnp.asarray(d.train_labels[:6], jnp.int32)
    t_ids, t_labels = jax.device_get(tr._pseudo(tr.params, seqs, targets))
    assert t_ids.shape == (tr.n_levels, 6, 3)
    # bottom level (last index) must be the targets themselves
    np.testing.assert_array_equal(t_ids[-1], d.train_labels[:6])
    # level of each valid id must match its position in the list
    for li in range(tr.n_levels):
        level = tr.start_level + 1 + li
        ids = t_ids[li][t_ids[li] >= 0]
        levels = np.floor(np.log2(ids + 1)).astype(int)
        assert (levels == level).all()
        # labels in [0, 1]
        assert (t_labels[li] >= 0).all() and (t_labels[li] <= 1).all()
    # each valid target id at level l-1 is the parent of some id at level l
    for li in range(1, tr.n_levels):
        child_parents = set(((t_ids[li][t_ids[li] >= 0] - 1) >> 1).tolist())
        up = set(t_ids[li - 1][t_ids[li - 1] >= 0].tolist())
        assert up <= child_parents


def test_normal_targets(tiny_otm):
    d = tiny_otm
    tr = OTMTrainer(d, embed_size=8, beam_size=4, target_mode="normal")
    t_ids, t_labels = jax.device_get(tr._normal_targets(d.train_labels[:4]))
    np.testing.assert_array_equal(t_ids[-1], d.train_labels[:4])
    # ancestors chain up correctly
    expect = np.where(
        d.train_labels[:4] >= 0, (d.train_labels[:4] - 1) >> 1, -1
    )
    np.testing.assert_array_equal(t_ids[-2], expect)


def test_otm_end_to_end(tiny_otm):
    d = tiny_otm
    tr = OTMTrainer(
        d, embed_size=8, learning_rate=3e-3, total_train_batch_size=512,
        total_eval_batch_size=512, beam_size=10, topk=5, target_mode="pseudo", seed=3,
    )
    logs = tr.train(num_epochs=1)
    assert len(logs) == 1
    assert np.isfinite(logs[0]["eval_loss"])
    assert all(np.isfinite(x) for x in logs[0]["level_losses"])

    recs = tr.recommend_batch(d.eval_seqs[:4], topk=5)
    for r in recs:
        assert len(r) <= 5
        assert len(np.unique(r)) == len(r)
        # recommendations are raw item ids
        assert all(int(x) in d.item_to_code for x in r)


def test_one_user_sample_mode(small_csv):
    d = build_otm_data(
        small_csv, seq_len=10, min_seq_len=2, split_ratio=0.8,
        leaf_init_mode="random", label_num=5, seed=7, data_mode="one_user_sample",
    )
    # one sample per user across train+eval
    total = len(d.train_users) + len(d.eval_users)
    assert total == len(np.unique(np.concatenate([d.train_users, d.eval_users])))
    assert abs(len(d.train_users) - 0.8 * total) <= 1
    # sequences are exactly the first seq_len items (no padding for users with
    # > seq_len interactions)
    assert (d.train_seqs >= 0).all()


def test_otm_f64_precision_mode(tiny_otm):
    """Double-precision parity mode (reference otm LocalOptimizer.scala:18):
    params/losses run f64; pseudo targets on a pinned batch agree with f32."""
    d = tiny_otm
    kwargs = dict(
        embed_size=8, learning_rate=3e-3, total_train_batch_size=512,
        beam_size=4, topk=5, target_mode="pseudo", seed=0,
    )
    tr32 = OTMTrainer(d, **kwargs)
    tr64 = OTMTrainer(d, precision="f64", **kwargs)

    assert tr64.params["embedding"].dtype == jnp.float64
    assert tr32.params["embedding"].dtype == jnp.float32
    leaves = jax.tree.leaves(tr64.opt_state)
    assert any(getattr(l, "dtype", None) == jnp.float64 for l in leaves)

    seqs = jnp.asarray(d.train_seqs[:8], jnp.int32)
    targets = jnp.asarray(d.train_labels[:8], jnp.int32)
    t32_ids, t32_lab = jax.device_get(tr32._pseudo(tr32.params, seqs, targets))
    with tr64._ctx():
        t64_ids, t64_lab = jax.device_get(tr64._pseudo(tr64.params, seqs, targets))
    assert t64_lab.dtype == np.float64
    # same init (params differ only by dtype) -> identical pseudo targets
    np.testing.assert_array_equal(t64_ids, t32_ids)
    np.testing.assert_allclose(t64_lab, t32_lab.astype(np.float64), atol=1e-6)

    # one epoch trains finite and leaves dtype intact
    logs = tr64.train(num_epochs=1)
    assert np.isfinite(logs[-1]["level_losses"]).all()
    assert tr64.params["embedding"].dtype == jnp.float64
    # the x64 scope must not leak into the rest of the process
    assert jnp.asarray(np.zeros(2)).dtype == jnp.float32


def test_one_user_sample_keeps_full_labels(small_csv):
    """Variable-length target lists are kept in full (reference
    LocalDataSet.generateOneSamplePerUser keeps every future item as a
    label), and training pads per batch instead of truncating."""
    d = build_otm_data(
        small_csv, seq_len=10, min_seq_len=2, split_ratio=0.8,
        leaf_init_mode="random", label_num=3, seed=7,
        data_mode="one_user_sample",
    )
    counts = (d.train_labels >= 0).sum(axis=1)
    assert d.train_labels.shape[1] == counts.max()
    assert counts.max() > 3  # some user has more than label_num future items
    assert d.label_num == 3

    tr = OTMTrainer(
        d, embed_size=8, beam_size=4, total_train_batch_size=256,
        total_eval_batch_size=256, topk=5, seed=0,
    )
    assert tr.label_num == 3
    logs = tr.train(num_epochs=1)
    assert np.isfinite(logs[-1]["level_losses"]).all()


def test_sparse_level_steps_match_dense(tiny_otm):
    """Lazy row-sparse Adam inside the per-level scan
    (sparse_embed_update=True) vs the dense scan.  First batch: exact match
    (every row enters each level step with the same moments in both modes).
    Later batches: lazy semantics legitimately diverge — dense Adam nudges a
    node row along stale momentum at every one of the ~n_levels level steps
    between two touches, lazy leaves it in place (train/sparse_adam.py
    docstring) — so only closeness and loss improvement are asserted."""
    d = tiny_otm
    kwargs = dict(
        embed_size=8, learning_rate=3e-3, total_train_batch_size=256,
        beam_size=4, target_mode="pseudo", seed=11,
    )
    dense = OTMTrainer(d, sparse_embed_update=False, **kwargs)
    sparse = OTMTrainer(d, sparse_embed_update=True, **kwargs)
    assert sparse._sparse and not dense._sparse
    seqs = jnp.asarray(d.train_seqs[: dense.train_batch_size], jnp.int32)
    targets = jnp.asarray(d.train_labels[: dense.train_batch_size], jnp.int32)
    first_d = first_s = None
    for step in range(3):
        dense.params, dense.opt_state, loss_d = dense._train_batch(
            dense.params, dense.opt_state, seqs, targets
        )
        sparse.params, sparse.opt_state, loss_s = sparse._train_batch(
            sparse.params, sparse.opt_state, seqs, targets
        )
        rtol = 1e-4 if step == 0 else 5e-3
        np.testing.assert_allclose(
            np.asarray(loss_d), np.asarray(loss_s), rtol=rtol,
            err_msg=f"level losses diverged at batch {step}",
        )
        if step == 0:
            first_d = np.asarray(loss_d)
            first_s = np.asarray(loss_s)
    # both modes actually learn on the repeated batch
    assert float(np.asarray(loss_d)[-1]) < float(first_d[-1])
    assert float(np.asarray(loss_s)[-1]) < float(first_s[-1])
    # auto mode now picks the packed p|m|v format: params["embedding"] is a
    # mirror that raw-step driving leaves stale — sync before comparing
    sparse._sync_mirrors()
    # drift bound: a row misses at most (n_levels-1) momentum nudges per
    # batch, each |step| <= lr, so 3 batches stay well under 3*n_levels*lr
    # (row Adam math itself is exactness-tested in TDM's
    # test_sparse_step_matches_dense — same sparse_adam.apply_rows)
    for k in dense.params:
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(dense.params[k])[0]),
            np.asarray(jax.tree.leaves(sparse.params[k])[0]),
            atol=3 * dense.n_levels * 3e-3, err_msg=f"param {k} drifted",
        )


def test_sparse_auto_and_f64_guard(tiny_otm):
    """Auto mode stays dense at toy scale; explicit sparse + f64 is refused
    (sparse moments are f32-only)."""
    tr = OTMTrainer(tiny_otm, embed_size=8, beam_size=4)
    assert not tr._sparse
    with pytest.raises(ValueError, match="f64"):
        OTMTrainer(
            tiny_otm, embed_size=8, beam_size=4, precision="f64",
            sparse_embed_update=True,
        )


def test_pmv_matches_mv(tiny_otm):
    """The packed p|m|v scan (sparse_format="pmv") reproduces the mv scan:
    same gathered rows (pmv_gather is int32-contraction exact), same
    per-touched-row Adam math — only the storage layout differs (zero XLA
    table scatters, one Pallas row write per level).  Justified by
    measurement: the mv per-level scatter is 26.0 ms/batch = 40% of the
    10M-item whole-batch (scripts/profile_otm_scatter.py).

    First batch: tight parity (the two formats' compiled programs agree to
    ~1 ulp) incl. serving ids.  Later batches: the 1-ulp storage-format
    rounding can flip a near-tie in the frozen beam/pseudo-target decisions
    (observed at batch 2 on this data: 8 rows, 3e-6), so only closeness is
    asserted — same convention as test_sparse_level_steps_match_dense."""
    d = tiny_otm
    kwargs = dict(
        embed_size=8, learning_rate=3e-3, total_train_batch_size=256,
        beam_size=4, target_mode="pseudo", seed=11, sparse_embed_update=True,
    )
    mv = OTMTrainer(d, sparse_format="mv", **kwargs)
    pm = OTMTrainer(d, sparse_format="pmv", **kwargs)
    assert pm._pmv and not mv._pmv
    seqs = jnp.asarray(d.train_seqs[: mv.train_batch_size], jnp.int32)
    targets = jnp.asarray(d.train_labels[: mv.train_batch_size], jnp.int32)
    for step in range(3):
        mv.params, mv.opt_state, l_mv = mv._train_batch(
            mv.params, mv.opt_state, seqs, targets
        )
        pm.params, pm.opt_state, l_pm = pm._train_batch(
            pm.params, pm.opt_state, seqs, targets
        )
        np.testing.assert_allclose(
            np.asarray(l_pm), np.asarray(l_mv), rtol=1e-5,
            err_msg=f"level losses diverged at batch {step}",
        )
        if step == 0:
            assert pm._mirrors_stale
            pm._sync_mirrors()
            assert not pm._mirrors_stale
            np.testing.assert_allclose(
                np.asarray(pm.params["embedding"]),
                np.asarray(mv.params["embedding"]), rtol=1e-6, atol=1e-7,
            )
            # serving re-syncs lazily; matches the mv trainer's beam output
            pm._mirrors_stale = True  # simulate raw-step driving
            ids_pm, _ = pm.batch_beam_search(d.eval_seqs[:8])
            ids_mv, _ = mv.batch_beam_search(d.eval_seqs[:8])
            np.testing.assert_array_equal(ids_pm, ids_mv)
    pm._sync_mirrors()
    np.testing.assert_allclose(
        np.asarray(pm.params["embedding"]),
        np.asarray(mv.params["embedding"]), atol=1e-4,
    )
    for k in ("att_linear", "mlp1", "mlp2"):
        for kk, val in mv.params[k].items():
            np.testing.assert_allclose(
                np.asarray(pm.params[k][kk]), np.asarray(val),
                rtol=1e-4, atol=1e-6, err_msg=f"{k}/{kk}",
            )


def test_pmv_train_eval_end_to_end(tiny_otm):
    """train() + evaluate() through the pmv path (mirror sync at epoch
    boundaries), plus _adopt_mirrors on an external embedding assignment."""
    from dismember_tpu.train import sparse_adam

    tr = OTMTrainer(
        tiny_otm, embed_size=8, beam_size=4, total_train_batch_size=2048,
        sparse_embed_update=True, sparse_format="pmv", seed=7,
    )
    logs = tr.train(num_epochs=1)
    assert all(np.isfinite(x) for x in logs[0]["level_losses"])
    assert np.isfinite(logs[0]["recall"])
    # external load: new embedding pushed into the packed state's p lanes
    new_table = jnp.zeros_like(tr.params["embedding"]) + 0.25
    tr.params = dict(tr.params, embedding=new_table)
    tr._adopt_mirrors()
    got = sparse_adam.pmv_unpack(
        tr.opt_state[1], new_table.shape[0], tr.embed_size
    )
    np.testing.assert_allclose(np.asarray(got), 0.25)


def test_pmv_guards(tiny_otm):
    with pytest.raises(ValueError, match="unknown sparse_format"):
        OTMTrainer(tiny_otm, sparse_format="xyz")
    with pytest.raises(ValueError, match="packable"):
        OTMTrainer(
            tiny_otm, embed_size=48, beam_size=4,
            sparse_embed_update=True, sparse_format="pmv",
        )
