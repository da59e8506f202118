"""Deep Retrieval tests: dataset, path index, models, beam search, training,
coordinate descent (DeepRetrievalSpec / CoordinateDescentSpec parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dismember_tpu.data.dr_dataset import build_dr_data
from dismember_tpu.index.paths import PathIndex
from dismember_tpu.models import dr_models
from dismember_tpu.retrieval.path_beam import path_beam_search
from dismember_tpu.train.dr import DRTrainer
from dismember_tpu.train.dr_coordinate import coordinate_descent


@pytest.fixture(scope="module")
def dr_data(small_csv):
    return build_dr_data(small_csv, seq_len=10, min_seq_len=2, split_ratio=0.8)


def test_dataset_invariants(dr_data):
    d = dr_data
    assert d.num_items == len(d.item_to_id)
    # dense ids are 0..num_items-1
    assert set(d.item_to_id.values()) == set(range(d.num_items))
    # all targets valid dense ids
    assert (d.train_targets >= 0).all() and (d.train_targets < d.num_items).all()
    # seq entries are dense ids or -1
    assert (d.train_seqs >= -1).all() and (d.train_seqs < d.num_items).all()
    # eval labels exclude consumed
    for i in range(min(20, len(d.eval_users))):
        u = int(d.eval_users[i])
        labels = d.eval_labels[i]
        labels = labels[labels >= 0]
        assert not (set(labels.tolist()) & set(d.user_consumed[u].tolist()))


def test_path_index_roundtrip(tmp_path, dr_data):
    idx = PathIndex.random_init(dr_data.num_items, 3, 50, 2, seed=1)
    p = str(tmp_path / "mapping.bin")
    idx.write(p, dr_data.item_to_id)
    idx2, mapping2 = PathIndex.read(p, num_nodes=50)
    np.testing.assert_array_equal(idx.item_paths, idx2.item_paths)
    assert mapping2 == dr_data.item_to_id
    # each item has exactly J paths of D nodes (CoordinateDescentSpec parity)
    assert idx2.item_paths.shape == (dr_data.num_items, 2, 3)


def test_inverted_mapping():
    idx = PathIndex(
        item_paths=np.array(
            [[[0, 1], [2, 3]], [[0, 1], [4, 5]]], dtype=np.int32
        ),
        num_nodes=6,
    )
    p2i = idx.path_to_items()
    assert p2i[(0, 1)] == [0, 1]
    assert p2i[(2, 3)] == [0]
    assert p2i[(4, 5)] == [1]


def test_layer_forward_matches_flat_linear():
    """Split seq/prefix matmul must equal one flat Linear over the concat."""
    key = jax.random.PRNGKey(0)
    num_items, k_nodes, d_layers, l, e = 7, 4, 3, 5, 8
    params = dr_models.init_layer_params(key, num_items, k_nodes, d_layers, l, e)
    seqs = jnp.array([[0, 1, 2, -1, -1]])
    paths = jnp.array([[[1, 2, 3], [0, 0, 1]]])  # [1, 2, 3]
    logits = dr_models.layer_forward_training(params, seqs, paths, num_items, k_nodes)
    assert [x.shape for x in logits] == [(1, 2, k_nodes)] * d_layers

    # hand-compute layer 2 for path 0: input = seq ++ [p0+off0, p1+off1]
    table = params["embedding"]
    from dismember_tpu.models.embedding import embed_lookup

    seq_e = embed_lookup(table, seqs[0]).reshape(-1)
    prefix_ids = jnp.array([1 + num_items + 0 * k_nodes, 2 + num_items + 1 * k_nodes])
    pre_e = table[prefix_ids].reshape(-1)
    flat = jnp.concatenate([seq_e, pre_e])
    w = params["heads"][2]["weight"]
    expected = flat @ w.T + params["heads"][2]["bias"]
    np.testing.assert_allclose(
        np.asarray(logits[2][0, 0]), np.asarray(expected), rtol=1e-5
    )


def test_path_beam_search_exact_small():
    """Beam >= K^D must enumerate all paths with exact joint probabilities."""
    key = jax.random.PRNGKey(1)
    num_items, k_nodes, d_layers, l, e = 5, 3, 2, 4, 8
    params = dr_models.init_layer_params(key, num_items, k_nodes, d_layers, l, e)
    seqs = jnp.array([[0, 1, -1, -1]])
    paths, probs = jax.device_get(
        path_beam_search(params, seqs, 9, num_items, k_nodes, d_layers)
    )
    # all 9 paths present, probs sum to 1
    keys = {tuple(p) for p in paths[0]}
    assert len(keys) == 9
    np.testing.assert_allclose(probs[0].sum(), 1.0, rtol=1e-5)
    # probs sorted descending
    assert (np.diff(probs[0]) <= 1e-7).all()


def test_sampled_softmax_excludes_positive():
    key = jax.random.PRNGKey(2)
    params = dr_models.init_rerank_params(key, num_items=10, seq_len=4, embed_size=8)
    vecs = jnp.ones((3, 8))
    labels = jnp.array([1, 5, 9])
    loss = dr_models.sampled_softmax_loss(params, vecs, labels, key, num_sampled=3)
    assert np.isfinite(float(loss))
    full = dr_models.full_softmax_loss(params, vecs, labels)
    assert np.isfinite(float(full))


def test_dr_end_to_end(dr_data):
    tr = DRTrainer(
        dr_data,
        num_layers=3,
        num_nodes=20,
        num_paths_per_item=2,
        embed_size=8,
        learning_rate=1e-2,
        train_batch_size=1024,
        eval_batch_size=1024,
        beam_size=10,
        topk=5,
        seed=0,
    )
    results = tr.train(num_epochs=5)
    assert len(results) == 5
    # train loss decreases across epochs (the reference asserts this on eval
    # loss with its full-data config, DeepRetrievalSpec.scala:100-107; the
    # shrunken test dataset overfits, so assert on the train losses here)
    tl = tr.train_loss_log
    assert sum(tl[-1]["layer_loss"]) < sum(tl[0]["layer_loss"])
    assert tl[-1]["rerank_loss"] < tl[0]["rerank_loss"]
    assert all(np.isfinite(sum(r.layer_loss)) and np.isfinite(r.rerank_loss) for r in results)

    recs = tr.recommend_batch(dr_data.eval_seqs[:4], topk=5)
    for r in recs:
        assert len(r) <= 5
        assert len(np.unique(r)) == len(r)


def test_coordinate_descent(dr_data):
    tr = DRTrainer(
        dr_data, num_layers=3, num_nodes=20, num_paths_per_item=2, embed_size=8,
        train_batch_size=1024, beam_size=10, seed=0,
    )
    tr.train(num_epochs=1)
    sub = slice(0, 2000)
    new_index = coordinate_descent(
        tr,
        dr_data.train_seqs[sub],
        dr_data.train_targets[sub],
        num_iteration=1,
        num_candidate_path=10,
        batch_size=1024,
        mode="batch",
    )
    # mapping keys == item set, each item has exactly J paths of D nodes
    assert new_index.item_paths.shape == (dr_data.num_items, 2, 3)
    assert (new_index.item_paths >= 0).all() and (new_index.item_paths < 20).all()

    # streaming mode also works
    new_index2 = coordinate_descent(
        tr,
        dr_data.train_seqs[:500],
        dr_data.train_targets[:500],
        num_iteration=2,
        num_candidate_path=10,
        batch_size=256,
        mode="streaming",
    )
    assert new_index2.item_paths.shape == (dr_data.num_items, 2, 3)


def test_rerank_early_stop(dr_data):
    tr = DRTrainer(
        dr_data, num_layers=3, num_nodes=20, num_paths_per_item=2, embed_size=8,
        train_batch_size=2048, beam_size=10, seed=0,
    )
    before = np.asarray(tr.rerank_params["embedding"]).copy()
    tr.train(num_epochs=2, rerank_epochs=1)
    # rerank trained only in epoch 1; layer model trained both epochs
    assert np.isnan(tr.train_loss_log[1]["rerank_loss"])
    assert not np.isnan(tr.train_loss_log[0]["rerank_loss"])
    assert not np.array_equal(before, np.asarray(tr.rerank_params["embedding"]))


def test_dr_sparse_steps_match_dense(dr_data):
    """Sparse (lazy row-Adam) layer/rerank steps match the dense steps on
    touched rows: identical batches every step -> identical params/losses
    within fp noise (train/sparse_adam.py; same argument as the TDM test)."""
    kwargs = dict(
        data=dr_data, num_layers=3, num_nodes=20, num_paths_per_item=2,
        embed_size=8, learning_rate=3e-3, seed=5, num_sampled=2,
    )
    dense = DRTrainer(sparse_embed_update=False, **kwargs)
    sparse = DRTrainer(sparse_embed_update=True, **kwargs)
    assert sparse._sparse and not dense._sparse

    d = dr_data
    idx = np.arange(64)
    seqs = jnp.asarray(d.train_seqs[idx], jnp.int32)
    targets = d.train_targets[idx]
    paths = jnp.asarray(dense.path_index.item_paths[targets], jnp.int32)
    labels = jnp.asarray(targets, jnp.int32)
    key = jax.random.PRNGKey(11)
    for step in range(3):
        dense.layer_params, dense.layer_opt_state, l_d = dense._layer_step(
            dense.layer_params, dense.layer_opt_state, seqs, paths)
        sparse.layer_params, sparse.layer_opt_state, l_s = sparse._layer_step(
            sparse.layer_params, sparse.layer_opt_state, seqs, paths)
        np.testing.assert_allclose(
            np.asarray(l_d), np.asarray(l_s), rtol=1e-5,
            err_msg=f"layer losses diverged at step {step}")
        dense.rerank_params, dense.rerank_opt_state, r_d = dense._rerank_step(
            dense.rerank_params, dense.rerank_opt_state, key, seqs, labels)
        sparse.rerank_params, sparse.rerank_opt_state, r_s = (
            sparse._rerank_step(
                sparse.rerank_params, sparse.rerank_opt_state, key, seqs,
                labels))
        np.testing.assert_allclose(
            float(r_d), float(r_s), rtol=1e-5,
            err_msg=f"rerank loss diverged at step {step}")
    # raw-step driving bypasses train(); re-materialize the param mirrors
    # from the packed p|m|v state before comparing (the documented contract)
    sparse._sync_mirrors()
    np.testing.assert_allclose(
        np.asarray(dense.layer_params["embedding"]),
        np.asarray(sparse.layer_params["embedding"]),
        rtol=2e-4, atol=2e-6)
    for k in ("embedding", "softmax_w", "softmax_b"):
        np.testing.assert_allclose(
            np.asarray(dense.rerank_params[k]),
            np.asarray(sparse.rerank_params[k]),
            rtol=2e-4, atol=2e-6, err_msg=f"rerank {k} diverged")


def test_pmv_state_roundtrip_and_parity(dr_data):
    """p|m|v packed rows (train/sparse_adam.py): pack/unpack round-trips,
    refresh keeps moments, gather matches plain row gathers, and
    pmv_apply_rows matches the split-format apply_rows bit-for-bit given
    identical gradients."""
    from dismember_tpu.train import sparse_adam

    rng = np.random.default_rng(3)
    v, e = 103, 8  # 4 slots per 128-lane row, ragged tail
    table = jnp.asarray(rng.normal(size=(v, e)).astype(np.float32))
    st = sparse_adam.pmv_init(table)
    assert st["pmv"].shape == ((v + 3) // 4 + 1, 128)
    np.testing.assert_array_equal(
        np.asarray(sparse_adam.pmv_unpack(st, v, e)), np.asarray(table)
    )
    codes = jnp.asarray(rng.integers(0, v, size=37), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(sparse_adam.pmv_gather(st["pmv"], codes, e)),
        np.asarray(table[codes]),
    )

    # identical gradient stream through both formats -> identical tables
    split = sparse_adam.init_state(table, packed=False)
    tbl_split = table
    for step in range(3):
        flat = jnp.asarray(
            np.concatenate([rng.integers(0, v, size=20), [-1, -1]]), jnp.int32
        )
        g = jnp.asarray(rng.normal(size=(22, e)).astype(np.float32))
        g = g * (flat >= 0)[:, None]
        tbl_split, split = sparse_adam.apply_rows(
            tbl_split, split, flat, g, 1e-2
        )
        st = sparse_adam.pmv_apply_rows(st, flat, g, 1e-2)
    np.testing.assert_array_equal(
        np.asarray(sparse_adam.pmv_unpack(st, v, e)), np.asarray(tbl_split)
    )
    np.testing.assert_array_equal(
        np.asarray(
            sparse_adam.pmv_unpack(
                {"pmv": st["pmv"], "count": st["count"]}, v, e
            )
        ),
        np.asarray(tbl_split),
    )

    # refresh replaces p lanes, keeps moments: next identical step matches
    new_table = jnp.asarray(rng.normal(size=(v, e)).astype(np.float32))
    st2 = sparse_adam.pmv_refresh(st, new_table)
    np.testing.assert_array_equal(
        np.asarray(sparse_adam.pmv_unpack(st2, v, e)), np.asarray(new_table)
    )
    flat = jnp.asarray(rng.integers(0, v, size=16), jnp.int32)
    g = jnp.asarray(rng.normal(size=(16, e)).astype(np.float32))
    tbl_ref, _ = sparse_adam.apply_rows(new_table, split, flat, g, 1e-2)
    st3 = sparse_adam.pmv_apply_rows(st2, flat, g, 1e-2)
    np.testing.assert_array_equal(
        np.asarray(sparse_adam.pmv_unpack(st3, v, e)), np.asarray(tbl_ref)
    )


def test_dr_pmv_mirror_sync_through_train(dr_data):
    """End-to-end pmv mode: train() leaves synced mirrors (evaluate,
    serving and checkpointing read self.*_params), and an external mirror
    assignment (checkpoint load) is adopted by the next train() call."""
    tr = DRTrainer(
        dr_data, num_layers=3, num_nodes=20, num_paths_per_item=2,
        embed_size=8, train_batch_size=2048, beam_size=10, seed=0,
        sparse_embed_update=True,
    )
    assert tr._pmv
    tr.train(num_epochs=1)
    assert not tr._mirrors_stale
    from dismember_tpu.train import sparse_adam

    emb_rows = dr_data.num_items + 20 * 2
    np.testing.assert_array_equal(
        np.asarray(tr.layer_params["embedding"]),
        np.asarray(sparse_adam.pmv_unpack(tr.layer_opt_state[1], emb_rows, 8)),
    )
    # simulate a checkpoint load: replace a mirror, train again — the new
    # values must flow into the packed state (train would diverge otherwise).
    # The softmax projection packs as one [V, E+1] w|b table.
    forced = jnp.zeros_like(tr.rerank_params["softmax_w"])
    tr.rerank_params["softmax_w"] = forced
    tr._adopt_mirrors()
    wb = sparse_adam.pmv_unpack(tr.rerank_opt_state[2], dr_data.num_items, 9)
    np.testing.assert_array_equal(np.asarray(wb[:, :8]), np.asarray(forced))
    np.testing.assert_array_equal(
        np.asarray(wb[:, 8]), np.asarray(tr.rerank_params["softmax_b"])
    )


def test_sample_negatives_rejection_path():
    """Above the exact-Gumbel threshold the rejection sampler still returns
    in-range, label-excluding, duplicate-free negatives."""
    key = jax.random.PRNGKey(0)
    n = (1 << 18) + 5
    labels = jnp.asarray(np.arange(32) * 1000, jnp.int32)
    negs = np.asarray(dr_models.sample_negatives(key, labels, n, 8))
    assert negs.shape == (32, 8)
    assert (negs >= 0).all() and (negs < n).all()
    for i in range(32):
        row = negs[i].tolist()
        assert len(set(row)) == len(row)
        assert int(labels[i]) not in row


def test_full_softmax_loss_chunked_matches(monkeypatch):
    """Chunked logsumexp full-softmax (deep catalogs) equals the one-shot."""
    import dismember_tpu.models.dr_models as dm

    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "softmax_w": jax.random.normal(k1, (1000, 8)),
        "softmax_b": jax.random.normal(k2, (1000,)) * 0.1,
    }
    vecs = jax.random.normal(k3, (17, 8))
    labels = jnp.asarray(np.arange(17) * 7, jnp.int32)
    one = float(dm.full_softmax_loss(params, vecs, labels))
    monkeypatch.setattr(dm, "_FULL_SOFTMAX_MAX", 128)
    chunked = float(dm.full_softmax_loss(params, vecs, labels))
    np.testing.assert_allclose(chunked, one, rtol=1e-6)


def test_vectorized_batch_aggregation_matches_dict(dr_data):
    """_collect_batch_arrays (lexsort + segment sums) must aggregate exactly
    like the reference-shaped per-sample dict loop in collect_path_scores
    (batchPathScore semantics): same item set, same candidate path sets,
    same summed scores up to fp reassociation."""
    from dismember_tpu.train.dr_coordinate import (
        _collect_batch_arrays,
        _path_keys,
        collect_path_scores,
    )

    tr = DRTrainer(
        dr_data, num_layers=3, num_nodes=20, num_paths_per_item=2, embed_size=8,
        train_batch_size=1024, beam_size=10, seed=0,
    )
    tr.train(num_epochs=1)
    seqs = dr_data.train_seqs[:1500]
    targets = dr_data.train_targets[:1500]
    c = 10
    items_u, cand_keys, cand_scores = _collect_batch_arrays(
        tr, seqs, targets, c, 512
    )
    ref = collect_path_scores(tr, seqs, targets, c, 512, mode="batch")

    assert set(int(i) for i in items_u) == set(ref)
    for i, item in enumerate(items_u):
        got = {
            int(k): float(s)
            for k, s in zip(cand_keys[i], cand_scores[i])
            if k >= 0
        }
        want = {
            int(_path_keys(np.asarray(p, np.int64), 20)): v
            for p, v in ref[int(item)]
        }
        # dict top-C and array top-C can only differ on exact score ties
        if set(got) != set(want):
            only_g = {k: got[k] for k in set(got) - set(want)}
            only_w = {k: want[k] for k in set(want) - set(got)}
            assert np.allclose(
                sorted(only_g.values()), sorted(only_w.values()), rtol=1e-9
            ), (only_g, only_w)
        for k in set(got) & set(want):
            np.testing.assert_allclose(got[k], want[k], rtol=1e-9)


def test_dr_split_sparse_steps_match_dense(dr_data):
    """Trainer-level SPLIT-format sparse steps vs dense (ADVICE r2): embed
    width 48 can't pack (3*48 > 128 lanes for pmv; 2*48 doesn't divide 128
    for mv), so the trainer takes _layer_step_sparse_impl /
    _rerank_step_sparse_impl — the 3-scatter fallback — end to end."""
    kwargs = dict(
        data=dr_data, num_layers=3, num_nodes=20, num_paths_per_item=2,
        embed_size=48, learning_rate=3e-3, seed=5, num_sampled=2,
    )
    dense = DRTrainer(sparse_embed_update=False, **kwargs)
    sparse = DRTrainer(sparse_embed_update=True, **kwargs)
    assert sparse._sparse and not sparse._pmv and not dense._sparse

    d = dr_data
    idx = np.arange(64)
    seqs = jnp.asarray(d.train_seqs[idx], jnp.int32)
    targets = d.train_targets[idx]
    paths = jnp.asarray(dense.path_index.item_paths[targets], jnp.int32)
    labels = jnp.asarray(targets, jnp.int32)
    key = jax.random.PRNGKey(11)
    for step in range(3):
        dense.layer_params, dense.layer_opt_state, l_d = dense._layer_step(
            dense.layer_params, dense.layer_opt_state, seqs, paths)
        sparse.layer_params, sparse.layer_opt_state, l_s = sparse._layer_step(
            sparse.layer_params, sparse.layer_opt_state, seqs, paths)
        np.testing.assert_allclose(
            np.asarray(l_d), np.asarray(l_s), rtol=1e-5,
            err_msg=f"layer losses diverged at step {step}")
        dense.rerank_params, dense.rerank_opt_state, r_d = dense._rerank_step(
            dense.rerank_params, dense.rerank_opt_state, key, seqs, labels)
        sparse.rerank_params, sparse.rerank_opt_state, r_s = (
            sparse._rerank_step(
                sparse.rerank_params, sparse.rerank_opt_state, key, seqs,
                labels))
        np.testing.assert_allclose(
            float(r_d), float(r_s), rtol=1e-5,
            err_msg=f"rerank loss diverged at step {step}")
    np.testing.assert_allclose(
        np.asarray(dense.layer_params["embedding"]),
        np.asarray(sparse.layer_params["embedding"]),
        rtol=2e-4, atol=2e-6)
    for k in ("embedding", "softmax_w", "softmax_b"):
        np.testing.assert_allclose(
            np.asarray(dense.rerank_params[k]),
            np.asarray(sparse.rerank_params[k]),
            rtol=2e-4, atol=2e-6, err_msg=f"rerank {k} diverged")


def test_pmv_lazy_bias_bounded_divergence(dr_data):
    """pmv mode's documented deviation (train/dr.py _rerank_step_pmv_impl):
    the softmax bias trains LAZILY per touched row, while the
    dense/reference path (SampledSoftmaxLoss.scala:49-143) momentum-nudges
    every row with live moments each step.  With small batches most bias
    rows go untouched between steps, so the two must diverge — but only on
    rows that were touched at least once, and only boundedly (each skipped
    momentum-only nudge is O(lr))."""
    kwargs = dict(
        data=dr_data, num_layers=3, num_nodes=20, num_paths_per_item=2,
        embed_size=8, learning_rate=3e-3, seed=7, num_sampled=1,
    )
    dense = DRTrainer(sparse_embed_update=False, **kwargs)
    pmv = DRTrainer(sparse_embed_update=True, **kwargs)
    assert pmv._pmv and not dense._sparse

    d = dr_data
    rng = np.random.default_rng(3)
    key = jax.random.PRNGKey(23)
    n_steps, bsz = 6, 16
    for _ in range(n_steps):
        idx = rng.integers(0, len(d.train_targets), size=bsz)
        seqs = jnp.asarray(d.train_seqs[idx], jnp.int32)
        labels = jnp.asarray(d.train_targets[idx], jnp.int32)
        key, sub = jax.random.split(key)
        dense.rerank_params, dense.rerank_opt_state, r_d = dense._rerank_step(
            dense.rerank_params, dense.rerank_opt_state, sub, seqs, labels)
        pmv.rerank_params, pmv.rerank_opt_state, r_p = pmv._rerank_step(
            pmv.rerank_params, pmv.rerank_opt_state, sub, seqs, labels)
        # losses track closely: the loss reads only this step's touched rows
        np.testing.assert_allclose(float(r_d), float(r_p), rtol=5e-2)
    pmv._sync_mirrors()
    b_d = np.asarray(dense.rerank_params["softmax_b"])
    b_p = np.asarray(pmv.rerank_params["softmax_b"])
    # rows never touched have zero grads -> zero moments -> both stay at the
    # zero init; every row that moved in one moved in the other
    moved_d, moved_p = b_d != 0.0, b_p != 0.0
    np.testing.assert_array_equal(moved_d, moved_p)
    assert moved_d.sum() < len(b_d)  # small batches leave rows untouched
    # the deviation is real (touched-then-idle rows skip momentum nudges)...
    diff = np.abs(b_d - b_p)
    assert diff.max() > 0.0
    # ...and bounded: at most n_steps skipped nudges, each O(lr) (Adam's
    # m_hat/sqrt(v_hat) ratio stays O(1) for a momentum-only tail)
    assert diff.max() < 10 * 3e-3 * n_steps
    # weights diverge the same bounded way
    w_diff = np.abs(
        np.asarray(dense.rerank_params["softmax_w"])
        - np.asarray(pmv.rerank_params["softmax_w"])
    )
    assert w_diff.max() < 10 * 3e-3 * n_steps


def test_vectorized_streaming_aggregation_matches_dict(dr_data):
    """_collect_streaming_arrays (rank-synchronous fold) must reproduce the
    reference-shaped per-sample dict merge (streamingPathScore semantics):
    same item set, same candidate sets and decayed scores, with set-vs-array
    order differing only on exact score ties."""
    from dismember_tpu.train.dr_coordinate import (
        _collect_streaming_arrays,
        _path_keys,
        collect_path_scores,
    )

    tr = DRTrainer(
        dr_data, num_layers=3, num_nodes=20, num_paths_per_item=2, embed_size=8,
        train_batch_size=1024, beam_size=10, seed=0,
    )
    tr.train(num_epochs=1)
    seqs = dr_data.train_seqs[:1500]
    targets = dr_data.train_targets[:1500]
    c, decay = 10, 0.999
    items_u, cand_keys, cand_scores = _collect_streaming_arrays(
        tr, seqs, targets, c, 512, decay
    )
    ref = collect_path_scores(
        tr, seqs, targets, c, 512, mode="streaming", decay_factor=decay
    )

    assert set(int(i) for i in items_u) == set(ref)
    for i, item in enumerate(items_u):
        got = {
            int(k): float(s)
            for k, s in zip(cand_keys[i], cand_scores[i])
            if k >= 0
        }
        want = {
            int(_path_keys(np.asarray(p, np.int64), 20)): v
            for p, v in ref[int(item)]
        }
        if set(got) != set(want):
            only_g = {k: got[k] for k in set(got) - set(want)}
            only_w = {k: want[k] for k in set(want) - set(got)}
            assert np.allclose(
                sorted(only_g.values()), sorted(only_w.values()), rtol=1e-9
            ), (only_g, only_w)
        for k in set(got) & set(want):
            np.testing.assert_allclose(got[k], want[k], rtol=1e-9)


def test_streaming_fold_handles_duplicate_beam_paths():
    """When a padded beam repeats a path (identical prob), the fold must
    count it once — like the dict, which keys one entry per path."""
    from dismember_tpu.train import dr_coordinate as dc

    class Stub:
        num_nodes = 4
        num_layers = 2
        beam = 3

        def beam_search_paths(self, seqs):
            n = len(seqs)
            # every sample returns path (1,2) twice + (0,3) once
            paths = np.tile(
                np.asarray([[[1, 2], [0, 3], [1, 2]]], np.int32), (n, 1, 1)
            )
            probs = np.tile(np.asarray([[0.5, 0.3, 0.5]]), (n, 1))
            return paths, probs

    tr = Stub()
    seqs = np.zeros((4, 3), np.int64)
    targets = np.asarray([7, 7, 9, 7], np.int64)
    items_u, keys, scores = dc._collect_streaming_arrays(
        tr, seqs, targets, 3, 2, 0.5
    )
    np.testing.assert_array_equal(items_u, [7, 9])
    k12 = 1 * 4 + 2
    k03 = 0 * 4 + 3
    # item 7, 3 occurrences of the same candidate set:
    # s1 = 0.5 ; s2 = 0.5*s1 + 0.5 = 0.75 ; s3 = 0.875 (path (1,2))
    got7 = {int(k): float(s) for k, s in zip(keys[0], scores[0]) if k >= 0}
    assert set(got7) == {k12, k03}
    np.testing.assert_allclose(got7[k12], 0.875, rtol=1e-12)
    np.testing.assert_allclose(got7[k03], 0.3 * (1 + 0.5 + 0.25), rtol=1e-12)
    got9 = {int(k): float(s) for k, s in zip(keys[1], scores[1]) if k >= 0}
    np.testing.assert_allclose(got9[k12], 0.5, rtol=1e-12)
    np.testing.assert_allclose(got9[k03], 0.3, rtol=1e-12)


def test_native_greedy_matches_python(dr_data):
    """The C++ greedy J-path selection (native/host_ops.cc
    dm_dr_greedy_select) is an exact port of the numpy loop: same libm
    calls, numpy argmax/NaN semantics, processing order and rng draw order
    — selections must be bit-identical on the same host, incl. the
    multi-iteration path_size decrement and the random paths of unscored
    items."""
    import pytest as _pytest

    from dismember_tpu.data.native import get_lib

    if get_lib() is None:
        _pytest.skip("native library unavailable")
    tr = DRTrainer(
        dr_data, num_layers=3, num_nodes=20, num_paths_per_item=2,
        embed_size=8, train_batch_size=1024, beam_size=10, seed=0,
    )
    tr.train(num_epochs=1)
    for mode, iters in (("batch", 1), ("streaming", 2)):
        kw = dict(
            num_iteration=iters, num_candidate_path=10, batch_size=512,
            mode=mode, seed=3,
        )
        idx_py = coordinate_descent(
            tr, dr_data.train_seqs[:1500], dr_data.train_targets[:1500],
            greedy="python", **kw,
        )
        idx_nat = coordinate_descent(
            tr, dr_data.train_seqs[:1500], dr_data.train_targets[:1500],
            greedy="native", **kw,
        )
        np.testing.assert_array_equal(
            idx_nat.item_paths, idx_py.item_paths,
            err_msg=f"mode={mode}",
        )


def test_fused_estep_matches_separate(dr_data):
    """The fused single-dispatch E-step composes the layer and rerank pmv
    impls verbatim — state after N batches must be bit-identical to the
    separate two-dispatch path."""
    import jax
    import jax.numpy as jnp

    d = dr_data
    kw = dict(
        num_layers=3, num_nodes=20, num_paths_per_item=2, embed_size=8,
        train_batch_size=128, num_sampled=4, seed=3,
        sparse_embed_update=True,  # forces the pmv path at this small scale
    )
    a = DRTrainer(d, **kw)
    b = DRTrainer(d, **kw)
    assert getattr(a, "_pmv", False) and getattr(a, "_estep_pmv", None)
    key = jax.random.PRNGKey(9)
    seqs = jnp.asarray(d.train_seqs[:64], jnp.int32)
    targets = d.train_targets[:64]
    paths = jnp.asarray(a.path_index.item_paths[targets], jnp.int32)
    tj = jnp.asarray(targets, jnp.int32)
    for i in range(3):
        sub = jax.random.fold_in(key, i)
        la, ra = a._estep_fused(sub, seqs, paths, tj)
        b.layer_params, b.layer_opt_state, lb = b._layer_step(
            b.layer_params, b.layer_opt_state, seqs, paths
        )
        b.rerank_params, b.rerank_opt_state, rb = b._rerank_step(
            b.rerank_params, b.rerank_opt_state, sub, seqs, tj
        )
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))
    a._sync_mirrors()
    b._sync_mirrors()
    for ka in ("embedding", "heads"):
        for x, y in zip(
            jax.tree_util.tree_leaves(a.layer_params[ka]),
            jax.tree_util.tree_leaves(b.layer_params[ka]),
        ):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for ka in ("embedding", "linear", "softmax_w", "softmax_b"):
        for x, y in zip(
            jax.tree_util.tree_leaves(a.rerank_params[ka]),
            jax.tree_util.tree_leaves(b.rerank_params[ka]),
        ):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
