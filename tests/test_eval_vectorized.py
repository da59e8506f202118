"""Vectorized evaluators must match the row-wise host reference paths.

OTM: batched masked-argsort filter/top-k + compute_metrics_batch vs the
row-wise recommend_batch + compute_metrics loop.
DR: device serving path (dense path table, padded consumed) vs the host
recommend_batch path.
"""

import numpy as np
import pytest

from dismember_tpu.core.metrics import compute_metrics


@pytest.fixture(scope="module")
def otm_trainer(small_csv):
    from dismember_tpu.data.otm_dataset import build_otm_data
    from dismember_tpu.train.otm import OTMTrainer

    data = build_otm_data(
        small_csv, seq_len=10, min_seq_len=2, split_ratio=0.8,
        leaf_init_mode="category", label_num=3, seed=0,
    )
    tr = OTMTrainer(
        data, embed_size=8, beam_size=10, topk=5,
        total_train_batch_size=1024, total_eval_batch_size=512,
    )
    tr.train(num_epochs=1)
    return tr


def test_otm_evaluate_matches_rowwise(otm_trainer):
    tr = otm_trainer
    d = tr.data
    got = tr.evaluate()

    # row-wise reference: the pre-vectorization implementation
    m = len(d.eval_seqs)
    total_loss = prec = rec = ndcg = 0.0
    for s in range(0, m, tr.eval_batch_size):
        e = min(s + tr.eval_batch_size, m)
        consumed = [
            d.user_consumed.get(int(u), np.empty(0, np.int64))
            for u in d.eval_users[s:e]
        ]
        results = tr.recommend_batch(
            d.eval_seqs[s:e], topk=tr.topk, consumed=consumed,
            return_codes=True, with_scores=True,
        )
        for i, (codes, scores) in enumerate(results):
            labels_row = d.eval_labels[s + i]
            labels_row = labels_row[labels_row >= 0]
            is_pos = np.isin(codes, labels_row).astype(np.float64)
            x = scores.astype(np.float64)
            total_loss += float(
                np.sum(np.maximum(x, 0) - x * is_pos + np.log1p(np.exp(-np.abs(x))))
            )
            p, r, nd = compute_metrics(codes, labels_row)
            prec += p
            rec += r
            ndcg += nd
    np.testing.assert_allclose(got.loss, total_loss / m, rtol=1e-6)
    np.testing.assert_allclose(got.precision, prec / m, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(got.recall, rec / m, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(got.ndcg, ndcg / m, rtol=1e-9, atol=1e-12)


@pytest.fixture(scope="module")
def dr_trainer(small_csv):
    from dismember_tpu.data.dr_dataset import build_dr_data
    from dismember_tpu.train.dr import DRTrainer

    data = build_dr_data(small_csv, seq_len=10, min_seq_len=2, split_ratio=0.8)
    tr = DRTrainer(
        data, num_layers=3, num_nodes=20, num_paths_per_item=2,
        embed_size=8, train_batch_size=1024, eval_batch_size=512,
        beam_size=5, topk=5, seed=3,
    )
    tr.train(num_epochs=1)
    return tr


def test_dr_evaluate_device_matches_host(dr_trainer, monkeypatch):
    tr = dr_trainer
    got = tr.evaluate()  # device serving path (table fits: 20^3)

    import dismember_tpu.retrieval.dr_serve as dr_serve

    monkeypatch.setattr(dr_serve, "make_dr_serving_fn", lambda *a, **k: None)
    ref = tr.evaluate()  # host fallback path

    np.testing.assert_allclose(got.layer_loss, ref.layer_loss, rtol=1e-6)
    np.testing.assert_allclose(got.rerank_loss, ref.rerank_loss, rtol=1e-6)
    np.testing.assert_allclose(got.precision, ref.precision, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(got.recall, ref.recall, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(got.ndcg, ref.ndcg, rtol=1e-6, atol=1e-9)
