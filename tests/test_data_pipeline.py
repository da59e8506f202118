"""Data ingest + windowing tests (TreeInit semantics)."""

import numpy as np
import pytest

from dismember_tpu.data.ingest import read_csv, user_interactions, unique_items_with_category
from dismember_tpu.data import tdm_dataset as tds


@pytest.fixture(scope="module")
def raw(small_csv):
    return read_csv(small_csv)


@pytest.fixture(scope="module")
def inter(raw):
    return user_interactions(raw)


def test_read_csv_skips_header(raw):
    assert len(raw.user) > 0
    assert raw.user.dtype == np.int64


def test_user_interactions_sorted_distinct(raw, inter):
    # pick a user and verify time order + distinctness
    u = int(raw.user[0])
    items = inter[u]
    assert len(np.unique(items)) == len(items)
    # verify items subset of that user's raw items
    raw_items = set(raw.item[raw.user == u].tolist())
    assert set(items.tolist()) <= raw_items


def test_split_samples_invariants(inter):
    seq_len, min_seq_len, ratio = 10, 2, 0.8
    s = tds.generate_split_samples(inter, seq_len, min_seq_len, ratio)
    assert s.train_seqs.shape[1] == seq_len
    assert len(s.train_seqs) == len(s.train_targets)
    # every user present in consumed
    assert set(s.user_consumed) == set(inter)
    # train counts per user match ceil((n - min)*ratio) for n > min
    import math

    for u, items in inter.items():
        n = len(items)
        expected = math.ceil((n - min_seq_len) * ratio) if n > min_seq_len else 0
        got = int((s.train_users == u).sum())
        assert got == expected, (u, n, expected, got)
    # eval labels exclude consumed
    for i in range(len(s.eval_users)):
        u = int(s.eval_users[i])
        labels = s.eval_labels[i]
        labels = labels[labels >= 0]
        consumed = set(s.user_consumed[u].tolist())
        assert not (set(labels.tolist()) & consumed)
    # stat totals = number of train samples
    assert sum(s.stat.values()) == len(s.train_targets)


def test_file_roundtrip(tmp_path, inter):
    s = tds.generate_split_samples(inter, 10, 2, 0.8)
    train_p = tmp_path / "train.csv"
    eval_p = tmp_path / "eval.csv"
    cons_p = tmp_path / "consumed.txt"
    stat_p = tmp_path / "stat.txt"
    tds.write_train_file(str(train_p), s)
    tds.write_eval_file(str(eval_p), s)
    tds.write_user_consumed_file(str(cons_p), s.user_consumed)
    tds.write_stat_file(str(stat_p), s.stat)

    seqs, targets = tds.read_train_file(str(train_p))
    # reader filters all-padding sequences
    keep = (s.train_seqs != 0).any(axis=1)
    np.testing.assert_array_equal(seqs, s.train_seqs[keep])
    np.testing.assert_array_equal(targets, s.train_targets[keep])

    eseqs, elabels, eusers = tds.read_eval_file(str(eval_p), 10)
    np.testing.assert_array_equal(eseqs, s.eval_seqs)
    np.testing.assert_array_equal(eusers, s.eval_users)
    cons = tds.read_user_consumed_file(str(cons_p))
    assert set(cons) == set(s.user_consumed)
    for u in cons:
        np.testing.assert_array_equal(cons[u], s.user_consumed[u])
    stat = tds.read_stat_file(str(stat_p))
    assert stat == s.stat


def test_unique_items(raw):
    ids, cats = unique_items_with_category(raw)
    assert len(ids) == len(np.unique(raw.item))
    assert len(ids) == len(cats)
