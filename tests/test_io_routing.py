"""Remote-FS routing: every persistence artifact round-trips through a
remote URL (fsspec ``memory://``), mirroring the reference's property that
any path may be ``hdfs://`` (scalann utils/File.scala:12-57)."""

import numpy as np
import pytest

pytest.importorskip("fsspec")

M = "memory://dismember-io-test"


def test_tree_roundtrip_remote():
    from dismember_tpu.index.arraytree import ArrayTree
    from dismember_tpu.index.tree_io import category_sorted_codes, read_tree, write_tree

    ids = np.arange(1, 65)
    cats = (ids % 4).astype(np.int64)
    sorted_ids, codes = category_sorted_codes(ids, cats)
    url = f"{M}/tree.bin"
    write_tree(url, sorted_ids, codes, stat={int(i): int(i) for i in ids})
    loaded = read_tree(url)
    assert set(loaded.item_ids.tolist()) == set(ids.tolist())
    tree = ArrayTree.from_file(url)
    assert tree.max_level == 6


def test_path_index_roundtrip_remote():
    from dismember_tpu.index.paths import PathIndex

    idx = PathIndex.random_init(
        num_items=10, num_layers=3, num_nodes=5, num_paths_per_item=2, seed=0
    )
    item_to_id = {100 + i: i for i in range(10)}
    url = f"{M}/mapping.bin"
    idx.write(url, item_to_id)
    got, got_map = PathIndex.read(url, num_nodes=5)
    assert got_map == item_to_id
    np.testing.assert_array_equal(got.item_paths, idx.item_paths)


def test_checkpoint_roundtrip_remote():
    from dismember_tpu.core.checkpoint import load_meta, load_pytree, save_pytree

    tree = {"a": np.arange(6.0).reshape(2, 3), "b": {"c": np.ones(4)}}
    url = f"{M}/ckpt"
    save_pytree(url, tree, meta={"stage": "trained", "round": 2})
    got = load_pytree(url, tree)
    np.testing.assert_array_equal(got["a"], tree["a"])
    np.testing.assert_array_equal(got["b"]["c"], tree["b"]["c"])
    assert load_meta(url) == {"stage": "trained", "round": 2}


def test_dataset_files_roundtrip_remote(small_csv):
    from dismember_tpu.data import tdm_dataset as tds
    from dismember_tpu.data.ingest import read_csv, user_interactions

    raw = read_csv(small_csv)
    samples = tds.generate_split_samples(user_interactions(raw), 10, 2, 0.8)

    train_url = f"{M}/train.csv"
    eval_url = f"{M}/eval.csv"
    stat_url = f"{M}/stat.txt"
    uc_url = f"{M}/user_consumed.txt"
    tds.write_train_file(train_url, samples)
    tds.write_eval_file(eval_url, samples)
    tds.write_stat_file(stat_url, samples.stat)
    tds.write_user_consumed_file(uc_url, samples.user_consumed)

    seqs, targets = tds.read_train_file(train_url)
    assert len(seqs) == len(samples.train_targets)
    eseqs, elabels, eusers = tds.read_eval_file(eval_url, 10)
    assert len(eusers) == len(samples.eval_users)
    stat = tds.read_stat_file(stat_url)
    assert stat == {int(k): int(v) for k, v in samples.stat.items()}
    uc = tds.read_user_consumed_file(uc_url)
    assert set(uc) == set(int(u) for u in samples.user_consumed)


def test_remote_csv_ingest(small_csv):
    from dismember_tpu.core.io import write_bytes
    from dismember_tpu.data.ingest import read_csv

    with open(small_csv, "rb") as f:
        data = f.read()
    url = f"{M}/example.csv"
    write_bytes(url, data)
    local = read_csv(small_csv)
    remote = read_csv(url)
    np.testing.assert_array_equal(remote.user, local.user)
    np.testing.assert_array_equal(remote.item, local.item)


def test_otm_mapping_and_conf_remote(tmp_path):
    from dismember_tpu.core.config import read_conf
    from dismember_tpu.core.io import write_bytes
    from dismember_tpu.data.otm_dataset import load_mapping, save_mapping

    mapping = {7: 3, 9: 4, 11: 5}
    url = f"{M}/otm_mapping.txt"
    save_mapping(url, mapping)
    got, inv = load_mapping(url)
    assert got == mapping and inv == {v: k for k, v in mapping.items()}

    conf_url = f"{M}/test.conf"
    write_bytes(conf_url, b"model.seq_len 10\nmodel.lr 0.003\n# comment\n")
    assert read_conf(conf_url, "model") == {"seq_len": "10", "lr": "0.003"}


def test_pipeline_state_remote():
    from dismember_tpu.train.pipeline import StageState

    url = f"{M}/state.json"
    st = StageState(round=1, stage="clustered", artifacts={"tree": "x"})
    st.save(url)
    got = StageState.load(url)
    assert got == st
    assert StageState.load(f"{M}/nope.json") is None


def test_embeddings_csv_remote():
    from dismember_tpu.core.io import open_file
    from dismember_tpu.index.cluster import read_embeddings_csv

    url = f"{M}/emb.csv"
    with open_file(url, "w", encoding="utf-8") as f:
        f.write("1, 0.5, -1.25\n2, 3.0, 4.0\n")
    ids, vecs = read_embeddings_csv(url)
    np.testing.assert_array_equal(ids, [1, 2])
    np.testing.assert_allclose(vecs, [[0.5, -1.25], [3.0, 4.0]])
