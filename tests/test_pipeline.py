"""Pipeline driver, serving facades, compression codec tests."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from dismember_tpu.core.compress import compress, compressed_add, decompress
from dismember_tpu.data.ingest import read_csv, user_interactions, unique_items_with_category
from dismember_tpu.data.tdm_dataset import generate_split_samples
from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
from dismember_tpu.train.pipeline import StageState, run_tdm_alternation

NEG = "0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,17,19,22,25,30,76,200"


@pytest.fixture(scope="module")
def samples_tree(small_csv, tmp_path_factory):
    raw = read_csv(small_csv)
    inter = user_interactions(raw)
    samples = generate_split_samples(inter, 10, 2, 0.8)
    ids, cats = unique_items_with_category(raw)
    sid, codes = category_sorted_codes(ids, cats)
    path = str(tmp_path_factory.mktemp("pl") / "tree.bin")
    write_tree(path, sid, codes, stat=samples.stat)
    return samples, path


def test_tdm_alternation_with_resume(samples_tree, tmp_path):
    samples, tree_path = samples_tree
    wd = str(tmp_path / "alt")
    kwargs = dict(
        model_type="din", embed_size=8, learning_rate=3e-3,
        total_batch_size=1024, layer_neg_counts=NEG, topk=5, beam_size=10,
    )
    trainer, results = run_tdm_alternation(
        wd, samples, tree_path, rounds=2, iterations_per_round=20,
        cluster_iter=2, trainer_kwargs=kwargs, eval_every_round=False,
    )
    state = StageState.load(os.path.join(wd, "pipeline_state.json"))
    assert state.round == 2
    # round-2 artifacts exist
    assert os.path.exists(os.path.join(wd, "model_round2.npz"))
    assert os.path.exists(os.path.join(wd, "tree_round2.bin"))

    # resume: a third round picks up from the checkpointed state
    trainer2, _ = run_tdm_alternation(
        wd, samples, tree_path, rounds=3, iterations_per_round=20,
        cluster_iter=2, trainer_kwargs=kwargs, eval_every_round=False,
    )
    state = StageState.load(os.path.join(wd, "pipeline_state.json"))
    assert state.round == 3
    rec = trainer2.recommend(samples.eval_seqs[0], topk=5)
    assert len(rec) == 5


def test_tdm_serving_facade(samples_tree, tmp_path):
    from dismember_tpu.core.checkpoint import save_pytree
    from dismember_tpu.index.arraytree import ArrayTree
    from dismember_tpu.serving import TDMServing
    from dismember_tpu.train.tdm import TDMTrainer

    samples, tree_path = samples_tree
    tree = ArrayTree.from_file(tree_path)
    trainer = TDMTrainer(
        tree=tree, model_type="din", embed_size=8, layer_neg_counts=NEG,
        total_batch_size=1024, topk=5, beam_size=10,
    )
    trainer.train(samples.train_seqs, samples.train_targets, iterations=10,
                  progress_interval=10)
    mp = str(tmp_path / "serve_model")
    save_pytree(mp, trainer.params, meta={
        "model": "din", "embed_size": 8, "seq_len": 10,
    })
    serving = TDMServing.load(mp, tree_path, topk=5, candidate_num=10)
    seq = samples.eval_seqs[0]
    rec_t = trainer.recommend(seq, topk=5, candidate_num=10)
    rec_s = serving.recommend(seq, topk=5, candidate_num=10)
    np.testing.assert_array_equal(rec_t, rec_s)

    # predict = sigmoid scores in [0, 1], ordered consistently with logits
    scores = serving.predict(seq, rec_s)
    assert ((scores >= 0) & (scores <= 1)).all()


def test_compress_roundtrip():
    tree = {"a": jnp.arange(8, dtype=jnp.float32) / 7.0, "b": jnp.ones((3, 3))}
    c = compress(tree)
    assert c["a"].dtype == jnp.bfloat16
    d = decompress(c)
    np.testing.assert_allclose(np.asarray(d["a"]), np.asarray(tree["a"]), atol=1e-2)
    s = compressed_add(c, c)
    np.testing.assert_allclose(
        np.asarray(decompress(s)["b"]), 2 * np.ones((3, 3)), atol=1e-2
    )


def test_io_local_roundtrip(tmp_path):
    from dismember_tpu.core.io import exists, open_file, read_bytes, write_bytes

    p = str(tmp_path / "sub" / "x.bin")
    write_bytes(p, b"abc")  # auto-creates parent dir
    assert exists(p)
    assert read_bytes(p) == b"abc"
    with open_file(p, "rb") as f:
        assert f.read() == b"abc"
    assert not exists(str(tmp_path / "nope"))


def test_otm_serving_facade(small_csv, tmp_path):
    from dismember_tpu.core.checkpoint import save_pytree
    from dismember_tpu.data.otm_dataset import build_otm_data, save_mapping
    from dismember_tpu.serving import OTMServing
    from dismember_tpu.train.otm import OTMTrainer

    data = build_otm_data(
        small_csv, 10, 2, 0.8, leaf_init_mode="random", label_num=3, seed=5
    )
    tr = OTMTrainer(data, embed_size=8, beam_size=8, topk=5,
                    total_train_batch_size=512, seed=5)
    tr.train(num_epochs=1)
    mp = str(tmp_path / "otm_model")
    save_pytree(mp, tr.params, meta={"model": "din", "embed_size": 8, "seq_len": 10})
    mapping_p = str(tmp_path / "otm_mapping.txt")
    save_mapping(mapping_p, data.item_to_code)

    serving = OTMServing.load(
        mp, mapping_p, small_csv, label_num=3, beam_size=8, topk=5
    )
    items = np.asarray(list(data.item_to_code)[:10])
    rec = serving.recommend(items)
    assert len(rec) <= 5
    assert all(int(x) in data.item_to_code for x in rec)
    # consumed filter in item space
    if len(rec) > 0:
        rec2 = serving.recommend(items, consumed_items=rec[:1])
        assert int(rec[0]) not in rec2


def test_profiling_helpers(tmp_path):
    from dismember_tpu.core.profiling import StepTimer, trace

    t = StepTimer("test", log_every=2)
    t.step(10)
    t.step(10)
    assert t.rate > 0
    # device trace writes profile data
    import jax.numpy as jnp

    with trace(str(tmp_path / "prof")):
        jnp.sum(jnp.ones((8, 8))).block_until_ready()
    import os

    found = any(f for _, _, fs in os.walk(tmp_path / "prof") for f in fs)
    assert found


def test_dr_alternation_pipeline(small_csv, tmp_path):
    from dismember_tpu.data.dr_dataset import build_dr_data
    from dismember_tpu.train.pipeline import StageState, run_dr_alternation

    data = build_dr_data(small_csv, 10, 2, 0.8)
    wd = str(tmp_path / "dr_alt")
    kwargs = dict(num_layers=3, num_nodes=10, num_paths_per_item=2,
                  embed_size=8, train_batch_size=1024, beam_size=5, topk=5)
    cd_kwargs = dict(num_iteration=1, num_candidate_path=5, batch_size=1024,
                     mode="batch")
    trainer, results = run_dr_alternation(
        wd, data, rounds=2, epochs_per_round=1,
        cd_kwargs=cd_kwargs, trainer_kwargs=kwargs,
    )
    assert len(results) == 2
    state = StageState.load(os.path.join(wd, "dr_pipeline_state.json"))
    assert state.round == 2
    assert os.path.exists(state.artifacts["mapping"])
    # resume for a third round
    trainer2, _ = run_dr_alternation(
        wd, data, rounds=3, epochs_per_round=1,
        cd_kwargs=cd_kwargs, trainer_kwargs=kwargs,
    )
    state = StageState.load(os.path.join(wd, "dr_pipeline_state.json"))
    assert state.round == 3


def test_multihost_single_process():
    from dismember_tpu.core import multihost

    assert multihost.process_count() == 1
    assert multihost.process_index() == 0
    s = multihost.host_shard(100)
    assert (s.start, s.stop) == (0, 100)
    arrs = [np.arange(5), np.ones((2, 2))]
    out = multihost.broadcast_from_host0(arrs)
    for a, b in zip(arrs, out):
        np.testing.assert_array_equal(a, b)
    multihost.assert_same_across_hosts(np.arange(3))  # no-op single process


def test_jtm_alternation_with_resume(samples_tree, tmp_path):
    from dismember_tpu.train.pipeline import run_jtm_alternation

    samples, tree_path = samples_tree
    wd = str(tmp_path / "jtm_alt")
    kwargs = dict(
        model_type="din", embed_size=8, learning_rate=3e-3,
        total_batch_size=1024, layer_neg_counts=NEG, topk=5, beam_size=10,
    )
    trainer, _ = run_jtm_alternation(
        wd, samples, tree_path, rounds=2, iterations_per_round=20,
        gap=2, trainer_kwargs=kwargs, eval_every_round=False,
    )
    state = StageState.load(os.path.join(wd, "jtm_pipeline_state.json"))
    assert state.round == 2
    assert os.path.exists(os.path.join(wd, "jtm_model_round2.npz"))
    assert os.path.exists(os.path.join(wd, "jtm_tree_round2.bin"))
    # the learned tree is a permutation of the same items
    from dismember_tpu.index.arraytree import ArrayTree

    t2 = ArrayTree.from_file(os.path.join(wd, "jtm_tree_round2.bin"))
    assert set(t2.item_ids.tolist()) == set(trainer.tree.item_ids.tolist())

    # resume continues to round 3 without retraining rounds 1-2
    trainer2, _ = run_jtm_alternation(
        wd, samples, tree_path, rounds=3, iterations_per_round=20,
        gap=2, trainer_kwargs=kwargs, eval_every_round=False,
    )
    state = StageState.load(os.path.join(wd, "jtm_pipeline_state.json"))
    assert state.round == 3
    assert len(trainer2.recommend(samples.eval_seqs[0], topk=5)) == 5


def test_otm_alternation_with_resume(small_csv, tmp_path):
    from dismember_tpu.train.pipeline import run_otm_alternation

    wd = str(tmp_path / "otm_alt")
    kwargs = dict(
        embed_size=8, beam_size=8, topk=5, total_train_batch_size=1024,
        total_eval_batch_size=512, seed=1,
    )
    trainer, results = run_otm_alternation(
        wd, small_csv, rounds=2, epochs_per_round=1, label_num=3,
        trainer_kwargs=kwargs,
    )
    state = StageState.load(os.path.join(wd, "otm_pipeline_state.json"))
    assert state.round == 2
    assert len(results) == 2
    assert os.path.exists(os.path.join(wd, "otm_model_round2.npz"))
    assert os.path.exists(os.path.join(wd, "otm_mapping_round2.txt"))
    # round-2 mapping is a total re-assignment of the same items
    from dismember_tpu.data.otm_dataset import load_mapping

    m2, _ = load_mapping(os.path.join(wd, "otm_mapping_round2.txt"))
    assert set(m2) == set(trainer.data.item_to_code)
    assert len(set(m2.values())) == len(m2)

    # resume to round 3
    trainer2, results2 = run_otm_alternation(
        wd, small_csv, rounds=3, epochs_per_round=1, label_num=3,
        trainer_kwargs=kwargs,
    )
    state = StageState.load(os.path.join(wd, "otm_pipeline_state.json"))
    assert state.round == 3
    # only the newly-run round reports results (rounds 1-2 were skipped)
    assert len(results2) == 1 and results2[0]["round"] == 3
