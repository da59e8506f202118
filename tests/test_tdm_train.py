"""End-to-end TDM: tree init → train DIN → recommend → save/load determinism.

Pattern parity with the reference's TdmModelTrainSpec (tdm/src/test/scala):
run a short real training on the bundled data, then assert recommend returns
k items, loss decreases, and save/load reproduces identical recommendations.
"""

import jax
import numpy as np
import pytest

from dismember_tpu.core.checkpoint import load_pytree, save_pytree
from dismember_tpu.data.ingest import read_csv, user_interactions, unique_items_with_category
from dismember_tpu.data.tdm_dataset import generate_split_samples
from dismember_tpu.index.arraytree import ArrayTree
from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
from dismember_tpu.train.tdm import TDMTrainer

NEG_COUNTS = "0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,17,19,22,25,30,76,200"


@pytest.fixture(scope="module")
def pipeline(small_csv, tmp_path_factory):
    raw = read_csv(small_csv)
    inter = user_interactions(raw)
    samples = generate_split_samples(inter, 10, 2, 0.8)
    ids, cats = unique_items_with_category(raw)
    sorted_ids, codes = category_sorted_codes(ids, cats)
    path = str(tmp_path_factory.mktemp("tree") / "tree.bin")
    write_tree(path, sorted_ids, codes, stat=samples.stat)
    tree = ArrayTree.from_file(path)
    return tree, samples


@pytest.mark.parametrize("model_type", ["din", "deepfm"])
def test_train_and_recommend(pipeline, model_type, tmp_path):
    tree, samples = pipeline
    trainer = TDMTrainer(
        tree=tree,
        model_type=model_type,
        embed_size=8,
        learning_rate=3e-3,
        total_batch_size=2048,
        total_eval_batch_size=2048,
        layer_neg_counts=NEG_COUNTS,
        topk=7,
        beam_size=20,
        seed=42,
    )
    logs = trainer.train(
        samples.train_seqs,
        samples.train_targets,
        iterations=60,
        progress_interval=30,
    )
    assert len(logs) == 2
    first, last = logs[0]["train_loss"], logs[-1]["train_loss"]
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first  # loss decreases

    seq = samples.eval_seqs[0]
    rec = trainer.recommend(seq, topk=7)
    assert len(rec) == 7
    assert len(np.unique(rec)) == 7
    assert np.isin(rec, tree.item_ids).all()

    # save / load round trip -> identical recommendations
    ckpt = str(tmp_path / f"{model_type}_params")
    save_pytree(ckpt, trainer.params, meta={"model": model_type})
    restored = load_pytree(ckpt, trainer.params)
    trainer2 = TDMTrainer(
        tree=tree,
        model_type=model_type,
        embed_size=8,
        layer_neg_counts=NEG_COUNTS,
        topk=7,
        beam_size=20,
    )
    trainer2.params = jax.tree.map(lambda a: jax.numpy.asarray(a), restored)
    rec2 = trainer2.recommend(seq, topk=7)
    np.testing.assert_array_equal(rec, rec2)


def test_evaluate_metrics(pipeline):
    tree, samples = pipeline
    trainer = TDMTrainer(
        tree=tree,
        model_type="din",
        embed_size=8,
        learning_rate=3e-3,
        total_batch_size=2048,
        layer_neg_counts=NEG_COUNTS,
        topk=10,
        beam_size=20,
    )
    trainer.train(samples.train_seqs, samples.train_targets, iterations=30, progress_interval=30)
    eval_data = (samples.eval_seqs[:64], samples.eval_labels[:64], samples.eval_users[:64])
    result = trainer.evaluate(eval_data, samples.user_consumed)
    assert result.count == 64
    assert np.isfinite(result.loss)
    assert 0.0 <= result.recall / result.count <= 1.0
    assert 0.0 <= result.precision / result.count <= 1.0
    assert 0.0 <= result.ndcg / result.count <= 1.0


def test_recommend_excludes_consumed(pipeline):
    tree, samples = pipeline
    trainer = TDMTrainer(
        tree=tree, model_type="din", embed_size=8, layer_neg_counts=NEG_COUNTS,
        topk=10, beam_size=20,
    )
    user = int(samples.eval_users[0])
    consumed = samples.user_consumed[user]
    rec = trainer.recommend(samples.eval_seqs[0], topk=10, consumed=consumed)
    assert not np.isin(rec, consumed).any()


def test_export_embeddings(pipeline, tmp_path):
    tree, _ = pipeline
    trainer = TDMTrainer(
        tree=tree, model_type="din", embed_size=8, layer_neg_counts=NEG_COUNTS
    )
    path = str(tmp_path / "embed.csv")
    trainer.export_embeddings(path)
    with open(path) as f:
        lines = f.read().strip().split("\n")
    assert len(lines) == tree.num_items
    first = lines[0].split(", ")
    assert len(first) == 1 + 8  # id + embed_size


def test_bf16_embedding_training(pipeline):
    import jax.numpy as jnp

    tree, samples = pipeline
    trainer = TDMTrainer(
        tree=tree, model_type="din", embed_size=8, learning_rate=3e-3,
        total_batch_size=1024, layer_neg_counts=NEG_COUNTS, topk=5,
        beam_size=10, embed_dtype=jnp.bfloat16,
    )
    assert trainer.params["embedding"].dtype == jnp.bfloat16
    logs = trainer.train(samples.train_seqs, samples.train_targets,
                         iterations=20, progress_interval=10)
    assert all(np.isfinite(l["train_loss"]) for l in logs)
    # table stays bf16 through updates; serving works
    assert trainer.params["embedding"].dtype == jnp.bfloat16
    rec = trainer.recommend(samples.eval_seqs[0], topk=5)
    assert len(rec) == 5


def test_training_determinism(pipeline):
    """Same seed -> bitwise-identical parameters and recommendations
    (SURVEY §7: determinism under device RNG)."""
    tree, samples = pipeline

    def run():
        tr = TDMTrainer(
            tree=tree, model_type="din", embed_size=8, learning_rate=3e-3,
            total_batch_size=1024, layer_neg_counts=NEG_COUNTS, topk=5,
            beam_size=10, seed=123,
        )
        tr.train(samples.train_seqs, samples.train_targets, iterations=15,
                 progress_interval=15)
        return tr

    a, b = run(), run()
    np.testing.assert_array_equal(
        np.asarray(a.params["embedding"]), np.asarray(b.params["embedding"])
    )
    np.testing.assert_array_equal(
        a.recommend(samples.eval_seqs[0], topk=5),
        b.recommend(samples.eval_seqs[0], topk=5),
    )


@pytest.mark.parametrize("model_type", ["din", "deepfm"])
@pytest.mark.parametrize("sparse_format", ["mv", "pmv"])
def test_sparse_step_matches_dense(pipeline, model_type, sparse_format):
    """Lazy row-sparse Adam (sparse_embed_update=True) matches the dense
    step exactly on rows it touches: with identical batches every step, the
    touched set repeats, so params/loss must agree with dense within fp
    reassociation noise (train/sparse_adam.py docstring).  Covers both
    sparse formats: mv (addressable table, one scatter) and pmv (packed
    p|m|v rows, mirror-synced table)."""
    import jax.numpy as jnp

    tree, samples = pipeline
    kwargs = dict(
        tree=tree, model_type=model_type, embed_size=8, learning_rate=3e-3,
        total_batch_size=512, layer_neg_counts=NEG_COUNTS, seed=7,
    )
    dense = TDMTrainer(sparse_embed_update=False, **kwargs)
    sparse = TDMTrainer(
        sparse_embed_update=True, sparse_format=sparse_format, **kwargs
    )
    assert sparse._sparse and not dense._sparse
    assert sparse._pmv == (sparse_format == "pmv")

    seqs = samples.train_seqs[:dense.num_targets_per_batch]
    targets = samples.train_targets[:dense.num_targets_per_batch]
    key = jax.random.PRNGKey(3)
    sc = jnp.asarray(tree.ids_to_codes(seqs))
    tc = jnp.asarray(tree.ids_to_codes(targets))
    for step in range(3):
        dense.params, dense.opt_state, loss_d = dense._train_step(
            dense.params, dense.opt_state, key, tc, sc)
        sparse.params, sparse.opt_state, loss_s = sparse._train_step(
            sparse.params, sparse.opt_state, key, tc, sc)
        np.testing.assert_allclose(
            float(loss_d), float(loss_s), rtol=1e-5,
            err_msg=f"loss diverged at step {step}")
    sparse._sync_mirrors()  # pmv: re-materialize the embedding mirror
    for k in dense.params:
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(dense.params[k])[0]),
            np.asarray(jax.tree.leaves(sparse.params[k])[0]),
            rtol=2e-4, atol=2e-6, err_msg=f"param {k} diverged")


def test_sparse_auto_resolution(pipeline):
    """Auto mode: dense on small catalogs, flag forces the sparse path."""
    tree, _ = pipeline
    t = TDMTrainer(tree=tree, embed_size=8, layer_neg_counts=NEG_COUNTS)
    assert not t._sparse  # movielens catalog is far below 2^20 rows


def test_sparse_with_bf16_table(pipeline):
    """sparse_embed_update composes with bf16 embedding storage: moments
    stay f32, row updates are cast to the table dtype (as dense optax does),
    training still reduces the loss."""
    import jax.numpy as jnp

    tree, samples = pipeline
    trainer = TDMTrainer(
        tree=tree, model_type="din", embed_size=8, learning_rate=3e-3,
        total_batch_size=512, layer_neg_counts=NEG_COUNTS, seed=3,
        sparse_embed_update=True, embed_dtype=jnp.bfloat16,
    )
    assert trainer.params["embedding"].dtype == jnp.bfloat16
    moments = trainer.opt_state[1]
    assert moments.get("m", moments.get("mv")).dtype == jnp.float32
    logs = trainer.train(
        samples.train_seqs, samples.train_targets, iterations=40,
        progress_interval=20,
    )
    assert trainer.params["embedding"].dtype == jnp.bfloat16
    assert logs[-1]["train_loss"] < logs[0]["train_loss"]


def test_pmv_mirror_lifecycle(pipeline):
    """pmv mode's mirror contract: train() leaves params["embedding"] synced
    with the packed state; an external assignment (checkpoint load) is
    adopted into the packed state at the next train() (moments kept);
    recommend/export read the synced mirror."""
    import jax.numpy as jnp

    from dismember_tpu.train import sparse_adam

    tree, samples = pipeline
    trainer = TDMTrainer(
        tree=tree, model_type="din", embed_size=8, learning_rate=3e-3,
        total_batch_size=512, layer_neg_counts=NEG_COUNTS, seed=5,
        sparse_embed_update=True, sparse_format="pmv", topk=5, beam_size=8,
    )
    assert trainer._pmv
    logs = trainer.train(
        samples.train_seqs, samples.train_targets, iterations=10,
        progress_interval=5,
    )
    assert all(np.isfinite(l["train_loss"]) for l in logs)
    # train() exit synced the mirror: it must equal the packed-state p lanes
    assert not trainer._mirrors_stale
    v, e = trainer.params["embedding"].shape
    np.testing.assert_array_equal(
        np.asarray(trainer.params["embedding"]),
        np.asarray(sparse_adam.pmv_unpack(trainer.opt_state[1], v, e)),
    )
    rec = trainer.recommend(samples.eval_seqs[0], topk=5)
    assert len(rec) == 5

    # external load: new table must reach the packed state on next train()
    loaded = jnp.asarray(
        np.random.default_rng(9).normal(size=(v, e)).astype(np.float32) * 0.01
    )
    old_count = int(trainer.opt_state[1]["count"])
    trainer.params["embedding"] = loaded
    trainer.train(
        samples.train_seqs, samples.train_targets, iterations=1,
        progress_interval=1,
    )
    assert int(trainer.opt_state[1]["count"]) == old_count + 1
    # the one step only touched sampled rows; untouched rows keep the
    # externally loaded values (proof the adopt reached the packed state)
    after = np.asarray(trainer.params["embedding"])
    same = np.isclose(after, np.asarray(loaded)).all(axis=1)
    assert same.sum() > v // 2
