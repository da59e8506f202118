"""Sharding tests: mesh specs, sharded train step on a virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from dismember_tpu.core import mesh as meshlib
from dismember_tpu.index.arraytree import ArrayTree
from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
from dismember_tpu.models import din
from dismember_tpu.train.sampler import TreeSampler
from dismember_tpu.train.spmd import make_sharded_train_step, padded_num_index


@pytest.fixture(scope="module")
def tiny_tree(tmp_path_factory):
    ids = np.arange(1, 33)
    cats = np.zeros(32, dtype=np.int64)
    sorted_ids, codes = category_sorted_codes(ids, cats)
    path = str(tmp_path_factory.mktemp("sp") / "tree.bin")
    write_tree(path, sorted_ids, codes)
    return ArrayTree.from_file(path)


def test_param_spec_rules():
    params = {
        "embedding": np.zeros((64, 8)),
        "mlp1": {"weight": np.zeros((8, 16)), "bias": np.zeros(8)},
    }
    spec = meshlib.param_spec(params)
    assert spec["embedding"] == P(meshlib.MODEL_AXIS, None)
    assert spec["mlp1"]["weight"] == P()
    assert spec["mlp1"]["bias"] == P()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_train_step_matches_single_device(tiny_tree):
    tree = tiny_tree
    mesh = meshlib.make_mesh(n_data=4, n_model=2)
    num_index = padded_num_index((1 << (tree.max_level + 1)) - 1, mesh)
    key = jax.random.PRNGKey(0)
    params = din.init_params(key, num_index, 16)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    sampler = TreeSampler.build(tree, "0,1,2,3,4,5", start_level=1)

    b = 8
    rng = np.random.default_rng(0)
    target_codes = jnp.asarray(rng.choice(tree.item_codes, b).astype(np.int32))
    seq_codes = jnp.asarray(
        tree.ids_to_codes(rng.integers(1, 33, size=(b, 10)))
    )
    kk = jax.random.PRNGKey(1)

    # single-device reference step with identical RNG (computed first: the
    # sharded step donates its buffers)
    from dismember_tpu.models.losses import bce_with_logits

    codes, labels, weights = sampler.sample(kk, target_codes)

    def loss_fn(p):
        return bce_with_logits(din.forward(p, codes, seq_codes), labels, weights)

    expected_loss, grads = jax.value_and_grad(loss_fn)(params)
    params_host = jax.device_get(params)

    step, sh_params, sh_opt = make_sharded_train_step(
        din.forward, sampler, optimizer, mesh, params, opt_state
    )
    new_params, new_opt, loss = step(sh_params, sh_opt, kk, target_codes, seq_codes)
    assert np.isfinite(float(loss))

    # embedding stays row-sharded over 'model'
    emb_shard = new_params["embedding"].sharding
    assert emb_shard.spec == P(meshlib.MODEL_AXIS, None)
    params = jax.tree.map(jnp.asarray, params_host)
    np.testing.assert_allclose(float(loss), float(expected_loss), rtol=1e-5)

    # parameters after one step match the unsharded update
    updates, _ = optimizer.update(grads, optimizer.init(params), params)
    expected_params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(
        np.asarray(new_params["mlp1"]["weight"]),
        np.asarray(expected_params["mlp1"]["weight"]),
        rtol=2e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new_params["embedding"]),
        np.asarray(expected_params["embedding"]),
        rtol=2e-4, atol=1e-6,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_beam_matches_unsharded(tiny_tree):
    """Row-sharded table + data-sharded batch must reproduce the single-
    device beam search exactly."""
    from dismember_tpu.models import din as din_mod
    from dismember_tpu.retrieval.tree_beam import make_beam_fn
    from dismember_tpu.train.spmd import make_sharded_beam_fn

    tree = tiny_tree
    mesh = meshlib.make_mesh(n_data=4, n_model=2)
    num_index = (1 << (tree.max_level + 1)) - 1
    params = din_mod.init_params(jax.random.PRNGKey(0), num_index, 16)

    rng = np.random.default_rng(1)
    seqs = tree.ids_to_codes(rng.integers(1, 33, size=(8, 10)))

    ref_fn = make_beam_fn(
        din_mod.forward, tree, 4,
        precompute=din_mod.precompute_seq, apply=din_mod.apply_with_ctx,
    )
    ref_ids, ref_scores = jax.device_get(ref_fn(params, jnp.asarray(seqs)))

    sh_fn, sh_params = make_sharded_beam_fn(
        din_mod.forward, tree, 4, mesh, params,
        precompute=din_mod.precompute_seq, apply=din_mod.apply_with_ctx,
    )
    got_ids, got_scores = jax.device_get(sh_fn(sh_params, jnp.asarray(seqs)))
    np.testing.assert_array_equal(got_ids, ref_ids)
    np.testing.assert_allclose(got_scores, ref_scores, rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_trainer_with_mesh(tiny_tree):
    """TDMTrainer(mesh=...) trains via the SPMD step and serves correctly."""
    from dismember_tpu.train.tdm import TDMTrainer

    tree = tiny_tree
    mesh = meshlib.make_mesh(n_data=4, n_model=2)
    tr = TDMTrainer(
        tree=tree, model_type="din", embed_size=8, learning_rate=3e-3,
        total_batch_size=512, layer_neg_counts="0,1,2,3,4,5", topk=5,
        beam_size=8, mesh=mesh,
    )
    assert tr.num_targets_per_batch % 4 == 0
    rng = np.random.default_rng(0)
    seqs = rng.integers(1, 33, size=(64, 10))
    targets = rng.integers(1, 33, size=64)
    logs = tr.train(seqs, targets, iterations=8, progress_interval=4)
    assert all(np.isfinite(l["train_loss"]) for l in logs)
    rec = tr.recommend(seqs[0], topk=5)
    assert len(rec) == 5


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_packed_beam_matches_unsharded(tiny_tree):
    """Deep-catalog serving sharding: the packed pair table row-sharded on
    'model' must reproduce the single-device hybrid beam exactly."""
    from dismember_tpu.retrieval.packed_beam import (
        make_hybrid_beam_fn,
        make_packed_tree,
    )
    from dismember_tpu.train.spmd import make_sharded_packed_beam_fn

    tree = tiny_tree
    mesh = meshlib.make_mesh(n_data=4, n_model=2)
    num_index = (1 << (tree.max_level + 1)) - 1
    params = din.init_params(jax.random.PRNGKey(0), num_index, 16)
    packed = make_packed_tree(tree, params["embedding"], beam=4)

    rng = np.random.default_rng(1)
    seqs = tree.ids_to_codes(rng.integers(1, 33, size=(8, 10)))

    ref_fn = make_hybrid_beam_fn(packed, din.precompute_seq, din.apply_from_emb)
    ref_ids, ref_scores = jax.device_get(ref_fn(params, jnp.asarray(seqs)))

    sh_fn = make_sharded_packed_beam_fn(
        packed, mesh, din.precompute_seq, din.apply_from_emb
    )
    got_ids, got_scores = jax.device_get(sh_fn(params, jnp.asarray(seqs)))
    np.testing.assert_array_equal(got_ids, ref_ids)
    np.testing.assert_allclose(got_scores, ref_scores, rtol=1e-5, atol=1e-6)
