"""Sharded lazy row-sparse Adam (train/spmd_sparse.py): the table + Adam
state row-sharded on 'model' must reproduce the single-device sparse step.

Reference semantics being composed: slice-parallel Adam
(scalann optim/ParallelAdam.scala:42-76) x data-parallel grad mean
(tdm optim/LocalOptimizer.scala:164-187).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dismember_tpu.core import mesh as meshlib
from dismember_tpu.index.arraytree import ArrayTree
from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
from dismember_tpu.models import din
from dismember_tpu.train import sparse_adam, spmd_sparse
from dismember_tpu.train.tdm import TDMTrainer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def tiny_tree(tmp_path_factory):
    ids = np.arange(1, 33)
    cats = np.zeros(32, dtype=np.int64)
    sorted_ids, codes = category_sorted_codes(ids, cats)
    path = str(tmp_path_factory.mktemp("sps") / "tree.bin")
    write_tree(path, sorted_ids, codes)
    return ArrayTree.from_file(path)


def test_state_geometry():
    # e=16 packs 4 logical rows per 128-lane physical row
    st = spmd_sparse.sharded_state_zeros(64, 16, 8)
    assert st["mv"].shape == (8 * (64 // 8 // 4 + 1), 128)
    m, v = spmd_sparse.state_moments(st, 64, 16, 8)
    assert m.shape == (64, 16) and (m == 0).all() and (v == 0).all()
    # e=48 can't pack -> split m/v with the table's own sharding shape
    st = spmd_sparse.sharded_state_zeros(64, 48, 8)
    assert st["m"].shape == (64, 48) and st["v"].shape == (64, 48)
    assert spmd_sparse.sparse_padded_rows(63, _mesh(1, 8), 16) == 64
    assert spmd_sparse.sparse_padded_rows(65, _mesh(1, 8), 16) == 96


def _mesh(n_data, n_model):
    return meshlib.make_mesh(n_data=n_data, n_model=n_model)


def _batch(tree, rng, b):
    target_codes = jnp.asarray(rng.choice(tree.item_codes, b).astype(np.int32))
    seq_codes = jnp.asarray(tree.ids_to_codes(rng.integers(1, 33, size=(b, 10))))
    return target_codes, seq_codes


def test_sharded_sparse_matches_single_device_model_only(tiny_tree):
    """(1, 8) mesh: the batch is unsharded, so the sharded step must equal
    the single-chip sparse train step exactly — table, moments, dense tower
    and loss — across several steps (the sharded sampler folds the key with
    data index 0, so the reference uses fold_in(key, 0))."""
    tree = tiny_tree
    mesh = _mesh(1, 8)
    tr = TDMTrainer(
        tree=tree, embed_size=16, layer_neg_counts="0,1,2,3,4,5",
        total_batch_size=512, sparse_embed_update=True, sparse_format="mv",
    )
    assert tr._sparse
    v_pad = spmd_sparse.sparse_padded_rows(
        (1 << (tree.max_level + 1)) - 1, mesh, 16
    )
    params = din.init_params(jax.random.PRNGKey(3), v_pad, 16)
    rest = {k: v for k, v in params.items() if k != "embedding"}
    tr.params = jax.tree.map(jnp.array, params)
    tr.opt_state = (
        tr.optimizer.init(rest),
        sparse_adam.init_state(tr.params["embedding"]),
    )

    step, sh_params, sh_opt = spmd_sparse.make_sharded_sparse_train_step(
        "din", tr.sampler, tr.optimizer, mesh,
        jax.tree.map(jnp.array, params), tr.learning_rate,
    )
    assert sh_params["embedding"].sharding.spec == jax.sharding.PartitionSpec(
        meshlib.MODEL_AXIS, None
    )

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(7)
    for i in range(3):
        target_codes, seq_codes = _batch(tree, rng, 8)
        key, sub = jax.random.split(key)
        tr.params, tr.opt_state, loss_ref = tr._train_step(
            tr.params, tr.opt_state, jax.random.fold_in(sub, 0),
            target_codes, seq_codes,
        )
        sh_params, sh_opt, loss_sh = step(
            sh_params, sh_opt, sub, target_codes, seq_codes
        )
        np.testing.assert_allclose(
            float(loss_sh), float(loss_ref), rtol=1e-6,
            err_msg=f"loss diverged at step {i}",
        )
    np.testing.assert_allclose(
        np.asarray(sh_params["embedding"]),
        np.asarray(tr.params["embedding"]), rtol=1e-6, atol=1e-8,
    )
    for k in ("att_linear", "mlp1", "mlp2"):
        for kk, val in tr.params[k].items():
            np.testing.assert_allclose(
                np.asarray(sh_params[k][kk]), np.asarray(val),
                rtol=1e-6, atol=1e-8, err_msg=f"{k}/{kk}",
            )
    m_sh, v_sh = spmd_sparse.state_moments(sh_opt[1], v_pad, 16, 8)
    m_ref, v_ref = spmd_sparse.state_moments(tr.opt_state[1], v_pad, 16, 1)
    np.testing.assert_allclose(m_sh, m_ref, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(v_sh, v_ref, rtol=1e-6, atol=1e-12)


def test_sharded_sparse_data_and_model_mesh(tiny_tree):
    """(2, 4) mesh: per-data-shard sampling streams + global weighted-mean
    gradients.  Reference: sample each data shard's slice with the same
    folded keys, concatenate, and run the single-device sparse math on the
    union batch (the weighted-mean loss over the union is exactly the
    psum-normalized sharded loss)."""
    import optax

    from dismember_tpu.constants import PADDING_IDX
    from dismember_tpu.models.losses import bce_with_logits

    tree = tiny_tree
    n_data, n_model = 2, 4
    mesh = _mesh(n_data, n_model)
    from dismember_tpu.train.sampler import TreeSampler

    sampler = TreeSampler.build(tree, "0,1,2,3,4,5", start_level=1)
    v_pad = spmd_sparse.sparse_padded_rows(
        (1 << (tree.max_level + 1)) - 1, mesh, 16
    )
    params = din.init_params(jax.random.PRNGKey(3), v_pad, 16)
    optimizer = optax.adam(1e-3, b1=0.9, b2=0.999, eps=1e-8)
    lr = 1e-3

    # reference state (single device)
    ref_params = jax.tree.map(jnp.array, params)
    ref_state = sparse_adam.init_state(ref_params["embedding"])
    ref_rest = {k: v for k, v in ref_params.items() if k != "embedding"}
    ref_rest_opt = optimizer.init(ref_rest)

    step, sh_params, sh_opt = spmd_sparse.make_sharded_sparse_train_step(
        "din", sampler, optimizer, mesh, jax.tree.map(jnp.array, params), lr
    )

    rng = np.random.default_rng(1)
    b = 8
    key = jax.random.PRNGKey(9)
    for i in range(3):
        target_codes, seq_codes = _batch(tree, rng, b)
        key, sub = jax.random.split(key)

        # --- reference: per-shard sampling, union-batch sparse step
        bs = b // n_data
        parts = [
            sampler.sample(
                jax.random.fold_in(sub, di),
                target_codes[di * bs : (di + 1) * bs],
            )
            for di in range(n_data)
        ]
        codes = jnp.concatenate([p[0] for p in parts])
        labels = jnp.concatenate([p[1] for p in parts])
        weights = jnp.concatenate([p[2] for p in parts])
        table = ref_params["embedding"]
        bb, u = codes.shape
        l = seq_codes.shape[1]
        flat = jnp.concatenate([codes.reshape(-1), seq_codes.reshape(-1)])
        valid = flat != PADDING_IDX
        rows = table[jnp.where(valid, flat, 0)] * valid[:, None].astype(
            table.dtype
        )
        pad = (seq_codes == PADDING_IDX)[:, None, :]

        def loss_fn(rows_in, rest_in):
            p = dict(rest_in, embedding=jnp.zeros((1, 16), rows_in.dtype))
            item_e = rows_in[: bb * u].reshape(bb, u, -1)
            seq_e = rows_in[bb * u :].reshape(bb, l, -1)
            ctx = din.ctx_from_seq_emb(p, seq_e, pad)
            logits = din.apply_from_emb(p, item_e, ctx)
            return bce_with_logits(logits, labels, weights)

        loss_ref, (g_rows, g_rest) = jax.value_and_grad(
            loss_fn, argnums=(0, 1)
        )(rows, ref_rest)
        updates, ref_rest_opt = optimizer.update(g_rest, ref_rest_opt, ref_rest)
        ref_rest = optax.apply_updates(ref_rest, updates)
        g_rows = g_rows * valid[:, None].astype(g_rows.dtype)
        new_table, ref_state = sparse_adam.apply_rows(
            table, ref_state, flat, g_rows, lr
        )
        ref_params = dict(ref_rest, embedding=new_table)

        # --- sharded
        sh_params, sh_opt, loss_sh = step(
            sh_params, sh_opt, sub, target_codes, seq_codes
        )
        np.testing.assert_allclose(
            float(loss_sh), float(loss_ref), rtol=1e-6,
            err_msg=f"loss diverged at step {i}",
        )

    np.testing.assert_allclose(
        np.asarray(sh_params["embedding"]),
        np.asarray(ref_params["embedding"]), rtol=1e-6, atol=1e-8,
    )
    m_sh, v_sh = spmd_sparse.state_moments(sh_opt[1], v_pad, 16, n_model)
    m_ref, v_ref = spmd_sparse.state_moments(ref_state, v_pad, 16, 1)
    np.testing.assert_allclose(m_sh, m_ref, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(v_sh, v_ref, rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(sh_params["mlp1"]["weight"]),
        np.asarray(ref_params["mlp1"]["weight"]), rtol=1e-6, atol=1e-8,
    )


def test_trainer_sharded_sparse_end_to_end(tiny_tree):
    """TDMTrainer(mesh=..., sparse_embed_update=True): trains through the
    sharded sparse step, serves, and the table stays row-sharded."""
    tree = tiny_tree
    mesh = _mesh(2, 4)
    tr = TDMTrainer(
        tree=tree, model_type="din", embed_size=8, learning_rate=3e-3,
        total_batch_size=512, layer_neg_counts="0,1,2,3,4,5", topk=5,
        beam_size=8, mesh=mesh, sparse_embed_update=True,
    )
    assert tr._sparse
    assert tr.params["embedding"].sharding.spec == jax.sharding.PartitionSpec(
        meshlib.MODEL_AXIS, None
    )
    rng = np.random.default_rng(0)
    seqs = rng.integers(1, 33, size=(64, 10))
    targets = rng.integers(1, 33, size=64)
    logs = tr.train(seqs, targets, iterations=8, progress_interval=4)
    assert all(np.isfinite(l["train_loss"]) for l in logs)
    # table still sharded after donated-buffer steps
    assert tr.params["embedding"].sharding.spec == jax.sharding.PartitionSpec(
        meshlib.MODEL_AXIS, None
    )
    rec = tr.recommend(seqs[0], topk=5)
    assert len(rec) == 5
