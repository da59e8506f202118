"""Sharded sparse OTM (spmd_sparse.make_sharded_sparse_otm_train_batch):
the scan-carried row-sharded table + lazy-Adam state must reproduce the
single-chip sparse whole-batch dispatch.

Reference semantics being composed: slice-parallel Adam
(scalann optim/ParallelAdam.scala:42-76) x OTM's sequential per-level steps
(otm/.../optim/LocalOptimizer.scala:55-130).  OTM has no sampling RNG, so
parity holds on MIXED data x model meshes too (unlike TDM, whose per-data-
shard negative sampling streams differ by construction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dismember_tpu.core import mesh as meshlib
from dismember_tpu.data.otm_dataset import OTMData
from dismember_tpu.train import sparse_adam, spmd_sparse
from dismember_tpu.train.otm import OTMTrainer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _make_data(n_items=24, leaf_level=5, L=8, n_rows=64, seed=2):
    rng = np.random.default_rng(seed)
    leaf_lo = (1 << leaf_level) - 1
    item_to_code = {i + 1: leaf_lo + i for i in range(n_items)}
    n_nodes = (1 << (leaf_level + 1)) - 1
    all_nodes = np.zeros(n_nodes, bool)
    for c in item_to_code.values():
        while c >= 0:
            all_nodes[c] = True
            c = (c - 1) >> 1
    codes = np.asarray(list(item_to_code.values()))
    seqs = codes[rng.integers(0, n_items, size=(n_rows, L))]
    seqs[rng.random(size=seqs.shape) < 0.2] = -1
    labels = codes[rng.integers(0, n_items, size=(n_rows, 2))]
    return OTMData(
        item_to_code=item_to_code,
        code_to_item={v: k for k, v in item_to_code.items()},
        leaf_level=leaf_level,
        num_items=n_items,
        all_nodes=all_nodes,
        train_seqs=seqs.astype(np.int64),
        train_labels=labels.astype(np.int64),
        train_users=np.zeros(n_rows, np.int64),
        eval_seqs=seqs[:4].astype(np.int64),
        eval_labels=labels[:4].astype(np.int64),
        eval_users=np.zeros(4, np.int64),
        user_consumed={},
        label_num=2,
    ), seqs, labels


def _moments(state, rows, e):
    """(m, v) [rows, E] from a single-chip sparse_adam state (split or
    packed m|v with ceil-division physical rows)."""
    if "m" in state:
        return np.asarray(state["m"])[:rows], np.asarray(state["v"])[:rows]
    s = 128 // (2 * e)
    mv = np.asarray(state["mv"])[:-1].reshape(-1, 2 * e)[:rows]
    return mv[:, :e], mv[:, e:]


def _run_parity(n_data, n_model, target_mode="pseudo"):
    data, seqs, labels = _make_data()
    mesh = meshlib.make_mesh(n_data=n_data, n_model=n_model)
    kwargs = dict(
        data=data, embed_size=16, beam_size=4, total_train_batch_size=512,
        seq_len=8, sparse_embed_update=True, target_mode=target_mode, seed=11,
    )
    # single-chip twin pinned to the mv format (the sharded scan state is
    # mv-layout; pmv's different storage rounding is 1-ulp off)
    ref = OTMTrainer(sparse_format="mv", **kwargs)
    sh = OTMTrainer(mesh=mesh, **kwargs)
    assert ref._sparse and sh._sparse and not ref._pmv
    assert sh.params["embedding"].sharding.spec == jax.sharding.PartitionSpec(
        meshlib.MODEL_AXIS, None
    )
    rows = data.num_tree_nodes
    e = 16
    sj = jnp.asarray(seqs, jnp.int32)
    tj = jnp.asarray(labels, jnp.int32)
    for i in range(3):
        ref.params, ref.opt_state, l_ref = ref._train_batch(
            ref.params, ref.opt_state, sj, tj
        )
        sh.params, sh.opt_state, l_sh = sh._train_batch(
            sh.params, sh.opt_state, sj, tj
        )
        np.testing.assert_allclose(
            np.asarray(l_sh), np.asarray(l_ref), rtol=1e-6,
            err_msg=f"level losses diverged at batch {i}",
        )
    np.testing.assert_allclose(
        np.asarray(sh.params["embedding"])[:rows],
        np.asarray(ref.params["embedding"]), rtol=1e-6, atol=1e-8,
    )
    for k in ("att_linear", "mlp1", "mlp2"):
        for kk, val in ref.params[k].items():
            np.testing.assert_allclose(
                np.asarray(sh.params[k][kk]), np.asarray(val),
                rtol=1e-6, atol=1e-8, err_msg=f"{k}/{kk}",
            )
    v_pad = sh.params["embedding"].shape[0]
    m_sh, v_sh = spmd_sparse.state_moments(sh.opt_state[1], v_pad, e, n_model)
    m_ref, v_ref = _moments(ref.opt_state[1], rows, e)
    np.testing.assert_allclose(m_sh[:rows], m_ref, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(v_sh[:rows], v_ref, rtol=1e-6, atol=1e-12)


def test_sharded_otm_sparse_model_only():
    """(1, 8) mesh: unsharded batch — exact twin of the single-chip sparse
    scan (table, moments, dense tower, per-level losses)."""
    _run_parity(1, 8)


def test_sharded_otm_sparse_mixed_mesh():
    """(2, 4) mesh: data-sharded batch.  No RNG in the OTM batch, the
    all-gather preserves single-device flat row order and the loss is
    psum-normalized globally, so mixed-mesh parity is exact too."""
    _run_parity(2, 4)


def test_sharded_otm_sparse_normal_targets():
    """Ancestor-target mode through the same sharded scan."""
    _run_parity(2, 4, target_mode="normal")


def test_trainer_mesh_sparse_end_to_end():
    """OTMTrainer(mesh=...) trains through the sharded sparse scan, the
    table stays row-sharded across donated steps, and serving works."""
    data, _seqs, _labels = _make_data(n_rows=70)
    mesh = meshlib.make_mesh(n_data=2, n_model=4)
    tr = OTMTrainer(
        data, embed_size=16, beam_size=4, total_train_batch_size=64,
        seq_len=8, sparse_embed_update=True, mesh=mesh, seed=5,
    )
    assert tr.train_batch_size % 2 == 0
    logs = tr.train(num_epochs=1)
    assert all(np.isfinite(x) for x in logs[0]["level_losses"])
    assert tr.params["embedding"].sharding.spec == jax.sharding.PartitionSpec(
        meshlib.MODEL_AXIS, None
    )
    recs = tr.recommend_batch(data.eval_seqs[:2], topk=3)
    assert all(len(r) == 3 for r in recs)


def test_dense_mesh_path_still_routes():
    """sparse=False keeps the dense GSPMD whole-batch path (spmd.py)."""
    data, seqs, labels = _make_data()
    mesh = meshlib.make_mesh(n_data=2, n_model=4)
    kwargs = dict(
        data=data, embed_size=8, beam_size=4, total_train_batch_size=512,
        seq_len=8, sparse_embed_update=False, seed=11,
    )
    ref = OTMTrainer(**kwargs)
    sh = OTMTrainer(mesh=mesh, **kwargs)
    assert not sh._sparse
    sj = jnp.asarray(seqs, jnp.int32)
    tj = jnp.asarray(labels, jnp.int32)
    ref.params, ref.opt_state, l_ref = ref._train_batch(
        ref.params, ref.opt_state, sj, tj
    )
    sh.params, sh.opt_state, l_sh = sh._train_batch(
        sh.params, sh.opt_state, sj, tj
    )
    np.testing.assert_allclose(np.asarray(l_sh), np.asarray(l_ref), rtol=1e-5)
