"""Row-sharded Deep Retrieval (train/spmd_dr.py): stacked-pmv state and the
sharded E-step must reproduce the single-device pmv steps.

Reference semantics: replicated item tables + thread-clone training
(deep-retrieval/.../model/LayerModel.scala:24-27, optim/LocalOptimizer.scala)
upgraded to row-sharded tables with shard-local updates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dismember_tpu.core import mesh as meshlib
from dismember_tpu.data.dr_dataset import build_dr_data
from dismember_tpu.train import spmd_dr
from dismember_tpu.train.dr import DRTrainer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def dr_data(small_csv):
    return build_dr_data(small_csv, seq_len=10, min_seq_len=2, split_ratio=0.8)


def test_stacked_pmv_roundtrip():
    rng = np.random.default_rng(0)
    v, e, n_model = 101, 16, 8  # pads to 112 (slots=2 -> multiples of 16)
    table = jnp.asarray(rng.normal(size=(v, e)).astype(np.float32))
    assert spmd_dr.pmv_sharded_rows(v, e, n_model) == 112
    st = spmd_dr.pmv_init_sharded(jnp.pad(table, ((0, 11), (0, 0))), n_model)
    np.testing.assert_array_equal(
        np.asarray(spmd_dr.pmv_unpack_sharded(st, v, e, n_model)),
        np.asarray(table),
    )
    # refresh replaces p lanes and keeps the (zero) moments
    t2 = jnp.asarray(rng.normal(size=(112, e)).astype(np.float32))
    st2 = spmd_dr.pmv_refresh_sharded(st, t2, n_model)
    np.testing.assert_array_equal(
        np.asarray(spmd_dr.pmv_unpack_sharded(st2, 112, e, n_model)),
        np.asarray(t2),
    )
    assert st2["pmv"].shape == st["pmv"].shape


def _kwargs(dr_data, **over):
    kw = dict(
        data=dr_data, num_layers=3, num_nodes=20, num_paths_per_item=2,
        embed_size=16, learning_rate=3e-3, seed=5, num_sampled=2,
        train_batch_size=2048,
    )
    kw.update(over)
    return kw


def _batch(dr_data, tr, idx):
    seqs = jnp.asarray(dr_data.train_seqs[idx], jnp.int32)
    targets = dr_data.train_targets[idx]
    paths = jnp.asarray(tr.path_index.item_paths[targets], jnp.int32)
    labels = jnp.asarray(targets, jnp.int32)
    return seqs, paths, labels


def test_sharded_dr_matches_single_device_model_only(dr_data):
    """(1, 8) mesh: sharded layer + rerank steps equal the single-device pmv
    steps (params after sync, per-step losses) — the rerank reference uses
    fold_in(key, 0) to match the sharded per-data-shard stream."""
    mesh = meshlib.make_mesh(n_data=1, n_model=8)
    ref = DRTrainer(sparse_embed_update=True, **_kwargs(dr_data))
    sh = DRTrainer(mesh=mesh, **_kwargs(dr_data))
    assert ref._pmv and sh._pmv

    idx = np.arange(64)
    seqs, paths, labels = _batch(dr_data, ref, idx)
    key = jax.random.PRNGKey(11)
    for step in range(3):
        ref.layer_params, ref.layer_opt_state, l_r = ref._layer_step(
            ref.layer_params, ref.layer_opt_state, seqs, paths
        )
        sh.layer_params, sh.layer_opt_state, l_s = sh._layer_step(
            sh.layer_params, sh.layer_opt_state, seqs, paths
        )
        np.testing.assert_allclose(
            np.asarray(l_s), np.asarray(l_r), rtol=1e-6,
            err_msg=f"layer losses diverged at step {step}",
        )
        key, sub = jax.random.split(key)
        ref.rerank_params, ref.rerank_opt_state, r_r = ref._rerank_step(
            ref.rerank_params, ref.rerank_opt_state,
            jax.random.fold_in(sub, 0), seqs, labels,
        )
        sh.rerank_params, sh.rerank_opt_state, r_s = sh._rerank_step(
            sh.rerank_params, sh.rerank_opt_state, sub, seqs, labels
        )
        np.testing.assert_allclose(
            float(r_s), float(r_r), rtol=1e-6,
            err_msg=f"rerank loss diverged at step {step}",
        )
    ref._sync_mirrors()
    sh._sync_mirrors()
    np.testing.assert_allclose(
        np.asarray(sh.layer_params["embedding"]),
        np.asarray(ref.layer_params["embedding"]), rtol=1e-6, atol=1e-8,
    )
    for k in ("embedding", "softmax_w", "softmax_b"):
        np.testing.assert_allclose(
            np.asarray(sh.rerank_params[k]),
            np.asarray(ref.rerank_params[k]), rtol=1e-6, atol=1e-8,
            err_msg=f"rerank {k}",
        )
    for d in range(3):
        np.testing.assert_allclose(
            np.asarray(sh.layer_params["heads"][d]["weight"]),
            np.asarray(ref.layer_params["heads"][d]["weight"]),
            rtol=1e-6, atol=1e-8,
        )


def test_sharded_dr_data_and_model_mesh(dr_data):
    """(2, 4) mesh.  The layer step has no RNG, so the single-device pmv
    step on the full batch is its exact reference (the mean over the union
    equals the psum-normalized per-shard means).  The rerank step samples
    per data shard: reference = per-half negative draws with the same
    folded keys + union-batch math."""
    import optax

    from dismember_tpu.models import dr_models
    from dismember_tpu.train import sparse_adam

    mesh = meshlib.make_mesh(n_data=2, n_model=4)
    ref = DRTrainer(sparse_embed_update=True, **_kwargs(dr_data))
    sh = DRTrainer(mesh=mesh, **_kwargs(dr_data))
    n_items = dr_data.num_items
    e = 16

    idx = np.arange(64)
    seqs, paths, labels = _batch(dr_data, ref, idx)
    key = jax.random.PRNGKey(13)

    # reference rerank state mirrors the single-device trainer's
    for step in range(2):
        # --- layer: single-device pmv step IS the reference
        ref.layer_params, ref.layer_opt_state, l_r = ref._layer_step(
            ref.layer_params, ref.layer_opt_state, seqs, paths
        )
        sh.layer_params, sh.layer_opt_state, l_s = sh._layer_step(
            sh.layer_params, sh.layer_opt_state, seqs, paths
        )
        np.testing.assert_allclose(
            np.asarray(l_s), np.asarray(l_r), rtol=1e-5,
            err_msg=f"layer losses diverged at step {step}",
        )

        # --- rerank: union-batch reference with per-half folded negatives
        key, sub = jax.random.split(key)
        b = labels.shape[0]
        half = b // 2
        negs = jnp.concatenate(
            [
                dr_models.sample_negatives(
                    jax.random.fold_in(sub, di),
                    labels[di * half : (di + 1) * half], n_items, 2,
                )
                for di in range(2)
            ]
        )
        cand = jnp.concatenate(
            [labels[:, None].astype(negs.dtype), negs], axis=1
        )
        rest = {"linear": ref.rerank_params["linear"]}
        rest_opt, emb_pmv, wb_pmv = ref.rerank_opt_state
        seq_flat = seqs.reshape(-1)
        seq_valid = seq_flat >= 0
        erows = sparse_adam.pmv_gather(
            emb_pmv["pmv"], jnp.where(seq_valid, seq_flat, 0), e
        ) * seq_valid[:, None]
        wbrows = sparse_adam.pmv_gather(
            wb_pmv["pmv"], cand.reshape(-1), e + 1
        ).reshape(b, cand.shape[1], e + 1)

        def loss_fn(erows_in, wbrows_in, rest_in):
            flat = erows_in.reshape(b, -1)
            vec = (
                flat @ rest_in["linear"]["weight"].T
                + rest_in["linear"]["bias"]
            )
            logits = (
                jnp.einsum("be,bse->bs", vec, wbrows_in[..., :e])
                + wbrows_in[..., e]
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(logp[:, 0])

        r_ref, (g_e, g_wb, g_rest) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2)
        )(erows, wbrows, rest)
        updates, new_rest_opt = ref.rerank_opt.update(g_rest, rest_opt, rest)
        new_rest = optax.apply_updates(rest, updates)
        g_e = g_e * seq_valid[:, None].astype(g_e.dtype)
        new_emb = sparse_adam.pmv_apply_rows(
            emb_pmv, seq_flat, g_e, ref.learning_rate
        )
        new_wb = sparse_adam.pmv_apply_rows(
            wb_pmv, cand.reshape(-1), g_wb.reshape(-1, e + 1),
            ref.learning_rate,
        )
        ref.rerank_opt_state = (new_rest_opt, new_emb, new_wb)
        ref.rerank_params = dict(ref.rerank_params, linear=new_rest["linear"])
        ref._mirrors_stale = True

        sh.rerank_params, sh.rerank_opt_state, r_s = sh._rerank_step(
            sh.rerank_params, sh.rerank_opt_state, sub, seqs, labels
        )
        np.testing.assert_allclose(
            float(r_s), float(r_ref), rtol=1e-5,
            err_msg=f"rerank loss diverged at step {step}",
        )

    ref._sync_mirrors()
    sh._sync_mirrors()
    np.testing.assert_allclose(
        np.asarray(sh.layer_params["embedding"]),
        np.asarray(ref.layer_params["embedding"]), rtol=1e-5, atol=1e-7,
    )
    for k in ("embedding", "softmax_w", "softmax_b"):
        np.testing.assert_allclose(
            np.asarray(sh.rerank_params[k]),
            np.asarray(ref.rerank_params[k]), rtol=1e-5, atol=1e-7,
            err_msg=f"rerank {k}",
        )


def test_dr_trainer_sharded_end_to_end(dr_data):
    """DRTrainer(mesh=...): full train epoch through the sharded steps,
    mirrors sync for eval/serving, recommendations come back."""
    mesh = meshlib.make_mesh(n_data=2, n_model=4)
    tr = DRTrainer(mesh=mesh, **_kwargs(dr_data, train_batch_size=1024))
    res = tr.train(num_epochs=1)
    assert not tr._mirrors_stale
    assert np.isfinite(res[-1].rerank_loss)
    assert all(np.isfinite(x) for x in res[-1].layer_loss)
    recs = tr.recommend_batch(dr_data.eval_seqs[:4], topk=5)
    assert len(recs) == 4
    # sharded state stays row-sharded after donated steps
    spec = tr.layer_opt_state[1]["pmv"].sharding.spec
    assert spec and spec[0] == meshlib.MODEL_AXIS


def test_sharded_dr_serving_matches_unsharded(dr_data):
    """Sharded block serving (spmd_dr.make_sharded_dr_serving_fn) must
    reproduce the single-device block path exactly: same gathered block
    rows (one owner per row + psum of zeros), same shared scoring body."""
    from dismember_tpu.retrieval.dr_serve import make_dr_serving_fn
    from dismember_tpu.train import spmd_dr

    mesh = meshlib.make_mesh(n_data=2, n_model=4)
    tr = DRTrainer(sparse_embed_update=True, **_kwargs(dr_data))
    # a couple of steps so the tables aren't all at init scale
    idx = np.arange(64)
    seqs, paths, labels = _batch(dr_data, tr, idx)
    tr.layer_params, tr.layer_opt_state, _ = tr._layer_step(
        tr.layer_params, tr.layer_opt_state, seqs, paths
    )
    tr.rerank_params, tr.rerank_opt_state, _ = tr._rerank_step(
        tr.rerank_params, tr.rerank_opt_state, jax.random.PRNGKey(0),
        seqs, labels,
    )
    tr._sync_mirrors()

    ref = make_dr_serving_fn(tr, topk=10, rerank_table="block")
    sh = spmd_dr.make_sharded_dr_serving_fn(tr, mesh, topk=10)
    assert ref is not None and sh is not None

    eval_seqs = jnp.asarray(dr_data.eval_seqs[:16], jnp.int32)
    consumed = jnp.full((16, 4), -1, jnp.int32)
    consumed = consumed.at[0, 0].set(int(dr_data.eval_labels[0, 0]))
    ref_ids, ref_scores = jax.device_get(
        ref(tr.layer_params, tr.rerank_params, eval_seqs, consumed)
    )
    got_ids, got_scores = jax.device_get(
        sh(tr.layer_params, tr.rerank_params, eval_seqs, consumed)
    )
    np.testing.assert_array_equal(got_ids, ref_ids)
    np.testing.assert_allclose(got_scores, ref_scores, rtol=1e-5, atol=1e-6)
    # and without a consumed filter
    ref_ids2, _ = jax.device_get(
        ref(tr.layer_params, tr.rerank_params, eval_seqs)
    )
    got_ids2, _ = jax.device_get(
        sh(tr.layer_params, tr.rerank_params, eval_seqs)
    )
    np.testing.assert_array_equal(got_ids2, ref_ids2)
