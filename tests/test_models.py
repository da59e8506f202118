"""Model forward-pass tests: shapes, padding semantics, grouped == per-row."""

import jax
import jax.numpy as jnp
import numpy as np

from dismember_tpu.models import deepfm, din
from dismember_tpu.models.embedding import embed_lookup
from dismember_tpu.models.losses import bce_with_logits, cross_entropy


def test_embed_padding_zero_and_no_grad():
    table = jnp.ones((10, 4))
    idx = jnp.array([[0, -1, 3]])
    out = embed_lookup(table, idx)
    np.testing.assert_array_equal(np.asarray(out[0, 1]), np.zeros(4))
    np.testing.assert_array_equal(np.asarray(out[0, 0]), np.ones(4))

    def loss(t):
        return jnp.sum(embed_lookup(t, idx))

    g = jax.grad(loss)(table)
    # padded row received no gradient anywhere; rows 0 and 3 did
    assert float(jnp.abs(g).sum()) > 0
    # gradient of whichever row -1 would alias (row 0 via clamp) only gets
    # the contribution from the real index 0 occurrence
    np.testing.assert_array_equal(np.asarray(g[0]), np.ones(4))


def test_din_shapes_and_grouped_consistency():
    key = jax.random.PRNGKey(0)
    params = din.init_params(key, num_index=31, embed_size=8)
    b, u, l = 3, 5, 4
    items = jax.random.randint(key, (b, u), 0, 31)
    seqs = jax.random.randint(key, (b, l), -1, 31)
    out = din.forward(params, items, seqs)
    assert out.shape == (b, u)
    # grouped forward must equal scoring each candidate alone
    for j in range(u):
        single = din.forward(params, items[:, j : j + 1], seqs)
        np.testing.assert_allclose(np.asarray(single[:, 0]), np.asarray(out[:, j]), rtol=1e-5)


def test_din_padding_mask_excludes_position():
    key = jax.random.PRNGKey(1)
    params = din.init_params(key, num_index=31, embed_size=8)
    items = jnp.array([[3]])
    seq_a = jnp.array([[1, 2, -1]])
    seq_b = jnp.array([[1, 2, -1]])
    out_a = din.forward(params, items, seq_a)
    out_b = din.forward(params, items, seq_b)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b))
    # changing a *masked* position's id must not change the output
    seq_c = jnp.array([[1, 2, 7]])
    out_c = din.forward(params, items, seq_c)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_c))


def test_deepfm_matches_reference_fm_formula():
    key = jax.random.PRNGKey(2)
    e, l = 8, 4
    params = deepfm.init_params(key, num_index=31, embed_size=e, seq_len=l)
    items = jnp.array([[5, 9]])
    seqs = jnp.array([[1, 2, 3, 4]])
    out = deepfm.forward(params, items, seqs)
    assert out.shape == (1, 2)

    # hand-compute for candidate 0
    table = params["embedding"]
    vecs = jnp.concatenate([table[jnp.array([5])], table[seqs[0]]], axis=0)  # [L+1, E]
    s = jnp.sum(vecs, axis=0)
    fm = 0.5 * (jnp.dot(s, s) - jnp.sum(vecs * vecs))
    flat = vecs.reshape(-1)
    h = jax.nn.relu(flat @ params["mlp1"]["weight"].T + params["mlp1"]["bias"])
    dnn = h @ params["mlp2"]["weight"].T + params["mlp2"]["bias"]
    np.testing.assert_allclose(float(out[0, 0]), float(fm + dnn[0]), rtol=1e-4)


def test_bce_with_logits_reference_formula():
    logits = jnp.array([0.5, -1.2, 3.0])
    targets = jnp.array([1.0, 0.0, 1.0])
    got = float(bce_with_logits(logits, targets))
    x, z = np.array(logits), np.array(targets)
    expected = np.mean(np.maximum(x, 0) - x * z + np.log1p(np.exp(-np.abs(x))))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_bce_weights_mask():
    logits = jnp.array([[1.0, 99.0]])
    targets = jnp.array([[1.0, 0.0]])
    w = jnp.array([[1.0, 0.0]])
    got = float(bce_with_logits(logits, targets, w))
    expected = float(bce_with_logits(jnp.array([1.0]), jnp.array([1.0])))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_cross_entropy():
    logits = jnp.array([[2.0, 1.0, 0.0], [0.0, 0.0, 5.0]])
    labels = jnp.array([0, 2])
    got = float(cross_entropy(logits, labels))
    expected = -np.mean(
        [
            np.log(np.exp(2.0) / np.exp([2.0, 1.0, 0.0]).sum()),
            np.log(np.exp(5.0) / np.exp([0.0, 0.0, 5.0]).sum()),
        ]
    )
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_din_precompute_apply_equivalence():
    key = jax.random.PRNGKey(3)
    from dismember_tpu.models.din import apply_with_ctx, precompute_seq

    params = din.init_params(key, 63, 8)
    items = jax.random.randint(key, (4, 6), -1, 63)
    seqs = jax.random.randint(key, (4, 5), -1, 63)
    ref = din.forward(params, items, seqs)
    got = apply_with_ctx(params, items, precompute_seq(params, seqs))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


def test_deepfm_precompute_apply_equivalence():
    key = jax.random.PRNGKey(4)
    from dismember_tpu.models.deepfm import apply_with_ctx, precompute_seq

    params = deepfm.init_params(key, 63, 8, 5)
    items = jax.random.randint(key, (4, 6), -1, 63)
    seqs = jax.random.randint(key, (4, 5), -1, 63)
    ref = deepfm.forward(params, items, seqs)
    got = apply_with_ctx(params, items, precompute_seq(params, seqs))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_compute_metrics_batch_matches_scalar():
    from dismember_tpu.core.metrics import compute_metrics, compute_metrics_batch

    rng = np.random.default_rng(0)
    B, K, L = 50, 10, 7
    rec = rng.integers(0, 30, size=(B, K))
    # -1 padding is a suffix (rank positions are meaningful), as produced by
    # filter_topk / the device serving paths
    n_valid = rng.integers(1, K + 1, size=B)
    for i in range(B):
        rec[i, n_valid[i]:] = -1
    labels = rng.integers(0, 30, size=(B, L))
    labels[rng.random((B, L)) < 0.3] = -1
    p, r, nd = compute_metrics_batch(rec, labels)
    for i in range(B):
        row_rec = rec[i][rec[i] >= 0]
        ps, rs, ns = compute_metrics(row_rec, labels[i])
        np.testing.assert_allclose(p[i], ps, rtol=1e-9)
        np.testing.assert_allclose(r[i], rs, rtol=1e-9)
        np.testing.assert_allclose(nd[i], ns, rtol=1e-9)
