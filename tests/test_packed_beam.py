"""Packed pair-table beam search: parity with the classic loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dismember_tpu.index.arraytree import ArrayTree
from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
from dismember_tpu.models import deepfm, din
from dismember_tpu.retrieval.packed_beam import (
    build_pair_table,
    make_packed_beam_fn,
    make_packed_tree,
)
from dismember_tpu.retrieval.tree_beam import make_beam_fn


@pytest.fixture(scope="module", params=[16, 47])
def tree(tmp_path_factory, request):
    # 47 items gives an incomplete bottom level (dead slots to mask)
    n = request.param
    ids = np.arange(1, n + 1)
    cats = np.repeat(np.arange((n + 9) // 10), 10)[:n]
    sorted_ids, codes = category_sorted_codes(ids, cats)
    path = str(tmp_path_factory.mktemp("pb") / f"tree{n}.bin")
    write_tree(path, sorted_ids, codes)
    return ArrayTree.from_file(path)


def _seqs(tree, batch=5, seed=0):
    rng = np.random.default_rng(seed)
    raw = rng.choice(tree.item_ids, size=(batch, 6))
    raw[0, 3:] = 0  # padding rows
    return jnp.asarray(tree.ids_to_codes(raw))


def test_pair_table_contents(tree):
    num_index = tree.total_codes
    params = din.init_params(jax.random.PRNGKey(0), num_index, 8)
    table = np.asarray(build_pair_table(
        params["embedding"], tree.node_exists, tree.node_id, tree.total_codes
    ))
    emb = np.asarray(params["embedding"])
    n_pairs = (tree.total_codes - 1) // 2
    assert table.shape[1] == 128  # 2*8+6 = 22 used lanes, padded to 128
    for c in [0, 1, 2, n_pairs - 1]:
        np.testing.assert_array_equal(table[c, :8], emb[2 * c + 1])
        np.testing.assert_array_equal(table[c, 8:16], emb[2 * c + 2])
        assert table[c, 16] == float(tree.node_exists[2 * c + 1])
        assert table[c, 17] == float(tree.node_exists[2 * c + 2])
        hi_l, lo_l, hi_r, lo_r = table[c, 18:22]
        got_ids = np.array([hi_l * 4096 + lo_l, hi_r * 4096 + lo_r], np.int64)
        np.testing.assert_array_equal(
            got_ids, tree.node_id[[2 * c + 1, 2 * c + 2]]
        )
        np.testing.assert_array_equal(table[c, 22:], 0.0)


@pytest.mark.parametrize("beam", [1, 4, 8])
def test_packed_matches_classic_din(tree, beam):
    num_index = tree.total_codes
    params = din.init_params(jax.random.PRNGKey(2), num_index, 8)
    classic = make_beam_fn(
        din.forward, tree, beam=beam,
        precompute=din.precompute_seq, apply=din.apply_with_ctx,
    )
    packed = make_packed_tree(tree, params["embedding"], beam=beam)
    packed_fn = make_packed_beam_fn(
        packed, din.precompute_seq, din.apply_from_emb
    )
    seqs = _seqs(tree)
    ids_c, sc_c = jax.device_get(classic(params, seqs))
    ids_p, sc_p = jax.device_get(packed_fn(params, seqs))
    np.testing.assert_array_equal(ids_p, ids_c)
    alive = ids_c >= 0
    np.testing.assert_allclose(sc_p[alive], sc_c[alive], rtol=1e-6)


def test_packed_matches_classic_deepfm(tree):
    num_index = tree.total_codes
    params = deepfm.init_params(jax.random.PRNGKey(3), num_index, 8, seq_len=6)
    classic = make_beam_fn(
        deepfm.forward, tree, beam=4,
        precompute=deepfm.precompute_seq, apply=deepfm.apply_with_ctx,
    )
    packed = make_packed_tree(tree, params["embedding"], beam=4)
    packed_fn = make_packed_beam_fn(
        packed, deepfm.precompute_seq, deepfm.apply_from_emb
    )
    seqs = _seqs(tree, seed=7)
    ids_c, sc_c = jax.device_get(classic(params, seqs))
    ids_p, sc_p = jax.device_get(packed_fn(params, seqs))
    np.testing.assert_array_equal(ids_p, ids_c)
    alive = ids_c >= 0
    np.testing.assert_allclose(sc_p[alive], sc_c[alive], rtol=1e-6)


@pytest.mark.parametrize("beam", [1, 4])
def test_stride2_matches_classic(tree, beam):
    """Stride-2 subtree loop (one gather per two levels, incl. the odd-depth
    lead-in) returns the same items as the classic loop."""
    from dismember_tpu.retrieval.packed_beam import (
        make_stride2_beam_fn,
        make_subtree_tree,
    )

    num_index = tree.total_codes
    params = din.init_params(jax.random.PRNGKey(6), num_index, 8)
    classic = make_beam_fn(
        din.forward, tree, beam=beam,
        precompute=din.precompute_seq, apply=din.apply_with_ctx,
    )
    st = make_subtree_tree(tree, params["embedding"], beam=beam)
    stride_fn = make_stride2_beam_fn(st, din.precompute_seq, din.apply_from_emb)
    seqs = _seqs(tree, seed=11)
    ids_c, sc_c = jax.device_get(classic(params, seqs))
    ids_p, sc_p = jax.device_get(stride_fn(params, seqs))
    np.testing.assert_array_equal(ids_p, ids_c)
    alive = ids_c >= 0
    np.testing.assert_allclose(sc_p[alive], sc_c[alive], rtol=1e-6)


@pytest.mark.parametrize("beam", [4, 8])
def test_pallas_level_body_matches_classic(tree, beam):
    """Packed beam with the fused Pallas level body (interpret mode on CPU)
    returns the same items; scores agree to float tolerance (the kernel's
    f32 MXU matmuls vs XLA's default-precision einsums)."""
    from dismember_tpu.retrieval.packed_beam import make_packed_beam_fn_pallas

    num_index = tree.total_codes
    params = din.init_params(jax.random.PRNGKey(8), num_index, 16)
    classic = make_beam_fn(
        din.forward, tree, beam=beam,
        precompute=din.precompute_seq, apply=din.apply_with_ctx,
    )
    try:
        packed = make_packed_tree(tree, params["embedding"], beam=beam)
    except ValueError:
        pytest.skip("tree too small for this beam")
    pallas_fn = make_packed_beam_fn_pallas(packed, tile_b=4, interpret=True)
    seqs = _seqs(tree, seed=13)
    ids_c, sc_c = jax.device_get(classic(params, seqs))
    ids_p, sc_p = jax.device_get(pallas_fn(params, seqs))
    # kernel emits block order (left|right children) vs classic interleave:
    # compare as id-sorted (id, score) sets per row
    for i in range(len(ids_c)):
        ac, ap = ids_c[i] >= 0, ids_p[i] >= 0
        order_c, order_p = np.argsort(ids_c[i][ac]), np.argsort(ids_p[i][ap])
        np.testing.assert_array_equal(
            ids_p[i][ap][order_p], ids_c[i][ac][order_c])
        np.testing.assert_allclose(
            sc_p[i][ap][order_p], sc_c[i][ac][order_c],
            rtol=2e-4, atol=1e-5)


def test_subtree_table_contents(tree):
    from dismember_tpu.retrieval.packed_beam import build_subtree_table

    num_index = tree.total_codes
    params = din.init_params(jax.random.PRNGKey(7), num_index, 8)
    table = np.asarray(build_subtree_table(
        params["embedding"], tree.node_exists, tree.node_id, tree.total_codes
    ))
    emb = np.asarray(params["embedding"])
    e = 8
    assert table.shape == ((tree.total_codes - 3) // 4, 128)
    for c in [0, 1, table.shape[0] - 1]:
        np.testing.assert_array_equal(
            table[c, : 2 * e].reshape(2, e), emb[[2 * c + 1, 2 * c + 2]])
        np.testing.assert_array_equal(
            table[c, 2 * e : 6 * e].reshape(4, e),
            emb[[4 * c + 3, 4 * c + 4, 4 * c + 5, 4 * c + 6]])
        np.testing.assert_array_equal(
            table[c, 6 * e : 6 * e + 2],
            tree.node_exists[[2 * c + 1, 2 * c + 2]].astype(np.float32))
        np.testing.assert_array_equal(
            table[c, 6 * e + 2 : 6 * e + 6],
            tree.node_exists[[4 * c + 3, 4 * c + 4, 4 * c + 5, 4 * c + 6]]
            .astype(np.float32))
        hilo = table[c, 6 * e + 6 : 6 * e + 14].reshape(4, 2)
        got = (hilo[:, 0] * 4096 + hilo[:, 1]).astype(np.int64)
        np.testing.assert_array_equal(
            got, tree.node_id[[4 * c + 3, 4 * c + 4, 4 * c + 5, 4 * c + 6]])


def test_serving_facade_packed_path(tree):
    """TDMServing with packed=True serves identical recommendations."""
    from dismember_tpu.serving import TDMServing

    num_index = tree.total_codes
    params = din.init_params(jax.random.PRNGKey(5), num_index, 8)
    kw = dict(
        params=params, forward=din.forward, tree=tree,
        precompute=din.precompute_seq, apply=din.apply_with_ctx,
        apply_emb=din.apply_from_emb, topk=5, candidate_num=4,
    )
    classic = TDMServing(packed=False, **kw)
    packed = TDMServing(packed=True, **kw)
    seqs = np.asarray(
        np.random.default_rng(1).choice(tree.item_ids, size=(3, 6)))
    out_c = classic.recommend_batch(seqs)
    out_p = packed.recommend_batch(seqs)
    for a, b in zip(out_c, out_p):
        np.testing.assert_array_equal(a, b)


def test_packed_bf16_table_upcasts(tree):
    """bf16 embedding storage: pair table is built f32 from the bf16 rows,
    matching what embed_lookup feeds the classic scorer."""
    num_index = tree.total_codes
    params = din.init_params(jax.random.PRNGKey(4), num_index, 8)
    params_bf16 = dict(params, embedding=params["embedding"].astype(jnp.bfloat16))
    classic = make_beam_fn(
        din.forward, tree, beam=4,
        precompute=din.precompute_seq, apply=din.apply_with_ctx,
    )
    packed = make_packed_tree(tree, params_bf16["embedding"], beam=4)
    packed_fn = make_packed_beam_fn(
        packed, din.precompute_seq, din.apply_from_emb
    )
    seqs = _seqs(tree, seed=9)
    ids_c, _ = jax.device_get(classic(params_bf16, seqs))
    ids_p, _ = jax.device_get(packed_fn(params_bf16, seqs))
    np.testing.assert_array_equal(ids_p, ids_c)


def test_id_digit_roundtrip():
    """Radix id lanes are exact for every id the tree codec can produce,
    including the -1 'no item' sentinel, in both lane layouts."""
    from dismember_tpu.retrieval.packed_beam import (
        _decode_id_digits,
        _encode_id_digits,
    )

    ids = np.array(
        [-1, 0, 1, 255, 256, 4095, 4096, 2**23 - 1, 2**23,
         2**31 - 1, 2**31 - 2], np.int64)
    for k, base in [(2, 4096), (4, 256)]:
        digits = _encode_id_digits(ids, k, base)
        # every digit must be exactly representable in the lane dtype
        if base == 256:
            assert np.all(np.abs(digits) <= 256), "bf16-exact digit range"
            digits = np.asarray(
                jnp.asarray(digits).astype(jnp.bfloat16).astype(jnp.float32))
        back = np.asarray(_decode_id_digits(jnp.asarray(digits), base))
        np.testing.assert_array_equal(back, ids.astype(np.int32))


def test_packed_bf16_pair_table_parity(tree):
    """bf16 pair-table lanes: exact id parity with the f32 table when the
    embedding already sits on the bf16 grid (as the MXU would round it),
    and id lanes decode exactly regardless."""
    num_index = tree.total_codes
    params = din.init_params(jax.random.PRNGKey(12), num_index, 8)
    # snap embeddings to the bf16 grid so f32 and bf16 tables hold the
    # same values -> bitwise-identical scores on the CPU backend too
    params = dict(
        params,
        embedding=params["embedding"].astype(jnp.bfloat16).astype(jnp.float32),
    )
    p32 = make_packed_tree(tree, params["embedding"], beam=4)
    p16 = make_packed_tree(
        tree, params["embedding"], beam=4, dtype=jnp.bfloat16)
    assert p16.pair_table.dtype == jnp.bfloat16
    fn32 = make_packed_beam_fn(p32, din.precompute_seq, din.apply_from_emb)
    fn16 = make_packed_beam_fn(p16, din.precompute_seq, din.apply_from_emb)
    seqs = _seqs(tree, seed=21)
    ids_a, sc_a = jax.device_get(fn32(params, seqs))
    ids_b, sc_b = jax.device_get(fn16(params, seqs))
    np.testing.assert_array_equal(ids_b, ids_a)
    alive = ids_a >= 0
    np.testing.assert_allclose(sc_b[alive], sc_a[alive], rtol=1e-6)


def test_hybrid_bf16_matches_packed_bf16(tree):
    """Hybrid loop reads bf16 tables identically to the packed scan."""
    from dismember_tpu.retrieval.packed_beam import make_hybrid_beam_fn

    num_index = tree.total_codes
    params = din.init_params(jax.random.PRNGKey(14), num_index, 8)
    p16 = make_packed_tree(
        tree, params["embedding"], beam=4, dtype=jnp.bfloat16)
    packed_fn = make_packed_beam_fn(p16, din.precompute_seq, din.apply_from_emb)
    hybrid_fn = make_hybrid_beam_fn(
        p16, din.precompute_seq, din.apply_from_emb, max_contract_rows=4)
    seqs = _seqs(tree, seed=23)
    ids_p, sc_p = jax.device_get(packed_fn(params, seqs))
    ids_h, sc_h = jax.device_get(hybrid_fn(params, seqs))
    np.testing.assert_array_equal(ids_h, ids_p)
    alive = ids_p >= 0
    np.testing.assert_allclose(sc_h[alive], sc_p[alive], rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("cap", [4, 64, 1 << 30])
def test_hybrid_matches_packed(tree, cap):
    """Hybrid (contraction-above, gather-below) beam: exact id/score parity
    with the packed loop at every contraction/gather split, including the
    all-contraction-but-last-level extreme."""
    from dismember_tpu.retrieval.packed_beam import make_hybrid_beam_fn

    num_index = tree.total_codes
    params = din.init_params(jax.random.PRNGKey(9), num_index, 8)
    packed = make_packed_tree(tree, params["embedding"], beam=4)
    packed_fn = make_packed_beam_fn(
        packed, din.precompute_seq, din.apply_from_emb
    )
    hybrid_fn = make_hybrid_beam_fn(
        packed, din.precompute_seq, din.apply_from_emb, max_contract_rows=cap
    )
    seqs = _seqs(tree, seed=17)
    ids_p, sc_p = jax.device_get(packed_fn(params, seqs))
    ids_h, sc_h = jax.device_get(hybrid_fn(params, seqs))
    np.testing.assert_array_equal(ids_h, ids_p)
    alive = ids_p >= 0
    # unrolled levels fuse differently than the scan body: reassociation
    # moves scores a few ulps, never the selected ids
    np.testing.assert_allclose(sc_h[alive], sc_p[alive], rtol=1e-6, atol=1e-6)


def test_chunked_build_matches_one_shot(tree, monkeypatch):
    """Huge-catalog chunked pair-table build (donated slice fills) is
    bit-identical to the one-shot fused build, f32 and bf16."""
    import dismember_tpu.retrieval.packed_beam as pb

    num_index = tree.total_codes
    params = din.init_params(jax.random.PRNGKey(3), num_index, 8)
    for dt in (jnp.float32, jnp.bfloat16):
        one = build_pair_table(
            params["embedding"], tree.node_exists, tree.node_id,
            tree.total_codes, dtype=dt,
        )
        monkeypatch.setattr(pb, "_ONE_SHOT_BUILD_BYTES", 512)
        chunked = build_pair_table(
            params["embedding"], tree.node_exists, tree.node_id,
            tree.total_codes, dtype=dt,
        )
        monkeypatch.undo()
        np.testing.assert_array_equal(
            np.asarray(one, np.float32), np.asarray(chunked, np.float32)
        )


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_stride2_hybrid_matches_classic(tree, dtype):
    """Contraction-prefix stride-2 loop: identical items to the classic loop
    for f32 tables; bf16 tables may flip near-ties (emb lanes rounded the
    way the MXU rounds operands) but ids stay exact via the base-256 digit
    lanes."""
    import jax.numpy as jnp

    from dismember_tpu.retrieval.packed_beam import (
        make_stride2_beam_fn,
        make_stride2_hybrid_beam_fn,
        make_subtree_tree,
    )

    num_index = tree.total_codes
    params = din.init_params(jax.random.PRNGKey(6), num_index, 8)
    dt = jnp.float32 if dtype == "float32" else jnp.bfloat16
    st = make_subtree_tree(tree, params["embedding"], beam=4, dtype=dt)
    # small max_contract_rows so both the contraction and gather phases run
    hy = make_stride2_hybrid_beam_fn(
        st, din.precompute_seq, din.apply_from_emb, max_contract_rows=64
    )
    seqs = _seqs(tree, seed=11)
    ids_h, sc_h = jax.device_get(hy(params, seqs))
    if dtype == "float32":
        classic = make_beam_fn(
            din.forward, tree, beam=4,
            precompute=din.precompute_seq, apply=din.apply_with_ctx,
        )
        ids_c, sc_c = jax.device_get(classic(params, seqs))
        np.testing.assert_array_equal(ids_h, ids_c)
        alive = ids_c >= 0
        np.testing.assert_allclose(sc_h[alive], sc_c[alive], rtol=1e-5)
    else:
        # bf16: compare against the bf16 plain stride loop (same rounding,
        # same ids) — the hybrid prefix must not change anything
        pl = make_stride2_beam_fn(st, din.precompute_seq, din.apply_from_emb)
        ids_p, sc_p = jax.device_get(pl(params, seqs))
        np.testing.assert_array_equal(ids_h, ids_p)
        alive = ids_p >= 0
        np.testing.assert_allclose(sc_h[alive], sc_p[alive], rtol=1e-3,
                                   atol=1e-3)


def test_deepfm_serving_gates_inexact_shortcuts(tree):
    """DeepFM's FM term is elementwise f32 VPU math, so serving must not
    route it through the hybrid contraction einsum or auto-bf16 pair lanes
    (both round operands to bf16 on TPU — invisible to matmul-first DIN,
    score-changing for DeepFM)."""
    from dismember_tpu.serving import TDMServing

    num_index = tree.total_codes
    params = deepfm.init_params(jax.random.PRNGKey(3), num_index, 8, seq_len=6)
    kw = dict(
        params=params, forward=deepfm.forward, tree=tree,
        precompute=deepfm.precompute_seq, apply=deepfm.apply_with_ctx,
        apply_emb=deepfm.apply_from_emb, topk=5, candidate_num=4,
    )
    assert not TDMServing(model_type="deepfm", **kw)._matmul_first()
    assert TDMServing(model_type="din", **kw)._matmul_first()
    # unknown model keeps the historical matmul-first defaults
    assert TDMServing(**kw)._matmul_first()

    # the gated (gather-only hybrid, f32) packed path matches classic
    classic = TDMServing(packed=False, model_type="deepfm", **kw)
    packed = TDMServing(packed=True, model_type="deepfm", **kw)
    seqs = np.asarray(
        np.random.default_rng(2).choice(tree.item_ids, size=(3, 6)))
    for a, b in zip(classic.recommend_batch(seqs),
                    packed.recommend_batch(seqs)):
        np.testing.assert_array_equal(a, b)
