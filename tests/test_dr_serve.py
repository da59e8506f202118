"""On-device DR serving: equivalence with the host path."""

import jax.numpy as jnp
import numpy as np
import pytest

from dismember_tpu.data.dr_dataset import build_dr_data
from dismember_tpu.retrieval.dr_serve import DevicePathMap, make_dr_serving_fn
from dismember_tpu.train.dr import DRTrainer


@pytest.fixture(scope="module")
def trained(small_csv):
    data = build_dr_data(small_csv, seq_len=10, min_seq_len=2, split_ratio=0.8)
    tr = DRTrainer(
        data, num_layers=3, num_nodes=20, num_paths_per_item=2, embed_size=8,
        learning_rate=1e-2, train_batch_size=1024, beam_size=10, topk=5, seed=0,
    )
    tr.train(num_epochs=1)
    return tr


def test_device_path_map(trained):
    dmap = DevicePathMap.build(trained.path_index)
    assert dmap is not None
    p2i = trained.path_index.path_to_items()
    # spot-check a few paths
    table = np.asarray(dmap.path_table)
    items = np.asarray(dmap.path_items)
    k = trained.num_nodes
    for path, expect in list(p2i.items())[:10]:
        key = 0
        for d in path:
            key = key * k + d
        row = table[key]
        assert row >= 0
        got = items[row][items[row] >= 0]
        assert set(got.tolist()) == set(expect)


def test_device_serving_matches_host(trained):
    tr = trained
    fn = make_dr_serving_fn(tr, topk=5)
    assert fn is not None
    seqs = tr.data.eval_seqs[:16]
    dev_ids, dev_scores = fn(
        tr.layer_params, tr.rerank_params, jnp.asarray(seqs, jnp.int32)
    )
    dev_ids = np.asarray(dev_ids)
    host = tr.recommend_batch(seqs, topk=5)
    for i in range(len(seqs)):
        want = host[i]
        got = dev_ids[i][dev_ids[i] >= 0]
        # same candidate sets and same score-ordering => same top-k
        np.testing.assert_array_equal(got, want)


def test_device_serving_consumed_filter(trained):
    tr = trained
    fn = make_dr_serving_fn(tr, topk=5)
    seqs = tr.data.eval_seqs[:4]
    base_ids, _ = fn(tr.layer_params, tr.rerank_params, jnp.asarray(seqs, jnp.int32))
    base_ids = np.asarray(base_ids)
    # consume the top item of row 0
    consumed = np.full((4, 2), -1, dtype=np.int32)
    consumed[0, 0] = base_ids[0, 0]
    out_ids, _ = fn(
        tr.layer_params, tr.rerank_params, jnp.asarray(seqs, jnp.int32),
        jnp.asarray(consumed),
    )
    out_ids = np.asarray(out_ids)
    assert base_ids[0, 0] not in out_ids[0]


@pytest.mark.parametrize("mode", ["packed", "block"])
def test_bf16_rerank_serving_matches_exact(trained, mode):
    """Deep-catalog bf16 serving tables (item-major packed rows and
    path-major blocks): same ids as the exact f32 gather path (bf16 rounds
    the weights like the MXU rounds matmul operands; only near-ties could
    reorder — scores checked to bf16 tol)."""
    tr = trained
    seqs = jnp.asarray(tr.data.eval_seqs[:32], jnp.int32)
    exact_fn = make_dr_serving_fn(tr, topk=5, rerank_table="exact")
    ids_e, sc_e = exact_fn(tr.layer_params, tr.rerank_params, seqs)
    bf16_fn = make_dr_serving_fn(tr, topk=5, rerank_table=mode)
    ids_p, sc_p = bf16_fn(tr.layer_params, tr.rerank_params, seqs)
    ids_e, sc_e, ids_p, sc_p = map(np.asarray, (ids_e, sc_e, ids_p, sc_p))
    same = (ids_e == ids_p).mean()
    assert same > 0.9, f"{mode} ids diverged too much: {same}"
    alive = (ids_e >= 0) & (ids_e == ids_p)
    np.testing.assert_allclose(sc_p[alive], sc_e[alive], rtol=2e-2, atol=2e-2)


def test_block_serving_consumed_and_dedup(trained):
    """Block path: consumed filter works and returned ids are unique per
    row (an item on both its J=2 retrieved paths must appear once)."""
    tr = trained
    fn = make_dr_serving_fn(tr, topk=5, rerank_table="block")
    seqs = jnp.asarray(tr.data.eval_seqs[:16], jnp.int32)
    ids, _ = fn(tr.layer_params, tr.rerank_params, seqs)
    ids = np.asarray(ids)
    for row in ids:
        live = row[row >= 0]
        assert len(set(live.tolist())) == len(live)
    consumed = np.full((16, 2), -1, dtype=np.int32)
    consumed[0, 0] = ids[0, 0]
    out, _ = fn(
        tr.layer_params, tr.rerank_params, seqs, jnp.asarray(consumed)
    )
    assert ids[0, 0] not in np.asarray(out)[0]


@pytest.mark.parametrize("mode", ["packed", "block"])
def test_serving_hlo_has_no_baked_path_map(trained, mode):
    """The path map and serving tables must be jit ARGUMENTS, not closure
    captures: baked literals scale the compile request with the catalog
    (at 1M items, a post-coordinate-descent [n_paths, 128] path_items
    literal (~400MB) made the remote-compile relay reject the program
    with HTTP 413).  Guard: no captured constant of the traced program may
    have the path map's or serving table's shape."""
    import jax

    tr = trained
    fn = make_dr_serving_fn(tr, topk=5, rerank_table=mode)
    seqs = jnp.zeros((4, tr.data.train_seqs.shape[1]), jnp.int32)
    if mode == "packed":
        ex = (tr.layer_params, tr.rerank_params, fn._packed_wb,
              fn._ptab2d, fn._dmap.path_items, seqs)
        tables = (fn._packed_wb, fn._ptab2d, fn._dmap.path_table,
                  fn._dmap.path_items)
    else:
        ex = (tr.layer_params, tr.rerank_params, fn._block_tab,
              fn._ptab2d, fn._seq_pack, seqs)
        tables = (fn._block_tab, fn._ptab2d, fn._seq_pack,
                  fn._dmap.path_table, fn._dmap.path_items)
    closed = jax.make_jaxpr(fn._run.__wrapped__)(*ex)
    catalog_shapes = {tuple(t.shape) for t in tables}
    baked = [
        c for c in closed.consts
        if hasattr(c, "shape") and tuple(c.shape) in catalog_shapes
    ]
    assert not baked, [c.shape for c in baked]


def test_truncation_keeps_high_priority_items():
    """Overflowing paths keep the top-m items by priority (training
    frequency), not dict insertion order: at 1M items the coordinate-
    descent index piles popular items onto hot paths, and arbitrary
    truncation dropped exactly the Zipf-popular eval labels (recall@10
    0.0157 capped vs 0.0492 uncapped, BASELINE.md)."""
    from dismember_tpu.index.paths import PathIndex

    n_items, k, d = 40, 5, 2
    # every item on the SAME path -> one path with 40 items; J=1
    item_paths = np.zeros((n_items, 1, d), np.int32)
    idx = PathIndex(item_paths=item_paths, num_nodes=k)
    prio = np.arange(n_items)[::-1].copy()  # item 0 most frequent
    dmap = DevicePathMap.build(idx, max_items_per_path=8, item_priority=prio)
    assert dmap.truncated_paths == 1
    row = np.asarray(dmap.path_table)[0]
    kept = np.asarray(dmap.path_items)[row]
    np.testing.assert_array_equal(sorted(kept.tolist()), list(range(8)))
    # without priority: insertion order (whatever it is), still 8 items
    dmap2 = DevicePathMap.build(idx, max_items_per_path=8)
    assert (np.asarray(dmap2.path_items)[np.asarray(dmap2.path_table)[0]] >= 0).sum() == 8


def test_block_geometry_invariants():
    """The minimal-plane-count search must (a) hold every payload plane,
    (b) keep rows tile-aligned (width % 128 == 0 — otherwise the table
    pads up to 128/width-fold in HBM), (c) cover >= m item slots, and
    (d) never be wider than the old power-of-two rule it replaced (which
    read up to 25% zero padding per gather at the 10M bench config)."""
    import math

    from dismember_tpu.retrieval.dr_serve import _ID_DIGITS, _block_geometry

    def pow2_width(e, m):
        used = e + 1 + _ID_DIGITS + 1
        for lanes in (32, 64, 128):
            if used <= lanes:
                group = 128 // lanes
                return lanes * (-(-m // group) * group)
        return None

    for e in (8, 16, 24, 32, 64, 120):
        for m in (1, 7, 45, 48, 128):
            geom = _block_geometry(e, m)
            used = e + 1 + _ID_DIGITS + 1
            assert geom is not None
            planes, m_pad = geom
            assert planes >= used
            assert m_pad >= m
            assert (planes * m_pad) % 128 == 0
            old = pow2_width(e, m)
            if old is not None:
                assert planes * m_pad <= old, (e, m, geom, old)
    # payload overflow -> None
    assert _block_geometry(126, 4) is None
