"""Native host-ops library: equivalence with the pure-Python path."""

import os

import numpy as np
import pytest

from dismember_tpu.data import native
from dismember_tpu.data.ingest import _read_csv_python, InitSamples


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no compiler?)")
    return lib


def test_csv_parse_matches_python(lib, small_csv):
    ref = _read_csv_python(small_csv)
    got = native.parse_csv_native(small_csv)
    assert got is not None
    users, items, cats, labels, timestamps, cat_names = got
    np.testing.assert_array_equal(users, ref.user)
    np.testing.assert_array_equal(items, ref.item)
    np.testing.assert_array_equal(timestamps, ref.timestamp)
    np.testing.assert_array_equal(cats, ref.category)
    np.testing.assert_array_equal(labels, ref.label)
    assert cat_names == ref.category_names


def test_interactions_match_python(lib, small_csv):
    ref_samples = _read_csv_python(small_csv)
    # python reference implementation
    import dismember_tpu.data.ingest as ingest

    order = np.argsort(ref_samples.timestamp, kind="stable")
    users = ref_samples.user[order]
    items = ref_samples.item[order]
    uorder = np.argsort(users, kind="stable")
    users_s, items_s = users[uorder], items[uorder]
    boundaries = np.flatnonzero(np.diff(users_s)) + 1
    expected = {}
    for chunk_items, u in zip(
        np.split(items_s, boundaries),
        np.concatenate([[users_s[0]], users_s[boundaries]]),
    ):
        _, fi = np.unique(chunk_items, return_index=True)
        expected[int(u)] = chunk_items[np.sort(fi)]

    got = native.user_interactions_native(
        ref_samples.user, ref_samples.item, ref_samples.timestamp
    )
    assert got is not None
    assert set(got) == set(expected)
    for u in expected:
        np.testing.assert_array_equal(got[u], expected[u])


def test_kv_scan(lib, tmp_path):
    import struct

    from dismember_tpu.index.proto import KVItem

    path = tmp_path / "kv.bin"
    recs = [
        KVItem(key=b"1", value=b"abc").encode(),
        KVItem(key=b"tree_meta", value=b"xyzw").encode(),
    ]
    with open(path, "wb") as f:
        for r in recs:
            f.write(struct.pack(">i", len(r)))
            f.write(r)
    data = open(path, "rb").read()
    offsets, lengths = native.scan_kv_records_native(data)
    assert len(offsets) == 2
    for off, ln, rec in zip(offsets, lengths, recs):
        assert data[off : off + ln] == rec


def test_parse_speed_sanity(lib, example_csv):
    """Native parse of the full 100k-row file should be fast (well under a
    second) — this is the scale path for 10M-item catalogs."""
    import time

    t0 = time.perf_counter()
    got = native.parse_csv_native(example_csv)
    dt = time.perf_counter() - t0
    assert got is not None and len(got[0]) == 100000
    assert dt < 1.0, f"native CSV parse too slow: {dt:.2f}s"


def test_cooc_apply_matches_numpy(lib):
    """dm_cooc_apply matches the numpy reduceat form to float tolerance
    (numpy sums pairwise, the native loop sequentially — order differs, so
    ~1ulp-scale drift is expected and immaterial: the features feed k-means
    after a QR orthonormalization)."""
    import numpy as np

    from dismember_tpu.data.native import cooc_apply_native

    rng = np.random.default_rng(3)
    n_items, dim, n_edges = 500, 16, 20_000
    dst = np.sort(rng.integers(0, n_items, n_edges))
    src = rng.integers(0, n_items, n_edges)
    wn = rng.random(n_edges, dtype=np.float32)
    f = rng.standard_normal((n_items, dim), dtype=np.float32)
    starts = np.concatenate([[0], np.flatnonzero(np.diff(dst)) + 1])
    segs = dst[starts]

    ref = np.zeros_like(f)
    ref[segs] = np.add.reduceat(f[src] * wn[:, None], starts, axis=0)

    for threads in (1, 4):
        got = np.zeros_like(f)
        assert cooc_apply_native(
            starts, segs, src.astype(np.int64), wn, f, got, n_threads=threads
        )
        np.testing.assert_allclose(ref, got, rtol=1e-4, atol=1e-5)
