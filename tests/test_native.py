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
