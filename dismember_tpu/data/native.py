"""ctypes bindings for the native host-ops library (native/host_ops.cc).

The library is built on demand (``make -C native``) and used transparently by
the ingest path; everything falls back to the pure-numpy implementation when
no compiler/library is available (set ``DISMEMBER_NO_NATIVE=1`` to force the
fallback).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdismember_host.so")

_lock = threading.Lock()
_lib = None
_tried = False


class _CsvResult(ctypes.Structure):
    _fields_ = [
        ("n_rows", ctypes.c_int64),
        ("users", ctypes.POINTER(ctypes.c_int64)),
        ("items", ctypes.POINTER(ctypes.c_int64)),
        ("timestamps", ctypes.POINTER(ctypes.c_int64)),
        ("labels", ctypes.POINTER(ctypes.c_float)),
        ("categories", ctypes.POINTER(ctypes.c_int32)),
        ("category_names", ctypes.c_char_p),
        ("category_names_len", ctypes.c_int64),
    ]


class _InteractionsResult(ctypes.Structure):
    _fields_ = [
        ("n_users", ctypes.c_int64),
        ("n_items_total", ctypes.c_int64),
        ("unique_users", ctypes.POINTER(ctypes.c_int64)),
        ("offsets", ctypes.POINTER(ctypes.c_int64)),
        ("items_concat", ctypes.POINTER(ctypes.c_int64)),
    ]


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if os.environ.get("DISMEMBER_NO_NATIVE"):
        return None
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.dm_parse_csv.restype = ctypes.POINTER(_CsvResult)
        lib.dm_parse_csv.argtypes = [ctypes.c_char_p]
        lib.dm_free_csv.argtypes = [ctypes.POINTER(_CsvResult)]
        lib.dm_user_interactions.restype = ctypes.POINTER(_InteractionsResult)
        lib.dm_user_interactions.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        lib.dm_free_interactions.argtypes = [ctypes.POINTER(_InteractionsResult)]
        lib.dm_scan_kv_records.restype = ctypes.c_int64
        lib.dm_scan_kv_records.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        lib.dm_dr_greedy_select.restype = None
        lib.dm_dr_greedy_select.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),   # cand_idx [n_rows, n_cand]
            ctypes.POINTER(ctypes.c_double),  # cand_scores
            ctypes.POINTER(ctypes.c_int64),   # occ_rows
            ctypes.POINTER(ctypes.c_int64),   # path_size (in/out)
            ctypes.POINTER(ctypes.c_int64),   # sel_idx (in/out)
            ctypes.c_double, ctypes.c_double,
        ]
        lib.dm_cooc_apply.restype = None
        lib.dm_cooc_apply.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),  # starts [n_seg]
            ctypes.POINTER(ctypes.c_int64),  # segs [n_seg]
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),  # src [n_edges]
            ctypes.POINTER(ctypes.c_float),  # wn [n_edges]
            ctypes.POINTER(ctypes.c_float),  # f [n_items, dim]
            ctypes.POINTER(ctypes.c_float),  # g [n_items, dim] (out)
        ]
        _lib = lib
        return _lib


def dr_greedy_select_native(
    cand_idx, cand_scores, occ_rows, path_size, sel_idx,
    num_iteration: int, penalty_factor: float, q: float,
) -> bool:
    """Native DR coordinate-descent greedy J-path selection
    (native/host_ops.cc dm_dr_greedy_select): exact port of the numpy loop
    in train/dr_coordinate.coordinate_descent — same libm calls, argmax and
    NaN semantics, so selections are bit-identical on the same host.
    Mutates ``path_size``/``sel_idx`` in place; returns False (caller falls
    back to the Python loop) when the library is unavailable or the
    candidate width exceeds the native buffer."""
    lib = get_lib()
    n_rows, n_cand = cand_idx.shape
    if lib is None or n_cand > 64:
        return False
    # The C function mutates path_size/sel_idx through raw pointers: a wrong
    # dtype or non-contiguous layout would be silently misread/miswritten, so
    # these must stay hard errors even under ``python -O`` (asserts strip).
    for name, arr, want in (
        ("cand_idx", cand_idx, np.int64),
        ("cand_scores", cand_scores, np.float64),
        ("occ_rows", occ_rows, np.int64),
        ("path_size", path_size, np.int64),
        ("sel_idx", sel_idx, np.int64),
    ):
        if arr.dtype != want or not arr.flags.c_contiguous:
            raise TypeError(
                f"dr_greedy_select_native: {name} must be C-contiguous "
                f"{np.dtype(want).name}, got {arr.dtype}"
                f"{'' if arr.flags.c_contiguous else ' (non-contiguous)'}"
            )
    p = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))  # noqa: E731
    lib.dm_dr_greedy_select(
        n_rows, sel_idx.shape[1], n_cand, num_iteration,
        p(cand_idx, ctypes.c_int64), p(cand_scores, ctypes.c_double),
        p(occ_rows, ctypes.c_int64), p(path_size, ctypes.c_int64),
        p(sel_idx, ctypes.c_int64),
        float(penalty_factor), float(q),
    )
    return True


def cooc_apply_native(
    starts: np.ndarray, segs: np.ndarray, src: np.ndarray,
    wn: np.ndarray, f: np.ndarray, g: np.ndarray,
    n_threads: int | None = None,
) -> bool:
    """Threaded co-occurrence operator pass g[dst] += f[src] * wn
    (native/host_ops.cc dm_cooc_apply), numerically equivalent to the numpy
    reduceat form (numpy sums pairwise, this sums sequentially — ~1ulp
    drift, immaterial ahead of the QR + k-means consumers).  Mutates ``g`` in place; returns False to fall back to the
    numpy path when the library is unavailable."""
    import os

    lib = get_lib()
    if lib is None:
        return False
    for name, arr, want in (
        ("starts", starts, np.int64), ("segs", segs, np.int64),
        ("src", src, np.int64), ("wn", wn, np.float32),
        ("f", f, np.float32), ("g", g, np.float32),
    ):
        if arr.dtype != want or not arr.flags.c_contiguous:
            raise TypeError(
                f"cooc_apply_native: {name} must be C-contiguous "
                f"{np.dtype(want).name}, got {arr.dtype}"
            )
    p = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))  # noqa: E731
    lib.dm_cooc_apply(
        len(segs), f.shape[1], n_threads or os.cpu_count() or 1,
        p(starts, ctypes.c_int64), p(segs, ctypes.c_int64),
        len(src), p(src, ctypes.c_int64), p(wn, ctypes.c_float),
        p(f, ctypes.c_float), p(g, ctypes.c_float),
    )
    return True


def parse_csv_native(path: str):
    """Native CSV ingest; returns the same tuple layout as ingest.read_csv
    fields, or None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    res = lib.dm_parse_csv(path.encode("utf-8"))
    if not res:
        return None
    try:
        r = res.contents
        n = r.n_rows
        users = np.ctypeslib.as_array(r.users, (n,)).copy()
        items = np.ctypeslib.as_array(r.items, (n,)).copy()
        timestamps = np.ctypeslib.as_array(r.timestamps, (n,)).copy()
        labels = np.ctypeslib.as_array(r.labels, (n,)).copy()
        cats = np.ctypeslib.as_array(r.categories, (n,)).copy()
        names = (r.category_names or b"").decode("utf-8")
        cat_names = names.split("\n") if names else []
        return users, items, cats, labels, timestamps, cat_names
    finally:
        lib.dm_free_csv(res)


def user_interactions_native(
    users: np.ndarray, items: np.ndarray, timestamps: np.ndarray
):
    """Native grouped interactions; returns dict[user] -> item array, or
    None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    users = np.ascontiguousarray(users, dtype=np.int64)
    items = np.ascontiguousarray(items, dtype=np.int64)
    timestamps = np.ascontiguousarray(timestamps, dtype=np.int64)
    res = lib.dm_user_interactions(
        users.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        items.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        timestamps.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(users),
    )
    if not res:
        return None
    try:
        r = res.contents
        nu = r.n_users
        uu = np.ctypeslib.as_array(r.unique_users, (nu,)).copy()
        off = np.ctypeslib.as_array(r.offsets, (nu + 1,)).copy()
        stream = np.ctypeslib.as_array(r.items_concat, (r.n_items_total,)).copy()
        return {
            int(uu[i]): stream[off[i] : off[i + 1]] for i in range(nu)
        }
    finally:
        lib.dm_free_interactions(res)


def scan_kv_records_native(data: bytes):
    """(offsets, lengths) arrays of the KV framing, or None."""
    lib = get_lib()
    if lib is None:
        return None
    cap = max(16, len(data) // 8)
    offsets = np.empty(cap, dtype=np.int64)
    lengths = np.empty(cap, dtype=np.int64)
    count = lib.dm_scan_kv_records(
        data,
        len(data),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cap,
    )
    return offsets[:count], lengths[:count]


class _TreeDecodeResult(ctypes.Structure):
    _fields_ = [
        ("max_level", ctypes.c_int32),
        ("n_nodes", ctypes.c_int64),
        ("n_pairs", ctypes.c_int64),
        ("node_codes", ctypes.POINTER(ctypes.c_int64)),
        ("node_ids", ctypes.POINTER(ctypes.c_int64)),
        ("node_probs", ctypes.POINTER(ctypes.c_float)),
        ("node_is_leaf", ctypes.POINTER(ctypes.c_uint8)),
        ("pair_ids", ctypes.POINTER(ctypes.c_int64)),
        ("pair_codes", ctypes.POINTER(ctypes.c_int64)),
    ]


def _tree_fns(lib):
    if not hasattr(lib, "_tree_bound"):
        lib.dm_write_tree.restype = ctypes.c_int64
        lib.dm_write_tree.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ]
        lib.dm_read_tree.restype = ctypes.POINTER(_TreeDecodeResult)
        lib.dm_read_tree.argtypes = [ctypes.c_char_p]
        lib.dm_free_tree.argtypes = [ctypes.POINTER(_TreeDecodeResult)]
        lib._tree_bound = True
    return lib


def write_tree_native(path, leaf_ids, leaf_codes, leaf_probs,
                      anc_codes, anc_ids, anc_probs, max_level) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    _tree_fns(lib)
    leaf_ids = np.ascontiguousarray(leaf_ids, np.int64)
    leaf_codes = np.ascontiguousarray(leaf_codes, np.int64)
    leaf_probs = np.ascontiguousarray(leaf_probs, np.float32)
    anc_codes = np.ascontiguousarray(anc_codes, np.int64)
    anc_ids = np.ascontiguousarray(anc_ids, np.int64)
    anc_probs = np.ascontiguousarray(anc_probs, np.float32)
    p64 = ctypes.POINTER(ctypes.c_int64)
    pf = ctypes.POINTER(ctypes.c_float)
    ret = lib.dm_write_tree(
        path.encode("utf-8"), len(leaf_ids),
        leaf_ids.ctypes.data_as(p64), leaf_codes.ctypes.data_as(p64),
        leaf_probs.ctypes.data_as(pf), len(anc_codes),
        anc_codes.ctypes.data_as(p64), anc_ids.ctypes.data_as(p64),
        anc_probs.ctypes.data_as(pf), int(max_level),
    )
    return ret >= 0


def read_tree_native(path):
    """dict of LoadedTree fields, or None."""
    lib = get_lib()
    if lib is None or not os.path.exists(path):
        return None
    _tree_fns(lib)
    res = lib.dm_read_tree(path.encode("utf-8"))
    if not res:
        return None
    try:
        r = res.contents
        nn, npair = r.n_nodes, r.n_pairs
        return dict(
            max_level=int(r.max_level),
            item_ids=np.ctypeslib.as_array(r.pair_ids, (npair,)).copy(),
            leaf_codes=np.ctypeslib.as_array(r.pair_codes, (npair,)).copy(),
            node_codes=np.ctypeslib.as_array(r.node_codes, (nn,)).copy(),
            node_ids=np.ctypeslib.as_array(r.node_ids, (nn,)).copy(),
            node_probs=np.ctypeslib.as_array(r.node_probs, (nn,)).copy(),
            node_is_leaf=np.ctypeslib.as_array(r.node_is_leaf, (nn,)).copy().astype(bool),
        )
    finally:
        lib.dm_free_tree(res)
