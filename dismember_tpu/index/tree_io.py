"""Tree persistence: the reference's length-prefixed KV protobuf format.

Format parity with tdm/.../tree/TreeBuilder.scala:23-162 and DistTree.scala:
a stream of records, each a 4-byte big-endian length followed by a ``KVItem``;
keys are UTF-8 strings: a numeric node code, ``Part_i`` (id/code pairs, 512 per
part), or ``tree_meta``.
"""

from __future__ import annotations

import dataclasses
import math
import struct

import numpy as np

from dismember_tpu.index.proto import IdCodePair, IdCodePart, KVItem, Node, TreeMeta


@dataclasses.dataclass
class LoadedTree:
    """Host-side decoded tree (the rebuild's DistTree.loadData result).

    Columnar: ``node_*`` arrays hold every code-keyed record (leaves +
    internal), aligned by position."""

    max_level: int
    item_ids: np.ndarray  # [num_items] leaf item ids
    leaf_codes: np.ndarray  # [num_items]
    node_codes: np.ndarray  # [n_nodes]
    node_ids: np.ndarray  # [n_nodes]
    node_probs: np.ndarray  # [n_nodes] float32
    node_is_leaf: np.ndarray  # [n_nodes] bool

    @property
    def code_nodes(self) -> dict[int, Node]:
        """Legacy dict view (code -> Node); built on demand."""
        return {
            int(c): Node(
                id=int(i), probality=float(p), is_leaf=bool(l)
            )
            for c, i, p, l in zip(
                self.node_codes, self.node_ids, self.node_probs, self.node_is_leaf
            )
        }


def sink_leaf_codes(codes: np.ndarray, max_level: int) -> np.ndarray:
    """Sink every leaf code down to the deepest level.

    Mirrors TreeBuilder.flattenLeaves (TreeBuilder.scala:133-140):
    repeatedly ``code = 2*code + 1`` until ``code >= 2^max_level - 1``.
    """
    min_leaf_code = (1 << max_level) - 1
    out = codes.astype(np.int64).copy()
    while True:
        mask = out < min_leaf_code
        if not mask.any():
            return out
        out[mask] = out[mask] * 2 + 1


def ancestors_of(code: int, max_level: int) -> list[int]:
    """All ancestors up to (and including) the root, mirroring
    TreeBuilder.getAncestors: exactly ``max_level`` hops of (c-1)//2."""
    out = []
    c = code
    for _ in range(max_level):
        c = (c - 1) // 2
        out.append(c)
    return out


def write_tree(
    path: str,
    tree_ids: np.ndarray,
    tree_codes: np.ndarray,
    stat: dict[int, int] | None = None,
) -> None:
    """Serialize a tree, mirroring TreeBuilder.build (TreeBuilder.scala:23-101).

    ``tree_ids``/``tree_codes`` are parallel arrays of leaf item ids and their
    (possibly non-bottom) codes; leaves are sunk to the bottom level, sorted by
    code, and written as KV records along with internal-node records (id =
    code + offset, occurrence-summed probabilities), Part_i id/code chunks and
    the tree_meta record.
    """
    tree_ids = np.asarray(tree_ids, dtype=np.int64)
    tree_codes = np.asarray(tree_codes, dtype=np.int64)
    offset = max(0, int(tree_ids.max())) + 1
    max_level = int(math.floor(math.log2(int(tree_codes.max()) + 1)))
    leaf_codes = sink_leaf_codes(tree_codes, max_level)
    order = np.argsort(leaf_codes, kind="stable")
    ids_sorted = tree_ids[order]
    codes_sorted = leaf_codes[order]

    # leaf probabilities + ancestor occurrence sums (computeNodeOccurrence),
    # vectorized: walk parent levels accumulating per-code sums
    if stat:
        leaf_probs = np.asarray(
            [float(stat.get(int(i), 1.0)) for i in ids_sorted], dtype=np.float32
        )
        leaf_counts = np.asarray(
            [float(stat[int(i)]) if int(i) in stat else 0.0 for i in ids_sorted],
            dtype=np.float64,
        )
    else:
        leaf_probs = np.ones(len(ids_sorted), dtype=np.float32)
        leaf_counts = np.zeros(len(ids_sorted), dtype=np.float64)

    total = (1 << (max_level + 1)) - 1
    anc_sum = np.zeros(total, dtype=np.float64)
    anc_seen = np.zeros(total, dtype=bool)
    cur = codes_sorted.copy()
    for _ in range(max_level):
        cur = (cur - 1) >> 1
        np.add.at(anc_sum, cur, leaf_counts)
        anc_seen[cur] = True
    anc_codes = np.flatnonzero(anc_seen).astype(np.int64)
    if stat:
        anc_probs = np.where(anc_sum[anc_codes] > 0, anc_sum[anc_codes], 1.0).astype(
            np.float32
        )
    else:
        anc_probs = np.ones(len(anc_codes), dtype=np.float32)
    anc_ids = anc_codes + offset

    # all writes go through a local staging path (remote URLs are uploaded
    # on completion — the reference's Hadoop-FS-everywhere property,
    # scalann utils/File.scala:12-57)
    from dismember_tpu.core.io import stage_out
    from dismember_tpu.data.native import write_tree_native

    with stage_out(path) as local:
        # fast path: native single-pass writer
        if write_tree_native(
            local, ids_sorted, codes_sorted, leaf_probs, anc_codes, anc_ids,
            anc_probs, max_level,
        ):
            return
        _write_tree_python(
            local, ids_sorted, codes_sorted, leaf_probs, anc_codes, anc_ids,
            anc_probs, max_level,
        )


def _write_tree_python(
    path, ids_sorted, codes_sorted, leaf_probs, anc_codes, anc_ids, anc_probs,
    max_level,
) -> None:
    with open(path, "wb") as f:

        def write_kv(key: str, value: bytes) -> None:
            rec = KVItem(key=key.encode("utf-8"), value=value).encode()
            f.write(struct.pack(">i", len(rec)))
            f.write(rec)

        parts: list[IdCodePart] = []
        tmp: list[IdCodePair] = []
        n = len(ids_sorted)
        for i in range(n):
            iid, code = int(ids_sorted[i]), int(codes_sorted[i])
            leaf = Node(
                id=iid, probality=float(leaf_probs[i]), leaf_cate_id=0, is_leaf=True
            )
            write_kv(str(code), leaf.encode())

            tmp.append(IdCodePair(id=iid, code=code))
            if i == n - 1 or len(tmp) == 512:
                part_id = f"Part_{len(parts) + 1}"
                parts.append(IdCodePart(part_id=part_id.encode("utf-8"), id_code_list=list(tmp)))
                tmp.clear()

        for anc, aid, aprob in zip(anc_codes, anc_ids, anc_probs):
            node = Node(
                id=int(aid), probality=float(aprob), leaf_cate_id=0, is_leaf=False
            )
            write_kv(str(int(anc)), node.encode())

        for p in parts:
            write_kv(p.part_id.decode("utf-8"), p.encode())
        meta = TreeMeta(max_level=max_level, id_code_part=[p.part_id for p in parts])
        write_kv("tree_meta", meta.encode())


def read_tree(path: str) -> LoadedTree:
    """Load a KV tree file (local or remote URL), mirroring
    DistTree.loadData/loadItems."""
    from dismember_tpu.core.io import stage_in
    from dismember_tpu.data.native import read_tree_native

    with stage_in(path) as local:
        # fast path: full native decode to columnar arrays
        native = read_tree_native(local)
        if native is not None:
            return LoadedTree(**native)
        with open(local, "rb") as f:
            data = f.read()

    code_nodes: dict[int, Node] = {}
    parts: list[IdCodePart] = []
    meta: TreeMeta | None = None

    pos = 0
    n = len(data)
    while pos + 4 <= n:
        (rec_len,) = struct.unpack(">i", data[pos : pos + 4])
        pos += 4
        item = KVItem.decode(data[pos : pos + rec_len])
        pos += rec_len
        key = item.key.decode("utf-8")
        if key.startswith("tree_meta"):
            meta = TreeMeta.decode(item.value)
        elif key.startswith("Part_"):
            parts.append(IdCodePart.decode(item.value))
        else:
            code_nodes[int(key)] = Node.decode(item.value)
    if meta is None:
        raise ValueError(f"tree file {path} has no tree_meta record")
    pairs = [p for part in parts for p in part.id_code_list]
    item_ids = np.asarray([p.id for p in pairs], dtype=np.int64)
    leaf_codes = np.asarray([p.code for p in pairs], dtype=np.int64)
    codes = np.asarray(sorted(code_nodes), dtype=np.int64)
    return LoadedTree(
        max_level=meta.max_level,
        item_ids=item_ids,
        leaf_codes=leaf_codes,
        node_codes=codes,
        node_ids=np.asarray([code_nodes[int(c)].id for c in codes], dtype=np.int64),
        node_probs=np.asarray(
            [code_nodes[int(c)].probality for c in codes], dtype=np.float32
        ),
        node_is_leaf=np.asarray(
            [code_nodes[int(c)].is_leaf for c in codes], dtype=bool
        ),
    )


def category_sorted_codes(
    item_ids: np.ndarray, categories: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Initial tree codes by category sort + recursive half-split.

    Mirrors TreeInit.initializeTree (TreeInit.scala:177-215): items sorted by
    (category, id); ``genCode`` assigns the *right* half of a range to child
    2c+1 and the left half to 2c+2.
    Returns (sorted_ids, codes) aligned arrays.
    """
    order = np.lexsort((item_ids, categories))
    ids_sorted = np.asarray(item_ids)[order]
    codes = np.zeros(len(ids_sorted), dtype=np.int64)

    # iterative genCode to avoid Python recursion limits on big catalogs
    stack = [(0, len(ids_sorted), 0)]
    while stack:
        start, end, code = stack.pop()
        if end <= start:
            continue
        if end == start + 1:
            codes[start] = code
            continue
        mid = (start + end) >> 1
        stack.append((mid, end, 2 * code + 1))
        stack.append((start, mid, 2 * code + 2))
    return ids_sorted, codes
