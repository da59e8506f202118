"""JTM tree learning: items re-assigned to subtrees by batched model scoring.

Reference (jtm/.../optim/{JTM,JTMAsync,TreeLearning}.scala): starting from all
items at the root, sweep levels in steps of ``gap``; at each step, every item
assigned to a node is scored against all 2^gap descendant candidates — the
score of (item, candidate) is the model forward summed over the item's
training sequences and over the chain from candidate up to the current node
(aggregateWeights, TreeLearning.scala:152-174) — then a greedy capacity-
rebalance (2^(max_level-level) per node, old assignment preferred to stay)
fixes overflows (reBalance:217-265).  The final sweep lands every item on a
distinct leaf.

TPU-first: the reference parallelizes across nodes/items with thread pools
(JTM.scala:28-68) or descends subtrees asynchronously (JTMAsync); here ALL
(training-row, candidate, chain-level) scores of a sweep step are one grouped
forward [R, 2^gap] per chain level, followed by a segment-sum over rows per
item — the whole level's weight matrix materializes in a handful of device
ops, subsuming both the sync and async variants.  The greedy rebalance is a
small host loop (inherently sequential, negligible cost).

Hierarchical preference (``idToCode`` with level, JTMTree.scala:59-113):
sequence items are replaced by their ancestors at the chain level when
``hierarchical`` and level >= min_level.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from dismember_tpu.index.arraytree import ArrayTree

logger = logging.getLogger("dismember_tpu.jtm")

_LOW_WEIGHT = -1e6


def build_item_sequence_map(
    train_seqs: np.ndarray, train_targets: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Flatten the item -> training-sequences map (TreeLearning.readDataFile):
    returns (rows [R, L] raw item ids, row_item [R] target item id), rows
    grouped by target."""
    order = np.argsort(train_targets, kind="stable")
    return train_seqs[order], train_targets[order]


@dataclasses.dataclass
class GenericTreeLearner:
    """Shared machinery for JTM tree learning and OTM tree construction:
    batched (item, candidate, chain-level) scoring + greedy capacity
    rebalance over a binary tree of ``max_level`` levels.

    Subclasses/factories supply: ``items`` (ids), ``item_old_codes`` (current
    leaf code per item, for the stay-preference), ``rows_codes`` [R, L]
    sequence codes per training row, ``row_item_pos`` [R] item position per
    row.

    ``mesh``: a ('data','model') jax.sharding.Mesh — the scoring pass (the
    whole cost of the sweep, TreeLearning.scala:152-174) runs SPMD with the
    chain-candidate score rows sharded on 'data' and the node-embedding
    table row-sharded on 'model' (spmd.make_sharded_forward); ragged tail
    batches are -1-row-padded to a 'data'-axis multiple and the pad rows
    dropped on drain.  The FIFO dispatch pipeline is unchanged, so the
    accumulated weights are bit-identical to the single-chip sweep
    (tests/test_jtm_mesh.py)."""

    params: dict
    forward: Callable
    max_level: int
    items: np.ndarray  # [N] item ids
    item_old_codes: np.ndarray  # [N] current leaf codes
    rows_codes: np.ndarray  # [R, L] sequence codes (-1 pad)
    row_item_pos: np.ndarray  # [R] item position per row
    gap: int = 2
    score_batch_rows: int = 8192
    mesh: object = None

    def __post_init__(self):
        if self.mesh is not None:
            from dismember_tpu.core.mesh import DATA_AXIS
            from dismember_tpu.train import spmd

            self._n_data = self.mesh.shape[DATA_AXIS]
            self._score_fn, self._score_params = spmd.make_sharded_forward(
                self.forward, self.mesh, self.params
            )
        else:
            self._n_data = 1
            self._score_fn = jax.jit(self._score_impl)
            self._score_params = self.params

    # ------------------------------------------------------------------
    def _seq_codes_at_level(self, level: int) -> np.ndarray:
        """Sequence codes for scoring at ``level`` (overridden for JTM's
        hierarchical preference)."""
        return self.rows_codes

    def _old_ancestors_at_level(self, level: int) -> np.ndarray:
        """Heap ancestor of each item's old code at ``level``, O(N): the
        ancestor k levels up of code c is ((c+1) >> k) - 1."""
        codes = self.item_old_codes.astype(np.int64)
        cur_level = np.floor(np.log2(np.maximum(codes, 0) + 1)).astype(np.int64)
        shift = np.maximum(cur_level - level, 0)
        return ((codes + 1) >> shift) - 1

    def _score_impl(self, params, chain_codes, seqs):
        """chain_codes [R, C], seqs [R, L] -> logits [R, C]."""
        return self.forward(params, chain_codes, seqs)

    def _dispatch_scores(self, chain_np: np.ndarray, seqs_np: np.ndarray):
        """One (possibly mesh-sharded) score dispatch; returns the device
        array — callers slice [:len(chain_np)] after fetching (rows are
        -1-padded to a 'data'-axis multiple under a mesh)."""
        pad = (-len(chain_np)) % self._n_data
        if pad:
            chain_np = np.concatenate(
                [chain_np, np.full((pad, chain_np.shape[1]), -1, chain_np.dtype)]
            )
            seqs_np = np.concatenate(
                [seqs_np, np.full((pad, seqs_np.shape[1]), -1, seqs_np.dtype)]
            )
        return self._score_fn(
            self._score_params,
            jnp.asarray(chain_np, jnp.int32),
            jnp.asarray(seqs_np, jnp.int32),
        )

    def compute_weights(self, proj: np.ndarray, old_level: int, level: int) -> np.ndarray:
        """Weight matrix [num_items, 2^d]: candidate j of item i is descendant
        j of proj[i]; weight = sum over chain levels and the item's training
        rows of the model score.  Items without training rows get -1e6."""
        d = level - old_level
        n_cand = 1 << d
        n_items = len(self.items)
        weights = np.full((n_items, n_cand), 0.0, dtype=np.float64)

        # candidates per item: proj*2^d + (2^d - 1) + j
        cand = (proj.astype(np.int64)[:, None] * n_cand + (n_cand - 1)) + np.arange(
            n_cand
        )  # [N, 2^d]

        # chain level k (0 = candidate's own level, increasing = up the tree)
        for k in range(d):
            lvl = level - k
            chain = cand.copy()
            for _ in range(k):
                chain = (chain - 1) >> 1  # ancestor at lvl
            seq_codes = self._seq_codes_at_level(lvl)
            # per-row chain codes: chain[item_of_row]
            row_chain = chain[self.row_item_pos]  # [R, 2^d]
            r_total = len(seq_codes)
            # Pipelined dispatch: keep a FIFO window of in-flight score
            # calls so the device (and the ~30ms-RTT relay) computes batch
            # i+1..i+W while the host fetches batch i and accumulates.
            # The blocked per-batch loop was ~86-96% of the sweep's wall
            # (scripts/profile_jtm_sweep.py); host prep/add.at is <15%, so
            # overlap hides nearly all host time + fetch latency.  FIFO
            # drain keeps the np.add.at order identical to the serial loop
            # (bit-identical weights).
            from collections import deque

            inflight: deque = deque()
            for s in range(0, r_total, self.score_batch_rows):
                e = min(s + self.score_batch_rows, r_total)
                out = self._dispatch_scores(row_chain[s:e], seq_codes[s:e])
                inflight.append((s, e, out))
                if len(inflight) >= 8:
                    s0, e0, o0 = inflight.popleft()
                    np.add.at(
                        weights, self.row_item_pos[s0:e0],
                        np.asarray(o0, dtype=np.float64)[: e0 - s0],
                    )
            while inflight:
                s0, e0, o0 = inflight.popleft()
                np.add.at(
                    weights, self.row_item_pos[s0:e0],
                    np.asarray(o0, dtype=np.float64)[: e0 - s0],
                )

        # items that never appear as a target
        has_rows = np.zeros(n_items, dtype=bool)
        has_rows[self.row_item_pos[self.row_item_pos >= 0]] = True
        weights[~has_rows] = _LOW_WEIGHT
        return weights

    # ------------------------------------------------------------------
    def rebalance(
        self,
        node_items: np.ndarray,  # positions of items assigned to this node
        candidates: np.ndarray,  # [2^d] candidate child codes
        weights: np.ndarray,  # [len(node_items), 2^d]
        old_codes: np.ndarray,  # old ancestor (at `level`) per item position
        max_assign: int,
    ) -> dict[int, list[int]]:
        """Greedy capacity rebalance (TreeLearning.reBalance:217-265).

        Returns candidate code -> item positions."""
        order = np.argsort(-weights, axis=1, kind="stable")  # per item: cands desc
        assign: dict[int, list[tuple[int, float, int]]] = {}
        for r, pos in enumerate(node_items):
            j = order[r, 0]
            node = int(candidates[j])
            assign.setdefault(node, []).append((int(pos), float(weights[r, j]), 1))
        row_of_pos = {int(pos): r for r, pos in enumerate(node_items)}

        processed: set[int] = set()
        while True:
            best_node, best_count = 0, -1
            for node in candidates:
                node = int(node)
                if node not in processed and node in assign:
                    if len(assign[node]) > best_count:
                        best_count, best_node = len(assign[node]), node
            if best_count <= max_assign:
                break
            processed.add(best_node)
            entries = assign[best_node]
            entries.sort(
                key=lambda t: (old_codes[row_of_pos[t[0]]] != best_node, -t[1])
            )
            assign[best_node] = entries[:max_assign]
            for pos, _w, next_idx in entries[max_assign:]:
                r = row_of_pos[pos]
                idx = next_idx
                while idx < len(candidates):
                    j = order[r, idx]
                    node = int(candidates[j])
                    if node not in processed:
                        assign.setdefault(node, []).append(
                            (pos, float(weights[r, j]), idx + 1)
                        )
                        break
                    idx += 1
        return {node: [pos for pos, _, _ in items] for node, items in assign.items()}

    # ------------------------------------------------------------------
    def optimize(self) -> dict[int, int]:
        """Full level sweep; returns item id -> leaf code projection."""
        n_items = len(self.items)
        proj = np.zeros(n_items, dtype=np.int64)  # all at root
        max_level = self.max_level

        for old_level in range(0, max_level, self.gap):
            level = min(max_level, old_level + self.gap)
            d = level - old_level
            t0 = time.perf_counter()
            weights = self.compute_weights(proj, old_level, level)
            old_codes = self._old_ancestors_at_level(level)
            max_assign = 1 << (max_level - level)
            n_cand = 1 << d

            # vectorized fast path: every item takes its argmax candidate
            # (== rebalance's first greedy pick — stable-descending order[.,0]);
            # the sequential greedy only ever changes assignments under a
            # child node that exceeded capacity, so only parent segments
            # containing an over-capacity child need it.  This replaces the
            # old O(N * #occupied-nodes) host scan (flatnonzero per node) —
            # at catalog scale (1M items, level 18: 260k nodes) that scan
            # alone was hours of host time.
            choice = proj * n_cand + (n_cand - 1) + np.argmax(weights, axis=1)
            uniq_child, counts = np.unique(choice, return_counts=True)
            over_children = uniq_child[counts > max_assign]
            over_parents = np.unique((over_children - (n_cand - 1)) // n_cand)

            new_proj = choice
            if len(over_parents):
                new_proj = choice.copy()
                order_items = np.argsort(proj, kind="stable")
                sorted_proj = proj[order_items]
                seg_starts = np.flatnonzero(
                    np.concatenate([[True], sorted_proj[1:] != sorted_proj[:-1]])
                )
                seg_ends = np.append(seg_starts[1:], len(sorted_proj))
                seg_nodes = sorted_proj[seg_starts]
                need = np.isin(seg_nodes, over_parents)
                for s0, e0 in zip(seg_starts[need], seg_ends[need]):
                    node = int(sorted_proj[s0])
                    node_items = order_items[s0:e0]
                    candidates = node * n_cand + (n_cand - 1) + np.arange(n_cand)
                    balanced = self.rebalance(
                        node_items,
                        candidates,
                        weights[node_items],
                        old_codes,
                        max_assign,
                    )
                    for child, positions in balanced.items():
                        assert len(positions) <= max_assign
                        for pos in positions:
                            new_proj[pos] = child
            proj = new_proj
            logger.info(
                f"level {level} assign time: {time.perf_counter() - t0:.3f}s"
            )

        return {int(self.items[i]): int(proj[i]) for i in range(n_items)}


class TreeLearner(GenericTreeLearner):
    """JTM tree learning over a persisted ArrayTree (reference JTM/JTMAsync)."""

    def __init__(
        self,
        tree: ArrayTree,
        params: dict,
        forward: Callable,
        train_seqs: np.ndarray,  # [R, L] raw item ids
        train_targets: np.ndarray,  # [R] raw item ids
        gap: int = 2,
        hierarchical: bool = False,
        min_level: int = 0,
        score_batch_rows: int = 8192,
        mesh: object = None,
    ):
        self.tree = tree
        self.hierarchical = hierarchical
        self.min_level = min_level
        rows, row_item = build_item_sequence_map(train_seqs, train_targets)
        items = np.asarray(tree.item_ids)
        item_index = {int(v): i for i, v in enumerate(items)}
        # rows whose target is not a tree leaf are dropped
        pos = np.asarray(
            [item_index.get(int(t), -1) for t in row_item], dtype=np.int64
        )
        keep = pos >= 0
        self._raw_rows = rows[keep]
        super().__init__(
            params=params,
            forward=forward,
            max_level=tree.max_level,
            items=items,
            item_old_codes=np.asarray(tree.item_codes, np.int64),
            rows_codes=tree.ids_to_codes(rows[keep]),
            row_item_pos=pos[keep],
            gap=gap,
            score_batch_rows=score_batch_rows,
            mesh=mesh,
        )

    def _seq_codes_at_level(self, level: int) -> np.ndarray:
        """JTMTree.idToCode: hierarchical preference replaces sequence items
        by their ancestors at the chain level."""
        if self.hierarchical and level >= self.min_level:
            codes = self.rows_codes
            valid = codes >= 0
            anc = self.tree.ancestor_at_level(
                np.where(valid, codes, 0).astype(np.int64), level
            )
            return np.where(valid, anc, -1).astype(np.int32)
        return self.rows_codes


def otm_tree_learner(
    params: dict,
    forward: Callable,
    item_to_code: dict[int, int],
    train_seqs_codes: np.ndarray,  # [N, L] mapped codes (-1 pad)
    train_labels_codes: np.ndarray,  # [N, label_num] mapped codes (-1 pad)
    gap: int = 2,
    mesh: object = None,
) -> GenericTreeLearner:
    """OTM tree construction (otm/.../tree/TreeConstruction.scala): the same
    assignment algorithm over the implicit complete tree; each (sequence,
    label) pair contributes the sequence to the label item's row set."""
    import math

    leaf_level = int(math.ceil(math.log2(len(item_to_code))))
    items = np.asarray(sorted(item_to_code), dtype=np.int64)
    code_of_item = np.asarray([item_to_code[int(i)] for i in items], dtype=np.int64)
    code_to_pos = {int(c): i for i, c in enumerate(code_of_item)}

    rows = []
    row_pos = []
    for seq, labels in zip(train_seqs_codes, train_labels_codes):
        for label in labels:
            if label >= 0 and int(label) in code_to_pos:
                rows.append(seq)
                row_pos.append(code_to_pos[int(label)])
    rows = (
        np.stack(rows)
        if rows
        else np.zeros((0, train_seqs_codes.shape[1]), dtype=np.int64)
    )
    return GenericTreeLearner(
        params=params,
        forward=forward,
        max_level=leaf_level,
        items=items,
        item_old_codes=code_of_item,
        rows_codes=np.asarray(rows, np.int64),
        row_item_pos=np.asarray(row_pos, np.int64),
        gap=gap,
        mesh=mesh,
    )


def write_projection_tree(
    tree: ArrayTree, projection: dict[int, int], path: str
) -> None:
    """Persist a learned projection as a pb tree (JTMTree.writeTree parity):
    leaf probability = the item's *old* leaf-node probability; ancestor
    probabilities = sums over descendant leaves."""
    from dismember_tpu.index.tree_io import write_tree

    ids = np.asarray(sorted(projection), dtype=np.int64)
    codes = np.asarray([projection[int(i)] for i in ids], dtype=np.int64)
    old_codes = tree.ids_to_codes(ids)
    probs = {
        int(i): float(tree.node_prob[c]) for i, c in zip(ids, old_codes) if c >= 0
    }
    write_tree(path, ids, codes, stat=probs)
