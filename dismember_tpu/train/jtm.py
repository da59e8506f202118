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
import functools
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



@functools.lru_cache(maxsize=8)
def _device_step_fn(forward, b: int, l: int, n_items: int):
    """Module-level step builder so alternation rounds (fresh learners over
    the SAME training rows) reuse the jit executable — the remote-compile
    relay takes minutes per program, and a per-learner closure would lose
    jax's compile cache with every round."""

    @functools.partial(
        jax.jit, static_argnames=("n_cand",), donate_argnums=(1,)
    )
    def step(params, acc, rows_d, pos_d, base_d, start, k, seq_lvl, n_cand):
        rows_b = jax.lax.dynamic_slice(rows_d, (start, 0), (b, l))
        pos_b = jax.lax.dynamic_slice(pos_d, (start,), (b,))
        base_b = jax.lax.dynamic_slice(base_d, (start,), (b,))
        cand = base_b[:, None] + jnp.arange(n_cand, dtype=jnp.int32)[None]
        chain = ((cand + 1) >> k) - 1
        valid_s = rows_b >= 0
        c1 = jnp.where(valid_s, rows_b, 0) + 1
        lev = 31 - jax.lax.clz(c1)
        shift = jnp.maximum(lev - seq_lvl, 0)
        anc = jnp.where(valid_s, (c1 >> shift) - 1, -1)
        seqs = jnp.where(seq_lvl >= 0, anc, rows_b)
        logits = forward(params, chain, seqs)
        idx = jnp.where(pos_b >= 0, pos_b, n_items)
        return acc.at[idx].add(logits)

    return step


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
    weights_mode: str = "auto"  # "device" | "host" | "auto"

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
        if self.weights_mode not in ("auto", "device", "host"):
            raise ValueError(f"unknown weights_mode {self.weights_mode!r}")
        if self.weights_mode == "device" and self.mesh is not None:
            # The device-resident accumulation runs single-device on the
            # un-sharded self.params and would silently bypass the sharded
            # _score_fn/_score_params built above.
            raise ValueError(
                "weights_mode='device' is single-chip only; with a mesh use "
                "weights_mode='host' (sharded scoring) or 'auto'"
            )
        # device-resident scoring is the default off-mesh: the host path
        # ships every score batch through the device link (3.6MB up + 1MB
        # down per 65536-row dispatch — measured 26ms device vs 6580ms
        # blocked wall through the relay, 99% of the 371s 1M-item sweep,
        # scripts/profile_jtm_sweep.py r4).  The mesh path keeps the
        # host-FIFO dispatch (its sharded forward handles the transfers).
        self._weights_device = self.weights_mode == "device" or (
            self.weights_mode == "auto" and self.mesh is None
        )
        self._dev_cache = None

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

    # ------------------------------------------------------------------
    # device-resident weight computation: rows/positions live on the device
    # across the whole sweep; per-batch dispatches carry only scalars; the
    # [num_items, 2^d] weight matrix accumulates on-device and downloads
    # ONCE per sweep step.  Link traffic per step drops from
    # O(batches * (chain + seqs + logits)) to one [R] upload + one [N, 2^d]
    # download — the 1M-item sweep's wall was 99% link transfer (see
    # __post_init__).
    # ------------------------------------------------------------------

    def _hierarchical_level(self, level: int) -> int:
        """Device twin of _seq_codes_at_level's routing: the ancestor level
        to map sequence codes to, or -1 for raw codes."""
        return -1

    def _ensure_device_rows(self):
        if self._dev_cache is not None:
            return self._dev_cache
        r, l = self.rows_codes.shape
        b = self.score_batch_rows
        r_pad = -(-max(r, 1) // b) * b
        rows = np.full((r_pad, l), -1, np.int32)
        rows[:r] = self.rows_codes
        pos = np.full(r_pad, -1, np.int32)
        pos[:r] = self.row_item_pos
        n_items = len(self.items)

        rows_dev = jnp.asarray(rows)
        pos_dev = jnp.asarray(pos)
        step = _device_step_fn(self.forward, b, l, n_items)
        self._dev_cache = (rows_dev, pos_dev, step, r_pad // b)
        return self._dev_cache

    def _accumulate_device(self, proj: np.ndarray, old_level: int, level: int):
        """Run the step's whole scoring pass on-device; returns the [N+1,
        2^d] f32 accumulator (row N collects padding) still on the device."""
        rows_dev, pos_dev, step, n_batches = self._ensure_device_rows()
        d = level - old_level
        n_cand = 1 << d
        n_items = len(self.items)
        b = self.score_batch_rows

        base = (proj.astype(np.int64) * n_cand + (n_cand - 1))[
            self.row_item_pos
        ]
        base_pad = np.zeros(n_batches * b, np.int32)
        base_pad[: len(base)] = base.astype(np.int32)
        base_dev = jnp.asarray(base_pad)

        acc = jnp.zeros((n_items + 1, n_cand), jnp.float32)
        dispatched = 0
        for k in range(d):
            seq_lvl = self._hierarchical_level(level - k)
            for bi in range(n_batches):
                acc = step(
                    self.params, acc, rows_dev, pos_dev, base_dev,
                    jnp.int32(bi * b), jnp.int32(k), jnp.int32(seq_lvl),
                    n_cand=n_cand,
                )
                dispatched += 1
                if dispatched % 64 == 0:
                    # bound the async dispatch queue through the relay
                    jax.block_until_ready(acc)
        return acc

    def _has_rows(self) -> np.ndarray:
        has_rows = np.zeros(len(self.items), dtype=bool)
        has_rows[self.row_item_pos[self.row_item_pos >= 0]] = True
        return has_rows

    def _compute_weights_device(
        self, proj: np.ndarray, old_level: int, level: int
    ) -> np.ndarray:
        acc = self._accumulate_device(proj, old_level, level)
        weights = np.asarray(acc)[: len(self.items)].astype(np.float64)
        weights[~self._has_rows()] = _LOW_WEIGHT
        return weights

    def _compute_choice_device(
        self, proj: np.ndarray, old_level: int, level: int
    ):
        """(choice_j [N] argmax column, fetch_rows(idx) -> f64 weight rows):
        the whole-matrix download shrinks to one int8/int32 argmax vector;
        only over-capacity segments fetch their weight rows (a small device
        gather), since the greedy rebalance is the only consumer."""
        acc = self._accumulate_device(proj, old_level, level)
        n_items = len(self.items)
        n_cand = acc.shape[1]
        amax = jnp.argmax(acc, axis=1)
        if n_cand <= 127:
            amax = amax.astype(jnp.int8)
        choice_j = np.asarray(amax)[:n_items].astype(np.int64)
        has_rows = self._has_rows()

        def fetch_rows(idx: np.ndarray) -> np.ndarray:
            rows = np.asarray(
                acc[jnp.asarray(np.asarray(idx, np.int32))]
            ).astype(np.float64)
            rows[~has_rows[np.asarray(idx)]] = _LOW_WEIGHT
            return rows

        return choice_j, fetch_rows

    def compute_weights(self, proj: np.ndarray, old_level: int, level: int) -> np.ndarray:
        """Weight matrix [num_items, 2^d]: candidate j of item i is descendant
        j of proj[i]; weight = sum over chain levels and the item's training
        rows of the model score.  Items without training rows get -1e6.

        Off-mesh the device-resident path accumulates on-device in f32 (one
        download per sweep step); ``weights_mode="host"`` keeps the
        reference-ordered f64 host accumulation (the parity twin — same
        scores, different summation order/precision)."""
        if self._weights_device:
            return self._compute_weights_device(proj, old_level, level)
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
        no_evidence: np.ndarray | None = None,  # [len(node_items)] bool
    ) -> dict[int, list[int]]:
        """Greedy capacity rebalance (TreeLearning.reBalance:217-265).

        Returns candidate code -> item positions."""
        order = np.argsort(-weights, axis=1, kind="stable")  # per item: cands desc
        # zero-training-row items carry no evidence (their rows are flat
        # _LOW_WEIGHT ties): the stable argsort would claim candidate 0 for
        # all of them; claim their OLD node first instead, matching
        # optimize()'s keep-old override (r5 — the scramble cost -23%
        # recall at 10M with a 12%-coverage row subset).  Keyed on the
        # caller-supplied evidence mask, NOT on value flatness: f32
        # accumulation can tie rows the f64 host path distinguishes, and a
        # value-keyed reorder would break host/device projection parity.
        if no_evidence is not None:
            for r in np.flatnonzero(no_evidence):
                jo = np.flatnonzero(candidates == old_codes[node_items[r]])
                if len(jo):
                    j = jo[0]
                    order[r] = np.concatenate(([j], order[r][order[r] != j]))
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
            # keep items whose OLD ancestor is this node first (reference
            # reBalance's stay preference); old_codes is indexed by ITEM
            # POSITION (t[0]) — indexing it by the segment-local row
            # (row_of_pos[pos]) read unrelated items' old codes and made
            # the preference noise (r5 fix)
            entries.sort(
                key=lambda t: (old_codes[t[0]] != best_node, -t[1])
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
            if self._weights_device:
                choice_j, fetch_rows = self._compute_choice_device(
                    proj, old_level, level
                )
            else:
                weights = self.compute_weights(proj, old_level, level)
                choice_j = np.argmax(weights, axis=1)
                fetch_rows = lambda idx: weights[idx]  # noqa: E731
            t_score = time.perf_counter() - t0
            old_codes = self._old_ancestors_at_level(level)
            max_assign = 1 << (max_level - level)
            n_cand = 1 << d

            # items with NO training rows carry no score evidence (every
            # candidate ties at _LOW_WEIGHT) and the argmax would dump them
            # all on candidate 0, scrambling their neighborhoods; keep them
            # under their OLD tree's ancestor instead (valid whenever that
            # ancestor lies inside the item's current candidate subtree —
            # always, while the item keeps following its old path).
            # Measured at 10M items with a 2M-row subset (12% window
            # coverage): the flat-tie argmax cost the JTM retrain stage
            # -23% recall vs its pre-JTM stage (BASELINE.md r5 row); the
            # reference never faces this — it learns over the full train
            # set or not at all (TreeLearning.scala:94-150).
            has_rows = self._has_rows()
            if not has_rows.all():
                j_old = old_codes - (
                    proj.astype(np.int64) * n_cand + (n_cand - 1)
                )
                keep = (~has_rows) & (j_old >= 0) & (j_old < n_cand)
                choice_j = np.where(keep, j_old, choice_j)

            # vectorized fast path: every item takes its argmax candidate
            # (== rebalance's first greedy pick — stable-descending order[.,0]);
            # the sequential greedy only ever changes assignments under a
            # child node that exceeded capacity, so only parent segments
            # containing an over-capacity child need it.  This replaces the
            # old O(N * #occupied-nodes) host scan (flatnonzero per node) —
            # at catalog scale (1M items, level 18: 260k nodes) that scan
            # alone was hours of host time.
            choice = proj * n_cand + (n_cand - 1) + choice_j
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
                # ONE batched weight fetch for every over-capacity segment:
                # per-segment fetches pay a device round-trip each, and the
                # segment count explodes toward the leaf level (capacity
                # 2^(max_level-level) -> 1) — measured 94.7s for one level
                # at 100k items before batching (data/r4/jtm_triage.log)
                need_rows = [
                    order_items[s0:e0]
                    for s0, e0 in zip(seg_starts[need], seg_ends[need])
                ]
                all_idx = (
                    np.concatenate(need_rows)
                    if need_rows
                    else np.zeros(0, np.int64)
                )
                all_rows = fetch_rows(all_idx)
                off = 0
                for node_items in need_rows:
                    node = int(proj[node_items[0]])
                    seg_rows = all_rows[off : off + len(node_items)]
                    off += len(node_items)
                    candidates = node * n_cand + (n_cand - 1) + np.arange(n_cand)
                    balanced = self.rebalance(
                        node_items,
                        candidates,
                        seg_rows,
                        old_codes,
                        max_assign,
                        no_evidence=~has_rows[node_items],
                    )
                    for child, positions in balanced.items():
                        assert len(positions) <= max_assign
                        for pos in positions:
                            new_proj[pos] = child
            proj = new_proj
            # split logged so wall growth across levels is attributable:
            # scoring is constant work per level; the greedy-rebalance host
            # loop scales with over-capacity segment count (explodes toward
            # the leaves) — the 10M-item sweep's +~25s/level growth needs
            # this attribution before optimizing either side
            logger.info(
                f"level {level} assign time: "
                f"{time.perf_counter() - t0:.3f}s "
                f"(score {t_score:.3f}s, rebalance segments "
                f"{len(over_parents)})"
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
        weights_mode: str = "auto",
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
            weights_mode=weights_mode,
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

    def _hierarchical_level(self, level: int) -> int:
        return level if self.hierarchical and level >= self.min_level else -1


def otm_tree_learner(
    params: dict,
    forward: Callable,
    item_to_code: dict[int, int],
    train_seqs_codes: np.ndarray,  # [N, L] mapped codes (-1 pad)
    train_labels_codes: np.ndarray,  # [N, label_num] mapped codes (-1 pad)
    gap: int = 2,
    mesh: object = None,
    score_batch_rows: int = 8192,
    weights_mode: str = "auto",
) -> GenericTreeLearner:
    """OTM tree construction (otm/.../tree/TreeConstruction.scala): the same
    assignment algorithm over the implicit complete tree; each (sequence,
    label) pair contributes the sequence to the label item's row set."""
    import math

    leaf_level = int(math.ceil(math.log2(len(item_to_code))))
    items = np.asarray(sorted(item_to_code), dtype=np.int64)
    code_of_item = np.asarray([item_to_code[int(i)] for i in items], dtype=np.int64)

    # vectorized (seq, label) -> row expansion: np.nonzero is row-major, so
    # row order matches the reference's nested loop exactly
    labels_arr = np.asarray(train_labels_codes, np.int64)
    pos_of_code = np.full(int(code_of_item.max(initial=0)) + 2, -1, np.int64)
    pos_of_code[code_of_item] = np.arange(len(code_of_item))
    safe = np.clip(labels_arr, 0, len(pos_of_code) - 1)
    mask = (labels_arr >= 0) & (pos_of_code[safe] >= 0)
    row_idx, _col = np.nonzero(mask)
    rows = np.asarray(train_seqs_codes, np.int64)[row_idx]
    row_pos = pos_of_code[labels_arr[mask]]
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
        score_batch_rows=score_batch_rows,
        weights_mode=weights_mode,
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
