"""Deep Retrieval M-step: coordinate-descent path re-assignment.

Parity with deep-retrieval/.../optim/CoordinateDescent.scala:12-219:
- per training sample, beam-search the top ``num_candidate_path`` paths with
  probabilities; aggregate per item either in ``batch`` mode (sum of path
  probabilities over all of the item's samples, keep top candidates) or
  ``streaming`` mode (per-batch merge with decay factor; unseen paths enter
  at ``decay * min_score + new``);
- per item (num_iteration rounds), greedily pick J paths maximizing
  ``N_v * (log1p(score + partial) - log1p(partial)) - penalty`` where the
  penalty is ``penalty_factor * ((s+1)^q - s^q)/q`` on the path's current
  size (``penaltyFunc``); previously selected paths are excluded; on rounds
  t > 1 the item's previous paths release their size first;
- items that never occur as a target get J random paths.

TPU-first: the expensive part — beam search over the whole training set — is
the batched ``path_beam_search`` jit; aggregation and the greedy selection
are host dict loops (inherently sequential, tiny).
"""

from __future__ import annotations

import logging

import numpy as np

from dismember_tpu.index.paths import PathIndex

logger = logging.getLogger("dismember_tpu.dr_cd")


def _penalty(path_size: int, poly_order: int) -> float:
    f = lambda s: float(s) ** poly_order / poly_order  # noqa: E731
    return f(path_size + 1) - f(path_size)


def collect_path_scores(
    trainer,
    train_seqs: np.ndarray,
    train_targets: np.ndarray,
    num_candidate_path: int,
    batch_size: int,
    mode: str = "batch",
    decay_factor: float = 0.999,
) -> dict[int, list[tuple[tuple, float]]]:
    """item -> top candidate (path, score) list via beam search over the
    training data (batchPathScore / streamingPathScore)."""
    scores: dict[int, dict[tuple, float]] = {}
    n = len(train_seqs)
    old_beam = trainer.beam
    for s in range(0, n, batch_size):
        e = min(s + batch_size, n)
        trainer.beam = num_candidate_path
        paths, probs = trainer.beam_search_paths(train_seqs[s:e])
        trainer.beam = old_beam
        for i in range(e - s):
            item = int(train_targets[s + i])
            cand = {
                tuple(int(x) for x in paths[i, j]): float(probs[i, j])
                for j in range(paths.shape[1])
            }
            if mode == "batch":
                agg = scores.setdefault(item, {})
                for p, v in cand.items():
                    agg[p] = agg.get(p, 0.0) + v
            else:  # streaming
                if item not in scores:
                    scores[item] = dict(cand)
                else:
                    orig = scores[item]
                    min_score = min(orig.values())
                    merged: dict[tuple, float] = {}
                    for p in set(orig) | set(cand):
                        if p in orig and p in cand:
                            merged[p] = decay_factor * orig[p] + cand[p]
                        elif p in cand:
                            merged[p] = decay_factor * min_score + cand[p]
                        else:
                            merged[p] = decay_factor * orig[p]
                    top = sorted(merged.items(), key=lambda kv: -kv[1])[
                        :num_candidate_path
                    ]
                    scores[item] = dict(top)
    out: dict[int, list[tuple[tuple, float]]] = {}
    for item, agg in scores.items():
        top = sorted(agg.items(), key=lambda kv: -kv[1])[:num_candidate_path]
        out[item] = top
    return out


def coordinate_descent(
    trainer,
    train_seqs: np.ndarray,
    train_targets: np.ndarray,
    num_iteration: int = 1,
    num_candidate_path: int = 20,
    batch_size: int = 8192,
    mode: str = "batch",
    decay_factor: float = 0.999,
    penalty_factor: float = 3e-6,
    penalty_poly_order: int = 4,
    seed: int = 0,
) -> PathIndex:
    """Run the M-step; returns a new PathIndex."""
    num_items = trainer.data.num_items
    num_layers = trainer.num_layers
    num_nodes = trainer.num_nodes
    j_paths = trainer.num_paths
    rng = np.random.default_rng(seed)

    occurrence: dict[int, int] = {}
    for t in train_targets:
        occurrence[int(t)] = occurrence.get(int(t), 0) + 1

    item_scores = collect_path_scores(
        trainer,
        train_seqs,
        train_targets,
        num_candidate_path,
        batch_size,
        mode,
        decay_factor,
    )

    mapping: dict[int, list[tuple]] = {}
    path_size: dict[tuple, int] = {}
    for t in range(1, num_iteration + 1):
        for v in range(num_items):
            if v not in occurrence or v not in item_scores:
                mapping[v] = [
                    tuple(rng.integers(0, num_nodes, num_layers).tolist())
                    for _ in range(j_paths)
                ]
                continue
            nv = occurrence[v]
            cand_all = item_scores[v]
            selected: list[tuple] = []
            partial = 0.0
            for j in range(j_paths):
                if t > 1:
                    old = mapping[v][j]
                    path_size[old] = path_size.get(old, 0) - 1
                cands = [
                    (p, sc) for p, sc in cand_all if p not in selected
                ] or cand_all
                best_path, best_sc, best_gain = None, 0.0, -np.inf
                for p, sc in cands:
                    size = path_size.get(p, 0)
                    pen = penalty_factor * _penalty(size, penalty_poly_order)
                    gain = nv * (np.log1p(sc + partial) - np.log1p(partial)) - pen
                    if gain > best_gain:
                        best_gain, best_sc, best_path = gain, sc, p
                if best_path is None:  # all gains NaN/-inf — keep first cand
                    best_path, best_sc = cands[0]
                path_size[best_path] = path_size.get(best_path, 0) + 1
                selected.append(best_path)
                # accumulate the selected path's *score* (the paper's running
                # sum; the reference accumulates the penalized gain instead —
                # dr CoordinateDescent.scala:62-75 — which can drive the
                # log1p argument below -1 and NaN the remaining selections)
                partial += best_sc
            mapping[v] = selected

    item_paths = np.zeros((num_items, j_paths, num_layers), dtype=np.int32)
    for v, paths in mapping.items():
        for j, p in enumerate(paths):
            item_paths[v, j] = p
    return PathIndex(item_paths=item_paths, num_nodes=num_nodes)
