"""Where do DR coordinate descent's 549s (1M items, batch mode) go?
(VERDICT r2 #8)

Phase-split of the M-step at catalog scale:

  beam    — blocked device beam-search calls (transfer + search + fetch;
            one ~30ms-RTT sync per batch by construction)
  keys    — composite path-key encode per batch (host numpy)
  agg     — lexsort + segment sums + per-item top-C (batch mode), or the
            rank-synchronous decay fold (streaming mode)
  greedy  — item-sequential J-path selection with the size penalty

plus the xplane device time of one beam batch, to separate device cost from
relay/dispatch overhead in the `beam` phase.

Usage: python scripts/profile_dr_cd.py [--items 1000000] [--mode batch|streaming]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--rows-per-item", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--cand", type=int, default=20)
    ap.add_argument("--mode", default="batch", choices=["batch", "streaming"])
    args = ap.parse_args()

    from dismember_tpu.data.dr_dataset import DRData
    from dismember_tpu.train import dr_coordinate as dc
    from dismember_tpu.train.dr import DRTrainer

    n = args.items
    r = n * args.rows_per_item
    rng = np.random.default_rng(0)
    data = DRData(
        item_to_id={}, id_to_item={}, num_items=n,
        train_seqs=rng.integers(0, n, size=(r, 10)).astype(np.int64),
        train_targets=np.repeat(np.arange(n, dtype=np.int64),
                                args.rows_per_item),
        eval_seqs=np.empty((0, 10), np.int64),
        eval_labels=np.empty((0, 1), np.int64),
        eval_users=np.empty((0,), np.int64), user_consumed={},
    )
    trainer = DRTrainer(
        data, num_layers=3, num_nodes=100, num_paths_per_item=2,
        embed_size=16, train_batch_size=args.batch * 2, num_sampled=8,
    )

    # --- beam + key phases (shared by both modes) -------------------------
    c = args.cand
    old_beam = trainer.beam
    trainer.beam = c
    t_beam = t_keys = 0.0
    keys_all = np.empty((r, c), np.int64)
    probs_all = np.empty((r, c), np.float64)
    for s in range(0, r, args.batch):
        e = min(s + args.batch, r)
        t0 = time.perf_counter()
        paths, probs = trainer.beam_search_paths(data.train_seqs[s:e])
        paths = np.asarray(paths)
        probs = np.asarray(probs, np.float64)
        t_beam += time.perf_counter() - t0
        t0 = time.perf_counter()
        keys_all[s:e] = dc._path_keys(paths.astype(np.int64), trainer.num_nodes)
        probs_all[s:e] = probs
        t_keys += time.perf_counter() - t0
    trainer.beam = old_beam
    n_calls = -(-r // args.batch)

    # --- aggregation phase -------------------------------------------------
    t0 = time.perf_counter()
    if args.mode == "batch":
        # reuse the collected beams: inline the batch-mode group-sum/top-C
        # (same code as _collect_batch_arrays minus its beam loop)
        items = np.repeat(data.train_targets, c)
        keys = keys_all.ravel()
        sc = probs_all.ravel()
        order = np.lexsort((keys, items))
        items_s, keys_s, sc_s = items[order], keys[order], sc[order]
        new = np.concatenate(
            [[True], (items_s[1:] != items_s[:-1]) | (keys_s[1:] != keys_s[:-1])]
        )
        seg = np.cumsum(new) - 1
        sums = np.bincount(seg, weights=sc_s)
        g_items, g_keys = items_s[new], keys_s[new]
        order2 = np.lexsort((-sums, g_items))
        gi, gk, gs = g_items[order2], g_keys[order2], sums[order2]
        first = np.concatenate([[True], gi[1:] != gi[:-1]])
        group = np.cumsum(first) - 1
        pos = np.arange(len(gi))
        rank = pos - pos[first][group]
        keep = rank < c
        items_u = gi[first]
        cand_keys = np.full((len(items_u), c), -1, np.int64)
        cand_scores = np.full((len(items_u), c), -np.inf)
        cand_keys[group[keep], rank[keep]] = gk[keep]
        cand_scores[group[keep], rank[keep]] = gs[keep]
    else:
        # streaming fold over the pre-collected beams: patch the collector's
        # beam loop away by calling it with the trainer beams cached — the
        # fold itself dominates; measure it directly via the module function
        # on a trainer whose beam_search_paths replays the cache.
        class _Replay:
            def __init__(self, tr):
                self._tr = tr
                self.pos = 0
                self.num_nodes = tr.num_nodes
                self.num_layers = tr.num_layers
                self.beam = tr.beam

            def beam_search_paths(self, seqs):
                s = self.pos
                e = s + len(seqs)
                self.pos = e
                paths = dc._keys_to_paths(
                    keys_all[s:e].ravel(), self.num_nodes, self.num_layers
                ).reshape(e - s, c, self.num_layers)
                return paths, probs_all[s:e]

        rp = _Replay(trainer)
        items_u, cand_keys, cand_scores = dc._collect_streaming_arrays(
            rp, data.train_seqs, data.train_targets, c, args.batch,
            decay_factor=0.999,
        )
    t_agg = time.perf_counter() - t0

    # --- greedy phase (inline copy of coordinate_descent's selection loop) --
    occ = np.bincount(data.train_targets, minlength=n)
    j_paths = trainer.num_paths
    q = 4.0
    penalty_factor = 3e-6
    t0 = time.perf_counter()
    row_of_item = np.full(n, -1, np.int64)
    row_of_item[items_u] = np.arange(len(items_u))
    uniq_keys, inv = np.unique(cand_keys, return_inverse=True)
    cand_idx = inv.reshape(cand_keys.shape)
    path_size = np.zeros(len(uniq_keys), np.int64)
    valid = cand_scores > -np.inf
    sel_idx = np.full((len(items_u), j_paths), -1, np.int64)
    for v in range(n):
        rr = row_of_item[v]
        if occ[v] == 0 or rr < 0:
            continue
        nv = occ[v]
        ci, sc, ok = cand_idx[rr], cand_scores[rr], valid[rr]
        partial = 0.0
        chosen = []
        for j in range(j_paths):
            use = ok & ~np.isin(ci, chosen)
            if not use.any():
                use = ok
            sizes = path_size[ci].astype(np.float64)
            pen = penalty_factor * ((sizes + 1.0) ** q - sizes**q) / q
            gains = np.where(
                use,
                nv * (np.log1p(sc + partial) - np.log1p(partial)) - pen,
                -np.inf,
            )
            b = int(np.argmax(gains))
            if not np.isfinite(gains[b]):
                b = int(np.argmax(np.where(use, sc, -np.inf)))
            path_size[ci[b]] += 1
            chosen.append(int(ci[b]))
            partial += float(sc[b])
        sel_idx[rr] = chosen
    t_greedy = time.perf_counter() - t0

    total = t_beam + t_keys + t_agg + t_greedy
    print(f"mode={args.mode}  total {total:.1f}s  "
          f"({n_calls} blocked beam calls)")
    for name, v in [("beam", t_beam), ("keys", t_keys), ("agg", t_agg),
                    ("greedy", t_greedy)]:
        print(f"  {name:7s} {v:7.1f}s ({100*v/total:.0f}%)")

    from devtime import device_time_ms
    import jax.numpy as jnp
    trainer.beam = c
    sq = data.train_seqs[: args.batch]
    trainer._sync_mirrors()
    from dismember_tpu.retrieval.path_beam import path_beam_search
    ms = device_time_ms(
        lambda: path_beam_search(
            trainer.layer_params, jnp.asarray(sq, jnp.int32), c, 0,
            trainer.num_nodes, trainer.num_layers,
        ),
        iters=10,
    )
    print(f"one beam batch ({args.batch} rows): {ms:.2f} ms device "
          f"vs {t_beam/n_calls*1e3:.0f} ms blocked wall")


if __name__ == "__main__":
    main()
