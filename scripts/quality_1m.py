"""End-to-end quality at a 1M-item catalog (VERDICT r2 #4).

Every deep-catalog number so far is synthetic *throughput*; every quality
number is the 3.3k-item movielens sample.  This script shows that training
at 1M items actually LEARNS — loss decreases and held-out recall improves
across one full alternation round — for TDM (train -> re-cluster tree from
learned embeddings -> retrain) and DR (train -> coordinate descent ->
retrain).  The reference cannot run this protocol at this scale at all
(single-JVM, dense CPU training); the alternation semantics match
doc/TDM.md / doc/Deep-Retrieval.md.

Synthetic catalog with learnable structure: G genre blocks over 1M items;
each user draws two genres (Zipf) and a 30-item stream from them (Zipf
within genre, 85/15 genre mix).  Per user: first items -> sliding training
windows (seq_len 10 -> next-item target, the TreeInit windowing), last
``eval_tail`` items held out for recall@10 with consumed filtering.

Usage:
  python scripts/quality_1m.py tdm [--items 1000000 --users 150000]
  python scripts/quality_1m.py dr  [...]
"""

import argparse
import json
import logging
import os
import sys
import tempfile
import time

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s %(name)s %(message)s",
)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SEQ_LEN = 10
STREAM = 30
EVAL_TAIL = 4


def gen_catalog(n_items, n_users, n_genres, seed=0):
    """Returns (train_seqs [N,L], train_targets [N], eval_seqs [M,L],
    eval_labels [M,EVAL_TAIL], eval_users [M], consumed dict) in RAW item
    ids 1..n_items (0 = padding)."""
    rng = np.random.default_rng(seed)
    per_genre = n_items // n_genres

    # user genre pair: Zipf over genres; item within genre: Zipf over block
    g_rank = rng.permutation(n_genres)
    g_p = 1.0 / (np.arange(1, n_genres + 1) ** 1.05)
    g_p /= g_p.sum()
    u_g1 = g_rank[rng.choice(n_genres, size=n_users, p=g_p)]
    u_g2 = g_rank[rng.choice(n_genres, size=n_users, p=g_p)]

    i_p = 1.0 / (np.arange(1, per_genre + 1) ** 1.2)
    i_p /= i_p.sum()
    # stream: per position pick genre1 w.p. 0.85 else genre2, then a
    # Zipf-ranked item inside that genre's block
    pick2 = rng.random(size=(n_users, STREAM)) < 0.15
    g = np.where(pick2, u_g2[:, None], u_g1[:, None])
    ranks = rng.choice(per_genre, size=(n_users, STREAM), p=i_p)
    # per-genre rank->item shuffle (cheap: offset by a per-genre rotation)
    rot = rng.integers(0, per_genre, size=n_genres)
    items = g * per_genre + (ranks + rot[g]) % per_genre + 1  # 1-based ids

    # windows: targets at positions SEQ_LEN .. STREAM-EVAL_TAIL-1
    t_lo, t_hi = SEQ_LEN, STREAM - EVAL_TAIL
    n_win = t_hi - t_lo
    idx = np.arange(SEQ_LEN)[None, :] + np.arange(n_win)[:, None]  # [W, L]
    train_seqs = items[:, idx].reshape(n_users * n_win, SEQ_LEN)
    train_targets = items[:, t_lo:t_hi].reshape(-1)

    eval_seqs = items[:, t_hi - SEQ_LEN : t_hi]
    eval_labels = items[:, t_hi:]
    eval_users = np.arange(n_users)
    consumed = {u: items[u, :t_hi] for u in range(n_users)}
    return (
        train_seqs.astype(np.int64), train_targets.astype(np.int64),
        eval_seqs.astype(np.int64), eval_labels.astype(np.int64),
        eval_users, consumed, items,
    )


def _popularity_recall(train_targets, eval_labels, consumed, eval_users,
                       n_eval=20_000, topk=10):
    """Context baseline: top-k most frequent training targets, consumed-
    filtered per user.  Zipf-heavy synthetic data makes this strong; the
    learned model must beat it for the quality claim to mean anything."""
    from dismember_tpu.core.metrics import compute_metrics_batch

    n_eval = min(n_eval, len(eval_users))
    vals, counts = np.unique(train_targets, return_counts=True)
    pop = vals[np.argsort(-counts)][: topk + STREAM]
    recs = np.empty((n_eval, topk), np.int64)
    for i in range(n_eval):
        cons = set(consumed[int(eval_users[i])].tolist())
        row = [p for p in pop if int(p) not in cons][:topk]
        recs[i] = row + [-1] * (topk - len(row))
    _, r, nd = compute_metrics_batch(recs, eval_labels[:n_eval])
    return float(r.mean()), float(nd.mean())


def _recall_tdm(trainer, eval_seqs, eval_labels, consumed, eval_users,
                n_eval=20_000, batch=4096):
    """recall@10 over a fixed eval subset (consumed-filtered)."""
    from dismember_tpu.core.metrics import compute_metrics_batch

    sel = slice(0, n_eval)
    recs = trainer.recommend_batch(
        eval_seqs[sel],
        consumed=[consumed[int(u)] for u in eval_users[sel]],
        batch_size=batch,
    )
    rec_padded = np.full((len(recs), trainer.topk), -1, dtype=np.int64)
    for i, r in enumerate(recs):
        rec_padded[i, : len(r)] = r
    p, r, nd = compute_metrics_batch(rec_padded, eval_labels[sel])
    m = len(recs)
    return float(r.sum()) / m, float(nd.sum()) / m


def run_tdm(args) -> None:
    from dismember_tpu.index.arraytree import ArrayTree
    from dismember_tpu.index.cluster import tree_cluster
    from dismember_tpu.index.tree_io import write_tree
    from dismember_tpu.train.tdm import TDMTrainer

    (train_seqs, train_targets, eval_seqs, eval_labels, eval_users,
     consumed, items_mat) = gen_catalog(
         args.items, args.users, args.genres, args.seed)
    n = args.items
    rng = np.random.default_rng(args.seed)
    ids = np.arange(1, n + 1, dtype=np.int64)
    leaf_level = int(np.ceil(np.log2(n)))
    if args.init == "random":
        # random initial tree: the alternation must earn its structure.
        # Measured outcome (BASELINE.md): at 1M items the model LEARNS but
        # 2-epoch embeddings of a random tree cluster near-randomly
        # (diagnose_alternation.py purity 0.028 vs 0.747 ceiling), so the
        # relearned trees hurt recall.
        codes0 = (1 << leaf_level) - 1 + rng.permutation(n)
    else:
        # the reference's init (TreeInit/category_sorted_codes): ids are
        # genre-contiguous by construction, so identity order = category
        # sort
        codes0 = (1 << leaf_level) - 1 + (ids - 1)

    neg_counts = None

    def make_trainer(codes):
        nonlocal neg_counts
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "t.bin")
            write_tree(p, ids, codes)
            tree = ArrayTree.from_file(p)
        if neg_counts is None:
            neg_counts = ",".join(
                str(min(i, 2**i - 1)) for i in range(tree.max_level + 1)
            )
        return TDMTrainer(
            tree=tree, model_type="din", embed_size=args.embed,
            learning_rate=args.lr, total_batch_size=args.batch,
            layer_neg_counts=neg_counts, topk=10, beam_size=20,
            seed=args.seed,
        ), tree

    # resident driver: dataset device-resident, chunked lax.scan dispatches
    # (train_resident) — at 10M items the host loop's per-step relay upload
    # would dominate the wall (28ms wall vs 2.6ms device, CLAUDE.md)
    t_lo, t_hi = SEQ_LEN, STREAM - EVAL_TAIL
    use_resident = args.resident != "off" and (
        args.resident == "on" or n >= 2_000_000
    )

    def stage(name, trainer, iters):
        from dismember_tpu.train.tdm import ResidentWindows

        ckpt = os.path.join(args.ckpt_dir, name) if args.ckpt_dir else None
        t0 = time.perf_counter()
        if use_resident:
            win = ResidentWindows.from_items(
                trainer.tree, items_mat, SEQ_LEN, t_lo, t_hi
            )
            logs = trainer.train_resident(
                win, iterations=iters, chunk=args.chunk,
                progress_interval=max(iters // 8, 1),
                checkpoint_path=ckpt, checkpoint_every=args.ckpt_every,
            )
        else:
            logs = trainer.train(
                train_seqs, train_targets, iterations=iters,
                progress_interval=max(iters // 8, 1),
                checkpoint_path=ckpt, checkpoint_every=args.ckpt_every,
            )
        wall = time.perf_counter() - t0
        first, last = logs[0]["train_loss"], logs[-1]["train_loss"]
        t1 = time.perf_counter()
        rec, nd = _recall_tdm(
            trainer, eval_seqs, eval_labels, consumed, eval_users
        )
        print(json.dumps({
            "stage": name, "loss_first": round(first, 4),
            "loss_last": round(last, 4), "recall@10": round(rec, 5),
            "ndcg@10": round(nd, 5), "train_wall_s": round(wall, 1),
            "eval_wall_s": round(time.perf_counter() - t1, 1),
        }), flush=True)
        return rec

    pop_rec, pop_nd = _popularity_recall(
        train_targets, eval_labels, consumed, eval_users
    )
    print(json.dumps({
        "stage": "popularity_baseline", "recall@10": round(pop_rec, 5),
        "ndcg@10": round(pop_nd, 5),
    }), flush=True)

    trainer, tree = make_trainer(codes0)
    r1 = stage(f"tdm_train_{args.init}_tree", trainer, args.iters)
    trainer.opt_state = None  # mirrors are synced; free the packed/moment
    # state (~17GB at 10M items) — each stage trains from scratch

    # re-cluster the tree from the learned leaf embeddings; genre purity of
    # the level-ceil(log2(G)) subtrees diagnoses cluster quality (items are
    # genre-contiguous by id, so genre(id) = (id-1)//per_genre)
    per_genre = n // args.genres
    anc_level = int(np.ceil(np.log2(args.genres)))

    def purity(codes):
        anc = codes.copy()
        for _ in range(leaf_level - anc_level):
            anc = (anc - 1) // 2
        g = (ids - 1) // per_genre
        order = np.lexsort((g, anc))
        anc_s, g_s = anc[order], g[order]
        new_run = np.ones(len(anc_s), bool)
        new_run[1:] = (anc_s[1:] != anc_s[:-1]) | (g_s[1:] != g_s[:-1])
        run_ids = np.cumsum(new_run) - 1
        run_counts = np.bincount(run_ids)
        run_anc = anc_s[new_run]
        best = {}
        for a, c in zip(run_anc, run_counts):
            if c > best.get(a, 0):
                best[a] = c
        return float(sum(best.values())) / n

    if args.skip_cluster:
        # shortened 10M protocol (VERDICT r4 #2): one alternation stage —
        # go straight to JTM tree learning off the stage-1 model
        r2 = None
        trainer2 = None
    t0 = time.perf_counter()
    if args.skip_cluster:
        pass
    elif args.cluster_features == "cooc":
        # round-4 fix: cluster on session co-occurrence statistics instead
        # of leaf embeddings (the r3 diagnosis root cause: 2-epoch leaf
        # embeddings carry no genre signal — purity 0.017-0.028 vs 0.747
        # ceiling; cooc features reach 0.193 at 200k items)
        from dismember_tpu.index.cluster import cooccurrence_embeddings

        feats = cooccurrence_embeddings(
            train_seqs - 1, train_targets - 1, n, dim=32, seed=args.seed
        )
    else:
        feats = np.asarray(trainer.params["embedding"])[
            tree.ids_to_codes(ids)
        ].astype(np.float32)
    if not args.skip_cluster:
        _, new_codes = tree_cluster(ids, feats, cluster_iter=5, seed=args.seed)
        cluster_wall = time.perf_counter() - t0
        print(json.dumps({
            "stage": "tdm_recluster", "features": args.cluster_features,
            "wall_s": round(cluster_wall, 1),
            "purity": round(purity(new_codes), 4),
            "purity_init": round(purity(codes0), 4),
        }), flush=True)

        trainer2, _ = make_trainer(new_codes)
        r2 = stage("tdm_retrain_clustered_tree", trainer2, args.iters)

    if args.skip_jtm:
        print(json.dumps({
            "stage": "tdm_summary", "init": args.init,
            "features": args.cluster_features,
            "recall_init_tree": round(r1, 5),
            "recall_clustered": round(r2, 5),
            "improved": bool(r2 > r1),
        }), flush=True)
        return

    # JTM tree learning (the reference's model-matched index relearn,
    # doc/JTM.md): assign items to leaves maximizing the CURRENT model's
    # score.  The alternation continues from the better stage so far — a
    # relearn off a degraded tree/model compounds the damage (measured:
    # JTM off the near-random clustered tree gave 0.042 vs 0.062).
    from dismember_tpu.train.jtm import TreeLearner, write_projection_tree

    base = trainer2 if (r2 is not None and r2 >= r1) else trainer
    if trainer2 is not None and base is not trainer2:
        del trainer2  # release the losing stage's device buffers
    t0 = time.perf_counter()
    # weights_mode="host": one-shot sweep in the relay environment — the
    # device-resident path pays a ~300s per-process remote compile that the
    # host-FIFO path amortizes better for a single sweep (data/r4 triage)
    learner = TreeLearner(
        tree=base.tree, params=base.params, forward=base.forward,
        train_seqs=train_seqs[: args.jtm_rows],
        train_targets=train_targets[: args.jtm_rows],
        gap=2, score_batch_rows=65536, weights_mode="host",
    )
    proj = learner.optimize()
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t3.bin")
        write_projection_tree(base.tree, proj, p)
        from dismember_tpu.index.arraytree import ArrayTree as _AT

        tree3 = _AT.from_file(p)
    jtm_codes = tree3.ids_to_codes(ids)
    print(json.dumps({
        "stage": "tdm_jtm_tree_learning", "wall_s":
        round(time.perf_counter() - t0, 1),
        "purity": round(purity(jtm_codes), 4),
    }), flush=True)
    # release earlier stages' device buffers (the packed p|m|v state is
    # ~17GB at 10M items) BEFORE the retrain stage allocates its own
    del learner, base, trainer
    trainer3 = TDMTrainer(
        tree=tree3, model_type="din", embed_size=args.embed,
        learning_rate=args.lr, total_batch_size=args.batch,
        layer_neg_counts=neg_counts, topk=10, beam_size=20, seed=args.seed,
    )
    r3 = stage("tdm_retrain_jtm_tree", trainer3, args.iters)
    print(json.dumps({
        "stage": "tdm_summary", "init": args.init,
        "recall_init_tree": round(r1, 5),
        "recall_clustered": None if r2 is None else round(r2, 5),
        "recall_jtm": round(r3, 5),
        "improved": bool(max(filter(None, [r2, r3])) > r1),
    }), flush=True)


def run_otm(args) -> None:
    """OTM end-to-end at catalog scale (VERDICT r3 #5): train on the init
    mapping -> construct tree from model scores (otm TreeConstruction) ->
    retrain on the constructed mapping, held-out recall per stage.
    Protocol anchor: /root/reference/doc/OTM.md:22."""
    from dismember_tpu.core.metrics import compute_metrics_batch
    from dismember_tpu.data.otm_dataset import OTMData
    from dismember_tpu.train.jtm import otm_tree_learner
    from dismember_tpu.train.otm import OTMTrainer

    (train_seqs, train_targets, eval_seqs, eval_labels, eval_users,
     consumed, _items_mat) = gen_catalog(
         args.items, args.users, args.genres, args.seed)
    n = args.items
    rng = np.random.default_rng(args.seed)
    ids = np.arange(1, n + 1, dtype=np.int64)
    leaf_level = int(np.ceil(np.log2(n)))
    leaf_lo = (1 << leaf_level) - 1
    n_nodes = (1 << (leaf_level + 1)) - 1
    if args.init == "random":
        perm = rng.permutation(n)
    else:
        perm = np.arange(n)  # ids are genre-contiguous: identity = category
    rows = min(args.otm_rows, len(train_targets))
    sub = rng.permutation(len(train_targets))[:rows]
    tr_seqs_raw = train_seqs[sub]
    tr_tgt_raw = train_targets[sub]

    per_genre = n // args.genres
    anc_level = int(np.ceil(np.log2(args.genres)))

    def purity(code_of_id_arr):
        anc = code_of_id_arr[ids].copy()
        for _ in range(leaf_level - anc_level):
            anc = (anc - 1) >> 1
        g = (ids - 1) // per_genre
        order = np.lexsort((g, anc))
        anc_s, g_s = anc[order], g[order]
        new_run = np.ones(len(anc_s), bool)
        new_run[1:] = (anc_s[1:] != anc_s[:-1]) | (g_s[1:] != g_s[:-1])
        run_ids = np.cumsum(new_run) - 1
        run_counts = np.bincount(run_ids)
        run_anc = anc_s[new_run]
        best = {}
        for a, c in zip(run_anc, run_counts):
            if c > best.get(a, 0):
                best[a] = c
        return float(sum(best.values())) / n

    def make_trainer(code_of_id_arr):
        to_codes = lambda x: np.where(  # noqa: E731
            x > 0, code_of_id_arr[np.maximum(x, 0)], -1
        )
        item_to_code = dict(
            zip(ids.tolist(), code_of_id_arr[ids].tolist())
        )
        all_nodes = np.zeros(n_nodes, bool)
        cur = code_of_id_arr[ids]
        all_nodes[cur] = True
        for _ in range(leaf_level):
            cur = np.unique((cur - 1) >> 1)
            cur = cur[cur >= 0]
            all_nodes[cur] = True
        data = OTMData(
            item_to_code=item_to_code,
            code_to_item={v: k for k, v in item_to_code.items()},
            leaf_level=leaf_level, num_items=n, all_nodes=all_nodes,
            train_seqs=to_codes(tr_seqs_raw).astype(np.int64),
            train_labels=to_codes(tr_tgt_raw[:, None]).astype(np.int64),
            train_users=np.zeros(rows, np.int64),
            eval_seqs=to_codes(eval_seqs[:8]).astype(np.int64),
            eval_labels=to_codes(eval_labels[:8, :1]).astype(np.int64),
            eval_users=np.zeros(8, np.int64),
            user_consumed={}, label_num=1,
        )
        trainer = OTMTrainer(
            data, model_type="din", embed_size=args.embed,
            learning_rate=args.lr, beam_size=20, topk=10, seq_len=SEQ_LEN,
            total_train_batch_size=args.otm_total_batch, seed=args.seed,
            target_mode="pseudo",
        )
        return trainer, to_codes

    id_of_code = np.zeros(n_nodes + 1, np.int64)

    def recall_otm(trainer, code_of_id_arr, to_codes, n_eval=20_000,
                   batch=4096, topk=10):
        id_of_code[:] = 0
        id_of_code[code_of_id_arr[ids]] = ids
        n_eval = min(n_eval, len(eval_seqs))
        max_c = max(len(consumed[int(u)]) for u in eval_users[:n_eval])
        rec_sum = nd_sum = 0.0
        for s in range(0, n_eval, batch):
            e = min(s + batch, n_eval)
            codes_b, scores_b = trainer.batch_beam_search(
                to_codes(eval_seqs[s:e]).astype(np.int64)
            )
            codes_b = np.asarray(codes_b)
            rec_ids = np.where(
                (codes_b >= 0) & (codes_b <= n_nodes),
                id_of_code[np.clip(codes_b, 0, n_nodes)], 0,
            )
            ok = rec_ids > 0
            cons = np.zeros((e - s, max_c), np.int64)
            for i, u in enumerate(eval_users[s:e]):
                c = consumed[int(u)]
                cons[i, : len(c)] = c
            ok &= ~(rec_ids[:, :, None] == cons[:, None, :]).any(-1)
            masked = np.where(ok, np.asarray(scores_b, np.float64), -np.inf)
            order = np.argsort(-masked, axis=1, kind="stable")[:, :topk]
            sel_ids = np.take_along_axis(rec_ids, order, axis=1)
            sel_ok = np.isfinite(np.take_along_axis(masked, order, axis=1))
            sel_ids = np.where(sel_ok, sel_ids, -1)
            _, r, nd = compute_metrics_batch(sel_ids, eval_labels[s:e])
            rec_sum += float(r.sum())
            nd_sum += float(nd.sum())
        return rec_sum / n_eval, nd_sum / n_eval

    pop_rec, pop_nd = _popularity_recall(
        train_targets, eval_labels, consumed, eval_users
    )
    print(json.dumps({
        "stage": "popularity_baseline", "recall@10": round(pop_rec, 5),
        "ndcg@10": round(pop_nd, 5),
    }), flush=True)

    code0 = np.zeros(n + 1, np.int64)
    code0[ids] = leaf_lo + perm

    def stage(name, code_of_id_arr):
        trainer, to_codes = make_trainer(code_of_id_arr)
        t0 = time.perf_counter()
        logs = trainer.train(num_epochs=args.otm_epochs)
        wall = time.perf_counter() - t0
        t1 = time.perf_counter()
        rec, nd = recall_otm(trainer, code_of_id_arr, to_codes)
        print(json.dumps({
            "stage": name,
            "loss_last_level_first_epoch": round(
                logs[0]["level_losses"][-1], 4
            ),
            "loss_last_level_last_epoch": round(
                logs[-1]["level_losses"][-1], 4
            ),
            "recall@10": round(rec, 5), "ndcg@10": round(nd, 5),
            "train_wall_s": round(wall, 1),
            "eval_wall_s": round(time.perf_counter() - t1, 1),
        }), flush=True)
        return trainer, to_codes, rec

    trainer1, to_codes1, r1 = stage(f"otm_train_{args.init}_mapping", code0)

    # tree construction from the trained model's scores (TreeConstruction)
    trainer1._sync_mirrors()
    t0 = time.perf_counter()
    n_learn = min(args.jtm_rows, rows)
    learner = otm_tree_learner(
        params=trainer1.params, forward=trainer1.forward,
        item_to_code=dict(zip(ids.tolist(), code0[ids].tolist())),
        train_seqs_codes=to_codes1(tr_seqs_raw[:n_learn]),
        train_labels_codes=to_codes1(tr_tgt_raw[:n_learn, None]),
        gap=2, score_batch_rows=65536, weights_mode="host",
    )
    proj = learner.optimize()
    code1 = np.zeros(n + 1, np.int64)
    code1[np.asarray(list(proj.keys()), np.int64)] = np.asarray(
        list(proj.values()), np.int64
    )
    print(json.dumps({
        "stage": "otm_tree_construction",
        "wall_s": round(time.perf_counter() - t0, 1),
        "purity": round(purity(code1), 4),
        "purity_init": round(purity(code0), 4),
    }), flush=True)

    _trainer2, _to_codes2, r2 = stage("otm_retrain_constructed_tree", code1)
    print(json.dumps({
        "stage": "otm_summary", "init": args.init,
        "recall_init": round(r1, 5), "recall_constructed": round(r2, 5),
        "improved": bool(r2 > r1),
    }), flush=True)


def _path_stats(path_index, num_nodes: int) -> dict:
    """Path-size distribution of a PathIndex: after an M-step on a weakly
    trained model, items concentrate onto popular candidate paths, and any
    path beyond ``max_items_per_path`` is truncated at serving."""
    keys = np.zeros(path_index.item_paths.shape[:2], np.int64)
    for d in range(path_index.item_paths.shape[2]):
        keys = keys * num_nodes + path_index.item_paths[:, :, d]
    _, counts = np.unique(keys.reshape(-1), return_counts=True)
    pct = np.percentile(counts, [50, 90, 99])
    over = counts[counts > 128]
    return {
        "distinct_paths": int(len(counts)),
        "size_p50": float(pct[0]), "size_p90": float(pct[1]),
        "size_p99": float(pct[2]), "size_max": int(counts.max()),
        "assignments_on_paths_gt128": int(over.sum() - 128 * len(over)),
    }


def run_dr(args) -> None:
    from dismember_tpu.core.metrics import compute_metrics_batch
    from dismember_tpu.data.dr_dataset import DRData
    from dismember_tpu.retrieval.dr_serve import make_dr_serving_fn
    from dismember_tpu.train.dr import DRTrainer
    from dismember_tpu.train.dr_coordinate import coordinate_descent

    (train_seqs, train_targets, eval_seqs, eval_labels, eval_users,
     consumed, _items_mat) = gen_catalog(
         args.items, args.users, args.genres, args.seed)
    # DR uses dense 0-based ids
    data = DRData(
        item_to_id={}, id_to_item={}, num_items=args.items,
        train_seqs=train_seqs - 1, train_targets=train_targets - 1,
        eval_seqs=np.empty((0, SEQ_LEN), np.int64),
        eval_labels=np.empty((0, 1), np.int64),
        eval_users=np.empty((0,), np.int64), user_consumed={},
    )
    trainer = DRTrainer(
        data, num_layers=3, num_nodes=100, num_paths_per_item=2,
        embed_size=args.embed, learning_rate=args.lr,
        train_batch_size=args.batch, num_sampled=8, seed=args.seed,
    )

    import jax.numpy as jnp

    def recall(n_eval=20_000, batch=4096, serve_m=128):
        fn = make_dr_serving_fn(
            trainer, beam=20, topk=10, max_items_per_path=serve_m
        )
        rec_sum = nd_sum = cnt = 0.0
        n_eval = min(n_eval, len(eval_seqs))
        es = eval_seqs[:n_eval] - 1
        for s in range(0, len(es), batch):
            e = min(s + batch, len(es))
            b = e - s
            sp = es[s:e]
            if b < batch:
                sp = np.concatenate([sp, np.repeat(sp[:1], batch - b, 0)])
            cons = np.full((batch, STREAM - EVAL_TAIL), -1, np.int32)
            for i in range(b):
                cons[i] = consumed[int(eval_users[s + i])] - 1
            items, _ = fn(
                trainer.layer_params, trainer.rerank_params,
                jnp.asarray(sp, jnp.int32), jnp.asarray(cons),
            )
            got = np.asarray(items)[:b]
            p, r, nd = compute_metrics_batch(got, eval_labels[s:e] - 1)
            rec_sum += float(r.sum()); nd_sum += float(nd.sum()); cnt += b
        return rec_sum / cnt, nd_sum / cnt

    def stage(name, epochs):
        t0 = time.perf_counter()
        trainer.train(num_epochs=epochs)
        wall = time.perf_counter() - t0
        losses = trainer.train_loss_log
        t1 = time.perf_counter()
        rec, nd = recall()
        print(json.dumps({
            "stage": name,
            "layer_loss_first": [round(x, 4) for x in losses[0]["layer_loss"]],
            "layer_loss_last": [round(x, 4) for x in losses[-1]["layer_loss"]],
            "rerank_loss_last": round(losses[-1]["rerank_loss"], 4),
            "recall@10": round(rec, 5), "ndcg@10": round(nd, 5),
            "train_wall_s": round(wall, 1),
            "eval_wall_s": round(time.perf_counter() - t1, 1),
        }), flush=True)
        return rec

    pop_rec, pop_nd = _popularity_recall(
        train_targets, eval_labels, consumed, eval_users
    )
    print(json.dumps({
        "stage": "popularity_baseline", "recall@10": round(pop_rec, 5),
        "ndcg@10": round(pop_nd, 5),
    }), flush=True)

    # the DR paper's EM protocol: several train -> M-step rounds.  A single
    # M-step off a 2-epoch model DEGRADES recall at 1M items (measured
    # 0.0325 -> 0.0121): random paths are unlearnable structure, so the
    # round-1 beam offers every item the same popular candidate paths and
    # assignments concentrate (path stats below track this).
    recalls = [stage("dr_em0_train_random_paths", args.epochs)]
    for rnd in range(1, args.em_rounds + 1):
        t0 = time.perf_counter()
        new_index = coordinate_descent(
            trainer, data.train_seqs, data.train_targets,
            num_candidate_path=20, batch_size=8192, mode=args.cd_mode,
            seed=args.seed,
        )
        trainer.path_index = new_index
        cd_wall = time.perf_counter() - t0
        print(json.dumps({
            "stage": f"dr_em{rnd}_coordinate_descent_{args.cd_mode}",
            "wall_s": round(cd_wall, 1),
            **_path_stats(new_index, trainer.num_nodes),
        }), flush=True)
        recalls.append(stage(f"dr_em{rnd}_retrain", args.epochs))

    # truncation check: the serving path drops items beyond
    # max_items_per_path=128 per path; re-eval with a 4x cap (smaller
    # batches: candidate rows scale with beam * m)
    rec_wide, nd_wide = recall(batch=512, serve_m=512)
    print(json.dumps({
        "stage": "dr_eval_wide_paths", "recall@10": round(rec_wide, 5),
        "ndcg@10": round(nd_wide, 5), "serve_m": 512,
    }), flush=True)
    print(json.dumps({
        "stage": "dr_summary",
        "recalls_per_round": [round(r, 5) for r in recalls],
        "recall_wide": round(rec_wide, 5),
        "improved": bool(max(recalls[1:], default=0.0) > recalls[0]),
    }), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("algo", choices=["tdm", "dr", "otm"])
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--users", type=int, default=150_000)
    ap.add_argument("--genres", type=int, default=2000)
    ap.add_argument("--embed", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--batch", type=int, default=65_536)
    ap.add_argument("--iters", type=int, default=16_000)  # tdm: ~2 epochs of
    # the default 2.4M-window train set at ~310 targets/step (the first cut
    # used 8192-row batches = 38 targets/step, so 20k iters saw <1/3 of an
    # epoch — the re-clustered tree was built from undertrained embeddings
    # and LOST to the random tree, 0.052 -> 0.020 recall@10)
    ap.add_argument("--epochs", type=int, default=2)  # dr
    ap.add_argument("--em-rounds", type=int, default=3)  # dr
    ap.add_argument("--cd-mode", default="streaming")
    ap.add_argument("--init", default="random", choices=["random", "category"])
    ap.add_argument("--jtm-rows", type=int, default=2_000_000)
    ap.add_argument("--cluster-features", default="embedding",
                    choices=["embedding", "cooc"])
    ap.add_argument("--skip-jtm", action="store_true")
    ap.add_argument("--skip-cluster", action="store_true")  # 10M shortened
    # protocol: one alternation stage (JTM) off the stage-1 model
    ap.add_argument("--resident", default="auto",
                    choices=["auto", "on", "off"])  # device-resident chunked
    # train driver (train_resident); auto = on for >=2M-item catalogs
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--ckpt-dir", default=None)  # step-level resume snapshots
    ap.add_argument("--ckpt-every", type=int, default=0)
    ap.add_argument("--otm-rows", type=int, default=1_200_000)
    ap.add_argument("--otm-epochs", type=int, default=2)
    ap.add_argument("--otm-total-batch", type=int, default=10240)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    if args.algo == "tdm":
        run_tdm(args)
    elif args.algo == "otm":
        run_otm(args)
    else:
        run_dr(args)


if __name__ == "__main__":
    main()
