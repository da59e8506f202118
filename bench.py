#!/usr/bin/env python
"""Headline benchmark: TDM batched beam-search serving QPS per chip.

Runs the full serving hot path (level-synchronous batched beam search with the
DIN scorer, beam=20, topk=10 — the reference's eval configuration,
configs/tdm.conf:34-35) over the bundled movielens sample and prints ONE JSON
line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is measured
QPS relative to the reference's single-query Scala/MKL serving path estimated
on this machine's CPU (sequential beam search ~1 query at a time): we use the
reference's own latency microbenchmark protocol (100 queries, avg) run with
our CPU backend as a stand-in, so the ratio tracks batched-TPU vs
sequential-CPU serving.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))

import numpy as np

# Device time comes from xplane traces (scripts/devtime.py): host wall-clock
# through the device tunnel is unreliable even for dependent chains with a
# final block_until_ready (measured 95x under-report — CLAUDE.md).
from devtime import device_time_ms

# Round-1 measured values (BASELINE.md) — the depth-regime numbers future
# rounds must beat; vs_baseline for each deep row is measured/this at the
# SAME catalog scale (a 1M-item rows/s over a 10M-item baseline would be
# inflated by the O(table) dense-Adam cost difference, not real progress).
R01_DEEP_QPS_1M = 50_000.0
R01_TRAIN_ROWS_10M = 108_000.0
# Round-2 measured 10M-item SERVING numbers (BASELINE.md) — previously only
# prose; captured here so regressions in the deepest regime fail the driver.
R02_TDM_SERVE_QPS_10M = 264_000.0
R02_DR_SERVE_QPS_10M = 288_000.0


def _deep_tree(n_items: int):
    import tempfile

    from dismember_tpu.index.arraytree import ArrayTree
    from dismember_tpu.index.tree_io import category_sorted_codes, write_tree

    ids = np.arange(1, n_items + 1)
    sorted_ids, codes = category_sorted_codes(ids, ids % 97)
    with tempfile.TemporaryDirectory() as td:
        tree_path = os.path.join(td, "deep_tree.bin")
        write_tree(tree_path, sorted_ids, codes)
        return ArrayTree.from_file(tree_path)


def _deep_trainer(tree):
    from dismember_tpu.train.tdm import TDMTrainer

    neg_counts = ",".join(
        str(min(i, 2**i - 1)) for i in range(tree.max_level + 1)
    )
    return TDMTrainer(
        tree=tree, model_type="din", embed_size=16,
        layer_neg_counts=neg_counts, topk=10, beam_size=20, seed=0,
    )


def deep_catalog_bench() -> None:
    """Depth-regime rows: 10M-item train rows/s + 1M-item serving QPS.

    Captures the deep-catalog regime (24 sequential level dispatches,
    O(table) optimizer traffic — BASELINE.md) in the driver-recorded bench so
    round-over-round regressions at depth are visible, not just the 3.3k-item
    headline.  Each row's vs_baseline divides by the round-1 measurement at
    the same catalog size."""
    import jax
    import jax.numpy as jnp

    from dismember_tpu.models import din
    from dismember_tpu.retrieval.packed_beam import (
        make_hybrid_beam_fn,
        make_packed_tree,
    )

    rng = np.random.default_rng(0)

    # --- train rows/s at 10M items (expanded rows = targets * unit) -------
    # 10M matches R01_TRAIN_ROWS_10M's scale; this is the regime where the
    # lazy row-sparse Adam path (train/sparse_adam.py) carries the win.
    n_train = 10_000_000
    tree = _deep_tree(n_train)
    trainer = _deep_trainer(tree)
    b = trainer.num_targets_per_batch
    sc = jnp.asarray(
        tree.ids_to_codes(rng.integers(1, n_train + 1, size=(b, 10)))
    )
    tc = jnp.asarray(tree.ids_to_codes(rng.integers(1, n_train + 1, size=b)))
    key = jax.random.PRNGKey(1)

    def train_thunk():
        trainer.params, trainer.opt_state, loss = trainer._train_step(
            trainer.params, trainer.opt_state, key, tc, sc
        )
        return loss

    step_ms = device_time_ms(train_thunk, iters=10)
    rows_per_s = b * trainer.sampler.unit / (step_ms / 1e3)
    print(
        json.dumps(
            {
                "metric": "tdm_deep_catalog_train_rows_per_s_10m_items",
                "value": round(rows_per_s, 1),
                "unit": "expanded rows/s (10M items, full train step; xplane device time)",
                "vs_baseline": round(rows_per_s / R01_TRAIN_ROWS_10M, 3),
            }
        ),
        flush=True,
    )

    # --- serving QPS at 10M items (hybrid beam over the bf16 pair table) --
    # The deepest serving regime (4GB pair table, chunked build); previously
    # only a BASELINE.md prose row.  Free the optimizer state first — the
    # serve path needs only the embedding table.
    trainer.opt_state = None
    packed10 = make_packed_tree(
        tree, trainer.params["embedding"], beam=20, dtype=jnp.bfloat16
    )
    beam_fn10 = make_hybrid_beam_fn(
        packed10, din.precompute_seq, din.apply_from_emb
    )
    x10 = jnp.asarray(
        tree.ids_to_codes(rng.integers(1, n_train + 1, size=(4096, 10)))
    )
    ms10 = device_time_ms(lambda: beam_fn10(trainer.params, x10), iters=10)
    qps10 = 4096 / (ms10 / 1e3) if ms10 > 0 else 0.0
    print(
        json.dumps(
            {
                "metric": "tdm_deep_catalog_beam_qps_10m_items",
                "value": round(qps10, 1),
                "unit": "queries/s (beam=20, 10M items, 24 levels, bf16 pair table; xplane device time)",
                "vs_baseline": round(qps10 / R02_TDM_SERVE_QPS_10M, 3),
            }
        ),
        flush=True,
    )
    del trainer, tree, sc, tc, packed10, beam_fn10, x10  # release 10M buffers

    # --- serving QPS at 1M items (hybrid packed loop — serving default) ---
    n_serve = 1_000_000
    tree = _deep_tree(n_serve)
    trainer = _deep_trainer(tree)
    packed = make_packed_tree(tree, trainer.params["embedding"], beam=20)
    beam_fn = make_hybrid_beam_fn(
        packed, din.precompute_seq, din.apply_from_emb
    )
    seq_codes = tree.ids_to_codes(
        rng.integers(1, n_serve + 1, size=(4096, 10))
    )
    x = jnp.asarray(seq_codes)
    beam_ms = device_time_ms(lambda: beam_fn(trainer.params, x), iters=10)
    qps = len(seq_codes) / (beam_ms / 1e3)
    print(
        json.dumps(
            {
                "metric": "tdm_deep_catalog_beam_qps_1m_items",
                "value": round(qps, 1),
                "unit": "queries/s (beam=20, 1M items, 20 levels; xplane device time)",
                "vs_baseline": round(qps / R01_DEEP_QPS_1M, 3),
            }
        ),
        flush=True,
    )


def otm_deep_catalog_bench() -> None:
    """OTM whole-batch train at 10M items (pmv scan — round 4's 2.0x over
    the mv format, 17x over dense Adam; BASELINE.md)."""
    import gc

    import jax.numpy as jnp

    from devtime import device_time_ms
    from dismember_tpu.data.otm_dataset import OTMData, upper_log2
    from dismember_tpu.train.otm import OTMTrainer

    rng = np.random.default_rng(0)
    n, n_rows, l = 10_000_000, 1024, 10
    leaf_level = upper_log2(n)
    lo = (1 << leaf_level) - 1
    seqs = rng.integers(lo, lo + n, size=(n_rows, l))
    labels = rng.integers(lo, lo + n, size=(n_rows, 5))
    data = OTMData(
        item_to_code={}, code_to_item={}, leaf_level=leaf_level,
        num_items=n, all_nodes=np.empty(0, bool),
        train_seqs=seqs.astype(np.int64),
        train_labels=labels.astype(np.int64),
        train_users=np.zeros(n_rows, np.int64),
        eval_seqs=np.empty((0, l), np.int64),
        eval_labels=np.empty((0, 5), np.int64),
        eval_users=np.empty(0, np.int64),
        user_consumed={}, label_num=5,
    )
    trainer = OTMTrainer(
        data, embed_size=16, total_train_batch_size=256 * 40, beam_size=20,
        target_mode="pseudo", seed=0, sparse_embed_update=True,
    )
    sj = jnp.asarray(seqs[: trainer.train_batch_size], jnp.int32)
    tj = jnp.asarray(labels[: trainer.train_batch_size], jnp.int32)

    def thunk():
        trainer.params, trainer.opt_state, losses = trainer._train_batch(
            trainer.params, trainer.opt_state, sj, tj
        )
        return losses

    ms = device_time_ms(thunk, iters=10)
    rows_per_s = trainer.train_batch_size * 40 / (ms / 1e3) if ms > 0 else 0.0
    print(
        json.dumps(
            {
                "metric": "otm_deep_catalog_train_rows_per_s_10m_items",
                "value": round(rows_per_s, 1),
                "unit": (
                    "expanded rows/s (10M items, 20-level whole-batch scan, "
                    "pmv sparse Adam; xplane device time)"
                ),
                # round-2 measured sparse scan (117 ms/batch = 87.5k rows/s)
                "vs_baseline": round(rows_per_s / 87_500.0, 3),
            }
        ),
        flush=True,
    )
    del trainer, data
    gc.collect()


def dr_deep_catalog_bench() -> None:
    """1M-item Deep Retrieval device serving QPS (path-major block rerank)
    and 10M-item E-step training rows/s (p|m|v packed sparse Adam)."""
    import jax
    import jax.numpy as jnp

    from dismember_tpu.data.dr_dataset import DRData
    from dismember_tpu.retrieval.dr_serve import make_dr_serving_fn
    from dismember_tpu.train.dr import DRTrainer

    n, batch = 1_000_000, 4096
    rng = np.random.default_rng(0)
    data = DRData(
        item_to_id={}, id_to_item={}, num_items=n,
        train_seqs=rng.integers(0, n, size=(batch, 10)).astype(np.int64),
        train_targets=rng.integers(0, n, size=batch).astype(np.int64),
        eval_seqs=np.empty((0, 10), np.int64),
        eval_labels=np.empty((0, 1), np.int64),
        eval_users=np.empty((0,), np.int64), user_consumed={},
    )
    trainer = DRTrainer(
        data, num_layers=3, num_nodes=100, num_paths_per_item=2,
        embed_size=16, train_batch_size=batch * 2, num_sampled=8, seed=0,
    )
    fn = make_dr_serving_fn(trainer, beam=20, topk=10)
    q = jnp.asarray(data.train_seqs[:batch], jnp.int32)
    ms = device_time_ms(
        lambda: fn(trainer.layer_params, trainer.rerank_params, q), iters=10
    )
    qps = batch / (ms / 1e3) if ms > 0 else 0.0
    print(
        json.dumps(
            {
                "metric": "dr_deep_catalog_serving_qps_1m_items",
                "value": round(qps, 1),
                "unit": "queries/s (D=3, K=100, J=2, beam=20, 1M items; xplane device time)",
                "vs_baseline": round(qps / 57_700.0, 3),  # round-1 measured
            }
        ),
        flush=True,
    )
    del trainer, fn, q, data

    # --- E-step train rows/s at 10M items (layer + rerank step) -----------
    # The regime where the p|m|v packed sparse-Adam state carries the win
    # (train/sparse_adam.pmv_*; round-1 could not train DR at this scale at
    # all — the baseline is round 2's measured dense number).
    n = 10_000_000
    data = DRData(
        item_to_id={}, id_to_item={}, num_items=n,
        train_seqs=rng.integers(0, n, size=(batch, 10)).astype(np.int64),
        train_targets=rng.integers(0, n, size=batch).astype(np.int64),
        eval_seqs=np.empty((0, 10), np.int64),
        eval_labels=np.empty((0, 1), np.int64),
        eval_users=np.empty((0,), np.int64), user_consumed={},
    )
    trainer = DRTrainer(
        data, num_layers=3, num_nodes=100, num_paths_per_item=2,
        embed_size=16, train_batch_size=batch * 2, num_sampled=8, seed=0,
    )
    seqs = jnp.asarray(data.train_seqs, jnp.int32)
    paths = jnp.asarray(
        trainer.path_index.item_paths[data.train_targets], jnp.int32
    )
    labels = jnp.asarray(data.train_targets, jnp.int32)
    key = jax.random.PRNGKey(1)

    def estep_thunk():
        # fused single-dispatch E-step (r5) — the path train() runs in pmv
        # mode; falls back to the two-dispatch form otherwise
        if getattr(trainer, "_estep_pmv", None):
            _losses, rloss = trainer._estep_fused(key, seqs, paths, labels)
            return rloss
        trainer.layer_params, trainer.layer_opt_state, losses = (
            trainer._layer_step(
                trainer.layer_params, trainer.layer_opt_state, seqs, paths
            )
        )
        trainer.rerank_params, trainer.rerank_opt_state, rloss = (
            trainer._rerank_step(
                trainer.rerank_params, trainer.rerank_opt_state, key, seqs,
                labels,
            )
        )
        return rloss

    step_ms = device_time_ms(estep_thunk, iters=10)
    rows = batch * 2  # sample x path expanded rows per step
    rows_per_s = rows / (step_ms / 1e3) if step_ms > 0 else 0.0
    print(
        json.dumps(
            {
                "metric": "dr_deep_catalog_train_rows_per_s_10m_items",
                "value": round(rows_per_s, 1),
                "unit": "expanded rows/s (10M items, layer+rerank E-step; xplane device time)",
                "vs_baseline": round(rows_per_s / 181_000.0, 3),  # round-2 dense
            }
        ),
        flush=True,
    )

    # --- serving QPS at 10M items (path-major block rerank table) ---------
    # The hardest-won serving number of round 2, previously BASELINE.md
    # prose only.  Mirrors must be synced for the serve tables; the packed
    # p|m|v optimizer state is dropped first (~7.7GB) — serving reads the
    # [V, E] mirrors.
    trainer._sync_mirrors()
    trainer.layer_opt_state = None
    trainer.rerank_opt_state = None
    fn10 = make_dr_serving_fn(trainer, beam=20, topk=10)
    q10 = jnp.asarray(data.train_seqs[:batch], jnp.int32)
    ms10 = device_time_ms(
        lambda: fn10(trainer.layer_params, trainer.rerank_params, q10),
        iters=10,
    )
    qps10 = batch / (ms10 / 1e3) if ms10 > 0 else 0.0
    print(
        json.dumps(
            {
                "metric": "dr_deep_catalog_serving_qps_10m_items",
                "value": round(qps10, 1),
                "unit": "queries/s (D=3, K=100, J=2, beam=20, 10M items, block rerank; xplane device time)",
                "vs_baseline": round(qps10 / R02_DR_SERVE_QPS_10M, 3),
            }
        ),
        flush=True,
    )


def index_learning_bench() -> None:
    """Driver-visible index-learning row (VERDICT r4 weak #6): streaming
    coordinate descent (collect + native greedy) at a 100k-item catalog,
    400k training rows — the DR M-step end to end (beam search dispatch
    pipeline, path aggregation, C++ greedy J-path selection).  Wall-clock is
    the right metric here: the M-step is a whole multi-minute host+device
    pipeline, not a single dispatch (CLAUDE.md measurement rules).  Match:
    deep-retrieval/.../optim/CoordinateDescent.scala."""
    import time as _time

    import jax.numpy as jnp  # noqa: F401  (device init before timing)

    from dismember_tpu.data.dr_dataset import DRData
    from dismember_tpu.train.dr import DRTrainer
    from dismember_tpu.train.dr_coordinate import coordinate_descent

    n, rows = 100_000, 400_000
    rng = np.random.default_rng(0)
    data = DRData(
        item_to_id={}, id_to_item={}, num_items=n,
        train_seqs=rng.integers(0, n, size=(rows, 10)).astype(np.int64),
        train_targets=rng.integers(0, n, size=rows).astype(np.int64),
        eval_seqs=np.empty((0, 10), np.int64),
        eval_labels=np.empty((0, 1), np.int64),
        eval_users=np.empty((0,), np.int64), user_consumed={},
    )
    trainer = DRTrainer(
        data, num_layers=3, num_nodes=100, num_paths_per_item=2,
        embed_size=16, train_batch_size=8192, num_sampled=8, seed=0,
    )
    t0 = _time.perf_counter()
    coordinate_descent(
        trainer, data.train_seqs, data.train_targets,
        num_candidate_path=20, batch_size=8192, mode="streaming", seed=0,
    )
    wall = _time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "dr_coordinate_descent_streaming_wall_s_100k_items",
                "value": round(wall, 1),
                "unit": "seconds (100k items, 400k rows, beam collect + native greedy; wall incl. compile)",
                # round-5 first measurement is the baseline for later rounds
                "vs_baseline": round(R05_CD_STREAM_WALL_100K / max(wall, 1e-9), 3),
            }
        ),
        flush=True,
    )


# round-5 measured wall for the index-learning row (see BASELINE.md); later
# rounds' vs_baseline = baseline_wall / measured_wall (>1 = faster).
R05_CD_STREAM_WALL_100K = 92.3


def _preflight(timeout_s: float = 180.0) -> None:
    """Fail fast with a JSON error line if the device tunnel is dead.

    A dead tunnel (observed r3: /root/.tpu_init.py gone, relay port
    closed) blocks every device call forever at 0 CPU — without this the
    driver's bench run would hang instead of recording an error."""
    import threading

    ok = threading.Event()

    def probe() -> None:
        import jax
        import jax.numpy as jnp

        jax.jit(lambda v: (v * 2).sum())(jnp.arange(8.0)).block_until_ready()
        ok.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not ok.is_set():
        print(json.dumps({
            "metric": "tdm_beam_serving_qps", "value": 0, "unit": "error",
            "vs_baseline": 0,
            "error": f"device preflight timed out after {timeout_s:.0f}s "
                     "(TPU tunnel down?)",
        }))
        os._exit(2)


def main() -> None:
    import jax

    _preflight()

    from dismember_tpu.data.ingest import (
        read_csv,
        unique_items_with_category,
        user_interactions,
    )
    from dismember_tpu.data.tdm_dataset import generate_split_samples
    from dismember_tpu.index.arraytree import ArrayTree
    from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
    from dismember_tpu.train.tdm import TDMTrainer

    root = os.path.dirname(os.path.abspath(__file__))
    csv = os.path.join(root, "data", "example_data.csv")
    raw = read_csv(csv)
    inter = user_interactions(raw)
    samples = generate_split_samples(inter, 10, 2, 0.8)
    ids, cats = unique_items_with_category(raw)
    sorted_ids, codes = category_sorted_codes(ids, cats)
    tree_path = os.path.join(root, "data", "_bench_tree.bin")
    write_tree(tree_path, sorted_ids, codes, stat=samples.stat)
    tree = ArrayTree.from_file(tree_path)

    neg_counts = ",".join(
        str(min(i, 2**i - 1)) for i in range(tree.max_level + 1)
    )
    trainer = TDMTrainer(
        tree=tree,
        model_type="din",
        embed_size=16,
        layer_neg_counts=neg_counts,
        topk=10,
        beam_size=20,
        seed=0,
    )
    # brief warm-up training so the scorer is non-degenerate
    trainer.train(
        samples.train_seqs,
        samples.train_targets,
        iterations=20,
        progress_interval=100,
    )

    # serving benchmark: batched beam search, beam=20
    eval_seqs = samples.eval_seqs
    reps = max(1, 4096 // max(len(eval_seqs), 1) + 1)
    seqs = np.concatenate([eval_seqs] * reps, axis=0)[:4096]
    seq_codes = tree.ids_to_codes(seqs)
    import jax.numpy as jnp

    from dismember_tpu.models import din
    from dismember_tpu.retrieval.tree_beam import make_beam_fn

    beam_fn = make_beam_fn(
        trainer.forward, tree, beam=20,
        precompute=din.precompute_seq, apply=din.apply_with_ctx,
    )
    x = jnp.asarray(seq_codes)
    batch_ms = device_time_ms(lambda: beam_fn(trainer.params, x), iters=20)
    qps = len(seqs) / (batch_ms / 1e3)

    # baseline stand-in: single-query sequential latency on this machine
    # (the reference protocol: avg of 100 single queries)
    one = jnp.asarray(seq_codes[:1])
    beam_fn1 = make_beam_fn(
        trainer.forward, tree, beam=20,
        precompute=din.precompute_seq, apply=din.apply_with_ctx,
    )
    one_ms = device_time_ms(lambda: beam_fn1(trainer.params, one), iters=100)
    seq_qps = 1e3 / one_ms if one_ms > 0 else 1e-9

    vs_baseline = qps / max(seq_qps, 1e-9)
    print(
        json.dumps(
            {
                "metric": "tdm_beam_search_qps_per_chip",
                "value": round(qps, 1),
                "unit": "queries/s (beam=20, topk=10, DIN, movielens-100k sample; xplane device time)",
                "vs_baseline": round(vs_baseline, 2),
            }
        )
    )
    try:
        os.remove(tree_path)
    except OSError:
        pass


if __name__ == "__main__":
    # deep-catalog rows first; the headline metric stays the LAST JSON line
    # (the driver's parsed record) for round-over-round comparability.
    # Each section is fenced: the remote-compile relay occasionally drops a
    # response ("response body closed before all bytes were read"), and one
    # transient failure must not cost the driver the remaining rows.
    if os.environ.get("DISMEMBER_BENCH_DEEP", "1") != "0":
        for section in (
            deep_catalog_bench, otm_deep_catalog_bench,
            dr_deep_catalog_bench, index_learning_bench,
        ):
            try:
                section()
            except Exception as exc:  # noqa: BLE001
                print(
                    json.dumps(
                        {
                            "metric": f"{section.__name__}_error",
                            "value": 0,
                            "unit": f"{type(exc).__name__}: {exc}"[:200],
                            "vs_baseline": 0,
                        }
                    ),
                    flush=True,
                )
    main()
