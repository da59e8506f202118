"""Roofline / MFU accounting for the four 10M-item headline bench rows
(VERDICT r3 #6): measured xplane device time vs the ANALYTIC lower bounds
the hardware imposes, so "fast" is judged against the chip, not history.

Per workload this prints:
  measured_ms      — xplane device time (same methodology as bench.py)
  hbm_bytes        — unavoidable HBM traffic: table rows that must be read/
                     written (gathers, optimizer updates) + the dominant
                     activations; excludes whatever XLA fuses away
  hbm_floor_ms     — hbm_bytes / 819 GB/s (v5e HBM peak)
  flops            — matmul FLOPs of the scorer forwards/backwards
  mxu_floor_ms     — flops / 197e12 (v5e bf16 MXU peak; f32 ops still run
                     on the MXU with bf16-rounded operands)
  gather_floor_ms  — rows_gathered * measured per-row gather cost
                     (scripts/bench_gather_width.py: ~9.3 ns/row for
                     128-lane rows; ~100 GB/s for wide contiguous blocks)
  pct_of_roofline  — max(hbm, mxu, gather) floor / measured: how much of
                     the measured time is required by the binding resource
  top ops          — largest xplane ops, to sanity-check the model

Usage: python scripts/roofline.py [--skip tdm_train,...]
"""

import argparse
import gc
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HBM_GBPS = 819.0  # v5e HBM peak
MXU_TFLOPS = 197.0  # v5e bf16 peak
GATHER_NS_128LANE = 9.3  # measured ns/row, random 128-lane row gathers
BLOCK_GBPS = 100.0  # measured wide contiguous block-gather bandwidth


def din_fwd_flops(b, u, l, e):
    """Grouped DIN forward matmul FLOPs (models/din.py): attention QK +
    AV einsums, att linear, 2-layer MLP."""
    return (
        2 * b * u * l * e * 2      # bue,ble->bul and bul,ble->bue
        + 2 * b * u * e * e        # att linear ExE
        + 2 * b * u * (2 * e) * e  # mlp1 2ExE
        + 2 * b * u * e * 1        # mlp2
    )


def report(name, measured_ms, hbm_bytes, flops, gather_rows,
           gather_row_bytes, durs, iters, extra=None):
    hbm_floor = hbm_bytes / (HBM_GBPS * 1e9) * 1e3
    mxu_floor = flops / (MXU_TFLOPS * 1e12) * 1e3
    gather_floor = gather_rows * GATHER_NS_128LANE / 1e6
    floors = {"hbm": hbm_floor, "mxu": mxu_floor, "gather_issue": gather_floor}
    binding = max(floors, key=floors.get)
    out = {
        "workload": name, "measured_ms": round(measured_ms, 2),
        "hbm_bytes_per_step": int(hbm_bytes),
        "hbm_floor_ms": round(hbm_floor, 3),
        "flops_per_step": int(flops),
        "mxu_floor_ms": round(mxu_floor, 3),
        "gather_rows": int(gather_rows),
        "gather_issue_floor_ms": round(gather_floor, 3),
        "binding_resource": binding,
        "pct_of_roofline": round(100 * floors[binding] / measured_ms, 1),
        "achieved_gbps": round(hbm_bytes / (measured_ms / 1e3) / 1e9, 1),
    }
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)
    top = sorted(durs.items(), key=lambda kv: -kv[1])[:6]
    for op, ms in top:
        if "copy-start" in op or "copy-done" in op:
            continue
        print(f"    {ms / iters:8.3f} ms  {op[:90]}", flush=True)


def tdm_train_10m():
    import jax
    import jax.numpy as jnp

    from bench import _deep_tree, _deep_trainer
    from devtime import profile_ops

    rng = np.random.default_rng(0)
    n = 10_000_000
    tree = _deep_tree(n)
    trainer = _deep_trainer(tree)
    b = trainer.num_targets_per_batch
    unit, l, e = trainer.sampler.unit, 10, 16
    sc = jnp.asarray(tree.ids_to_codes(rng.integers(1, n + 1, size=(b, l))))
    tc = jnp.asarray(tree.ids_to_codes(rng.integers(1, n + 1, size=b)))
    key = jax.random.PRNGKey(1)

    def thunk():
        trainer.params, trainer.opt_state, loss = trainer._train_step(
            trainer.params, trainer.opt_state, key, tc, sc
        )
        return loss

    iters = 10
    durs = profile_ops(thunk, iters)
    measured = sum(v for k, v in durs.items() if "jit_" in k) / iters
    touched = b * (unit + l)
    # pmv rows: 512B gather + 512B Pallas write per touched row; dedup
    # apparatus sorts [touched] rows (~3x 64B passes, minor)
    hbm = touched * (512 + 512) + touched * e * 4 * 6  # + grad rows r/w
    flops = 3 * din_fwd_flops(b, unit, l, e)  # fwd + ~2x bwd
    report(
        f"tdm_train_10m (b={b}, unit={unit})", measured, hbm, flops,
        touched * 2, 512, durs, iters,
    )
    del trainer, tree
    gc.collect()


def tdm_serve_10m():
    import jax.numpy as jnp

    from bench import _deep_tree, _deep_trainer
    from devtime import profile_ops
    from dismember_tpu.retrieval.packed_beam import (
        make_hybrid_beam_fn,
        make_packed_tree,
    )
    from dismember_tpu.train.tdm import packed_fns

    rng = np.random.default_rng(0)
    n, bq, beam, l, e = 10_000_000, 4096, 20, 10, 16
    tree = _deep_tree(n)
    trainer = _deep_trainer(tree)
    trainer.opt_state = None
    packed = make_packed_tree(
        tree, trainer.params["embedding"], beam=beam, dtype=jnp.bfloat16
    )
    pre, app = packed_fns("din")
    fn = make_hybrid_beam_fn(packed, pre, app)
    x = jnp.asarray(tree.ids_to_codes(rng.integers(1, n + 1, size=(bq, l))))
    iters = 10
    durs = profile_ops(lambda: fn(trainer.params, x), iters)
    measured = sum(v for k, v in durs.items() if "jit_" in k) / iters
    levels = tree.max_level - packed.cfg.start_level  # scored pair levels
    n_contract = 3  # shallow contraction levels (max_contract_rows 8192)
    gather_levels = levels - n_contract
    rows = bq * beam * gather_levels
    row_bytes = packed.pair_table.shape[1] * 2  # bf16 lanes
    hbm = rows * row_bytes + bq * l * e * 4  # pair rows + one seq gather
    # scorer: both children of each beam row at every level
    flops = gather_levels * din_fwd_flops(bq, 2 * beam, l, e)
    report(
        f"tdm_serve_10m (batch={bq}, {gather_levels} gather levels)",
        measured, hbm, flops, rows, row_bytes, durs, iters,
    )
    del trainer, tree, packed, fn
    gc.collect()


def dr_estep_10m():
    import jax
    import jax.numpy as jnp

    from devtime import profile_ops
    from dismember_tpu.data.dr_dataset import DRData
    from dismember_tpu.train.dr import DRTrainer

    rng = np.random.default_rng(0)
    n, batch, l, e = 10_000_000, 4096, 10, 16
    data = DRData(
        item_to_id={}, id_to_item={}, num_items=n,
        train_seqs=rng.integers(0, n, size=(batch, l)).astype(np.int64),
        train_targets=rng.integers(0, n, size=batch).astype(np.int64),
        eval_seqs=np.empty((0, l), np.int64),
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

    def thunk():
        # fused single-dispatch E-step (r5) when available — the form
        # train() actually runs in pmv mode
        if getattr(trainer, "_estep_pmv", None):
            _losses, r = trainer._estep_fused(key, seqs, paths, labels)
            return r
        trainer.layer_params, trainer.layer_opt_state, _ = (
            trainer._layer_step(
                trainer.layer_params, trainer.layer_opt_state, seqs, paths
            )
        )
        trainer.rerank_params, trainer.rerank_opt_state, r = (
            trainer._rerank_step(
                trainer.rerank_params, trainer.rerank_opt_state, key, seqs,
                labels,
            )
        )
        return r

    iters = 10
    durs = profile_ops(thunk, iters)
    measured = sum(v for k, v in durs.items() if "jit_" in k) / iters
    # layer: seq-code item rows touched (batch*2 expanded x l); rerank:
    # seq rows + candidate (1 + num_sampled) wb rows; all pmv 512B r+w
    touched = batch * 2 * l + batch * l + batch * (1 + 8)
    hbm = touched * (512 + 512)
    # layer heads: D x [B2, in->K] matmuls on concat(seq_mean, prev emb)
    b2 = batch * 2
    flops = 3 * (
        3 * 2 * b2 * (e * 4) * 100  # 3 heads, input ~4E wide, K=100
        + 2 * b2 * l * e            # seq mean
    ) + 3 * (2 * batch * (l * e) * e + 2 * batch * 9 * e)  # rerank linear+dots
    report(
        f"dr_estep_10m (batch={batch}x2 expanded)", measured, hbm, flops,
        touched * 2, 512, durs, iters,
    )
    trainer._sync_mirrors()
    trainer.layer_opt_state = None
    trainer.rerank_opt_state = None
    return trainer, data


def dr_serve_10m(trainer, data):
    import jax.numpy as jnp

    from devtime import profile_ops
    from dismember_tpu.retrieval.dr_serve import make_dr_serving_fn

    batch, l, e = 4096, 10, 16
    fn = make_dr_serving_fn(trainer, beam=20, topk=10)
    q = jnp.asarray(data.train_seqs[:batch], jnp.int32)
    iters = 10
    durs = profile_ops(
        lambda: fn(trainer.layer_params, trainer.rerank_params, q), iters
    )
    measured = sum(v for k, v in durs.items() if "jit_" in k) / iters
    # path beam: 3 layers x [B, beam, K] head matmuls; block rerank: one
    # [m_pad(128) x 32-lane] block per beam path + seq gather
    beam, m_pad, lane_b = 20, 128, 64  # 32 lanes bf16 = 64B
    hbm = (
        batch * beam * m_pad * lane_b  # block gathers
        + batch * l * e * 4            # seq embedding gather
    )
    flops = (
        3 * 2 * batch * beam * (e * 4) * 100      # path-beam heads
        + 2 * batch * (l * e) * e                 # rerank linear
        + 2 * batch * beam * m_pad * e            # rerank dots
    )
    report(
        f"dr_serve_10m (batch={batch}, block rerank)", measured, hbm,
        flops, batch * beam, m_pad * lane_b, durs, iters,
        extra={"gather_note": "block gathers move at ~100 GB/s measured"},
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()
    if "tdm_train" not in skip:
        tdm_train_10m()
    if "tdm_serve" not in skip:
        tdm_serve_10m()
    if "dr" not in skip:
        tr, data = dr_estep_10m()
        dr_serve_10m(tr, data)


if __name__ == "__main__":
    main()
