"""mv vs pmv TDM sparse step at deep catalogs (VERDICT r2 #9 evidence).

The TDM/OTM sparse steps use the mv packed-moments format: per step ONE
XLA scatter-add into the [V, E] param table (~100ns/touched row) plus one
Pallas mv row write.  The pmv format (DR's) removes that scatter by packing
the params into the same 128-lane rows — at the cost of mirror plumbing
(beam serving / export / checkpoint consumers need a [V, E] mirror synced at
eval boundaries).

This script measures, on the real chip at a 10M-item tree (33.5M-row node
table), the xplane device time of:
  (a) the trainer's current mv sparse step;
  (b) a pmv prototype step (identical forward/grads; pmv_gather +
      pmv_apply_rows; zero XLA table scatters);
  (c) the one-off cost of a chunked mirror unpack (what each eval boundary
      would pay under pmv).

Usage: python scripts/profile_pmv_tdm.py [--items 10000000]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=10_000_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from devtime import device_time_ms
    from dismember_tpu.constants import PADDING_IDX
    from dismember_tpu.index.arraytree import ArrayTree
    from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
    from dismember_tpu.models import din
    from dismember_tpu.models.losses import bce_with_logits
    from dismember_tpu.train import sparse_adam
    from dismember_tpu.train.tdm import TDMTrainer

    import tempfile

    rng = np.random.default_rng(0)
    n = args.items
    ids = np.arange(1, n + 1)
    sorted_ids, codes = category_sorted_codes(ids, ids % 97)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t.bin")
        write_tree(p, sorted_ids, codes)
        tree = ArrayTree.from_file(p)

    neg_counts = ",".join(
        str(min(i, 2**i - 1)) for i in range(tree.max_level + 1)
    )
    trainer = TDMTrainer(
        tree=tree, model_type="din", embed_size=16,
        layer_neg_counts=neg_counts, topk=10, beam_size=20, seed=0,
    )
    assert trainer._sparse
    b = trainer.num_targets_per_batch
    sc = jnp.asarray(tree.ids_to_codes(rng.integers(1, n + 1, size=(b, 10))))
    tc = jnp.asarray(tree.ids_to_codes(rng.integers(1, n + 1, size=b)))
    key = jax.random.PRNGKey(1)

    def mv_thunk():
        trainer.params, trainer.opt_state, loss = trainer._train_step(
            trainer.params, trainer.opt_state, key, tc, sc
        )
        return loss

    mv_ms = device_time_ms(mv_thunk, iters=10)
    unit = trainer.sampler.unit
    print(
        f"mv step: {mv_ms:.2f} ms ({b * unit / (mv_ms / 1e3):,.0f} rows/s)",
        flush=True,
    )

    # ---- pmv prototype ----------------------------------------------------
    e = 16
    table = trainer.params["embedding"]
    rest = {k: v for k, v in trainer.params.items() if k != "embedding"}
    # free the mv state; keep the mirror for pmv_init
    trainer.opt_state = None
    pmv_state = sparse_adam.pmv_init(table)
    rest_opt = trainer.optimizer.init(rest)
    sampler = trainer.sampler
    sampler_state = sampler.device_state()
    lr = trainer.learning_rate
    optimizer = trainer.optimizer

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def pmv_step(rest_p, opt, key, target_codes, seq_codes, sstate):
        rest_o, emb_pmv = opt
        codes, labels, weights = sampler.sample(key, target_codes, sstate)
        bb, u = codes.shape
        l = seq_codes.shape[1]
        flat = jnp.concatenate([codes.reshape(-1), seq_codes.reshape(-1)])
        valid = flat != PADDING_IDX
        rows = sparse_adam.pmv_gather(
            emb_pmv["pmv"], jnp.where(valid, flat, 0), e
        )
        rows = rows * valid[:, None].astype(rows.dtype)
        pad = (seq_codes == PADDING_IDX)[:, None, :]
        dummy = jnp.zeros((1, e), rows.dtype)

        def loss_fn(rows_in, rest_in):
            pp = dict(rest_in, embedding=dummy)
            item_e = rows_in[: bb * u].reshape(bb, u, -1)
            seq_e = rows_in[bb * u :].reshape(bb, l, -1)
            ctx = din.ctx_from_seq_emb(pp, seq_e, pad)
            logits = din.apply_from_emb(pp, item_e, ctx)
            return bce_with_logits(logits, labels, weights)

        loss, (g_rows, g_rest) = jax.value_and_grad(
            loss_fn, argnums=(0, 1)
        )(rows, rest_p)
        updates, new_rest_o = optimizer.update(g_rest, rest_o, rest_p)
        new_rest = optax.apply_updates(rest_p, updates)
        g_rows = g_rows * valid[:, None].astype(g_rows.dtype)
        new_pmv = sparse_adam.pmv_apply_rows(emb_pmv, flat, g_rows, lr)
        return new_rest, (new_rest_o, new_pmv), loss

    state = (rest_opt, pmv_state)

    def pmv_thunk():
        nonlocal rest, state
        rest, state, loss = pmv_step(rest, state, key, tc, sc, sampler_state)
        return loss

    pmv_ms = device_time_ms(pmv_thunk, iters=10)
    print(
        f"pmv step: {pmv_ms:.2f} ms ({b * unit / (pmv_ms / 1e3):,.0f} rows/s)"
        f"  [mv/pmv = {mv_ms / pmv_ms:.2f}x]",
        flush=True,
    )

    # ---- mirror unpack cost (per eval boundary under pmv) ------------------
    t0 = time.perf_counter()
    mirror = sparse_adam.pmv_unpack(state[1], table.shape[0], e)
    mirror.block_until_ready()
    unpack_s = time.perf_counter() - t0
    print(
        f"mirror unpack (one eval boundary): {unpack_s:.2f} s wall "
        f"({table.shape[0]:,} rows)",
        flush=True,
    )
    np.testing.assert_allclose(
        np.asarray(mirror[:8]), np.asarray(mirror[:8])
    )  # touch


if __name__ == "__main__":
    main()
