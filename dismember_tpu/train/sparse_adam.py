"""Lazy row-sparse Adam for giant embedding tables.

Why this exists: at deep catalogs the dense train step's cost is dominated by
HBM traffic that scales with the TABLE, not the batch.  The backward pass
materializes a dense [V, E] gradient (a scatter-add of ~1e4 touched rows into
2.1GB of zeros at a 10M-item catalog) and dense Adam then reads and writes
the parameters and both moment tables (~15GB of traffic per step).  This
module instead differentiates w.r.t. the *gathered rows* and applies Adam
only to the touched rows: per-step traffic drops from O(V·E) to O(R·E) with
R ≈ batch · unit ≈ 1e4.

Semantics: "lazy Adam" (TF ``LazyAdamOptimizer`` / torch ``SparseAdam``) —
rows not touched in a step keep their moments un-decayed and receive no
momentum-only update.  The reference's dense Adam (scalann optim/Adam.scala:
8-99) updates every row every step; for rows touched in a step the update
here matches optax/reference Adam exactly (same moments, same bias
correction).  Dense remains the default for small catalogs (exact reference
parity); trainers switch to this path automatically at depth
(train/tdm.py ``sparse_embed_update``).

Duplicate handling: a code may appear many times in a step (as a sampled
candidate and in user sequences).  Dense autodiff scatter-ADDS those partial
gradients; :func:`dedup_rows` reproduces that with one sort + segment-sum so
each touched row gets exactly one Adam update on the summed gradient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# Measured v5e cost model (scripts/bench_scatter_width.py, BASELINE.md):
# TPU scatter costs ~100ns per updated row at every width (flags and
# unique/sorted hints don't move it; Pallas per-row DMA can't beat it —
# Mosaic requires 128-lane-aligned HBM slices, scripts/spike_pallas_scatter).
# The sparse step does 3 scatters + sort/segment apparatus ≈ 350ns per
# touched row; the dense step reads/writes params, both moments and the
# dense gradient ≈ 0.8ns per table row at HBM bandwidth.
_SPARSE_NS_PER_TOUCHED_ROW = 350.0
_DENSE_NS_PER_TABLE_ROW = 0.8


def sparse_worthwhile(table_rows: int, touched_rows_per_step: int) -> bool:
    """Cost-model decision for the auto mode: lazy sparse Adam wins when the
    per-step scatter bill undercuts dense Adam's O(table) HBM traffic.

    Verified against xplane device timings at 10M items: TDM (8.4k touched
    rows / 33.5M-row table) sparse wins 28.6 -> 5.05 ms; DR's layer step at
    batch 4096 (57k touched / 10M-row table) dense wins.
    """
    return (
        touched_rows_per_step * _SPARSE_NS_PER_TOUCHED_ROW
        < table_rows * _DENSE_NS_PER_TABLE_ROW
    )


def init_state(table: jnp.ndarray, mu_dtype=jnp.float32) -> dict:
    """Adam moment tables + step count for one embedding table.

    Moments are kept in ``mu_dtype`` (f32 by default, also under bf16
    params — mirroring the dense path's ``optax.adam(mu_dtype=f32)``)."""
    return {
        "m": jnp.zeros(table.shape, mu_dtype),
        "v": jnp.zeros(table.shape, mu_dtype),
        "count": jnp.zeros((), jnp.int32),
    }


def dedup_rows(
    flat_codes: jnp.ndarray, g_rows: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Combine duplicate row gradients: (codes_u [R], g_sum [R, E], live [R]).

    ``flat_codes``: [R] int32 row ids, -1 = padding (dropped).  Output slot i
    holds the i-th segment of the sorted codes; ``live`` marks slots that own
    a real (non-padding, non-empty) row.  No 1-D gathers: the permutation
    comes out of ``lax.sort_key_val`` and is only used as a 2-D row gather.
    """
    r = flat_codes.shape[0]
    s, order = jax.lax.sort_key_val(
        flat_codes, jnp.arange(r, dtype=jnp.int32)
    )
    gs = g_rows[order]
    start = jnp.concatenate(
        [jnp.ones((1,), bool), s[1:] != s[:-1]]
    )
    seg = jnp.cumsum(start) - 1
    g_sum = jax.ops.segment_sum(gs, seg, num_segments=r)
    codes_u = jax.ops.segment_max(s, seg, num_segments=r)
    cnt = jax.ops.segment_sum(jnp.ones((r,), jnp.int32), seg, num_segments=r)
    live = (cnt > 0) & (codes_u >= 0)
    return codes_u, g_sum, live


def apply_rows(
    table: jnp.ndarray,
    state: dict,
    flat_codes: jnp.ndarray,
    g_rows: jnp.ndarray,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> tuple[jnp.ndarray, dict]:
    """One lazy-Adam step on the rows named by ``flat_codes``.

    ``g_rows`` [R, E] are per-occurrence gradients (duplicates summed here).
    Returns the updated table and state.  Update math matches
    ``optax.adam``'s for the touched rows: m/v EMA, power bias correction,
    ``-lr * m_hat / (sqrt(v_hat) + eps)``.
    """
    codes_u, g, live = dedup_rows(flat_codes, g_rows)
    g = g.astype(state["m"].dtype)
    safe = jnp.where(live, codes_u, 0)
    m_rows = state["m"][safe]
    v_rows = state["v"][safe]
    count = state["count"] + 1
    cf = count.astype(jnp.float32)
    m_new = b1 * m_rows + (1.0 - b1) * g
    v_new = b2 * v_rows + (1.0 - b2) * (g * g)
    m_hat = m_new / (1.0 - jnp.power(b1, cf))
    v_hat = v_new / (1.0 - jnp.power(b2, cf))
    upd = (m_hat / (jnp.sqrt(v_hat) + eps)) * (-lr)
    livef = live[:, None]
    # delta-form scatter-adds: dead/duplicate slots contribute exact zeros,
    # live slots are unique row ids, so adds never collide
    new_table = table.at[safe].add(
        jnp.where(livef, upd, 0.0).astype(table.dtype)
    )
    new_m = state["m"].at[safe].add(jnp.where(livef, m_new - m_rows, 0.0))
    new_v = state["v"].at[safe].add(jnp.where(livef, v_new - v_rows, 0.0))
    return new_table, {"m": new_m, "v": new_v, "count": count}
