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

import functools

import jax
import jax.numpy as jnp


# Measured v5e cost model (scripts/bench_scatter_width.py, BASELINE.md):
# TPU scatter costs ~100ns per updated row at every width (flags and
# unique/sorted hints don't move it; Pallas per-row DMA can't beat it —
# Mosaic requires 128-lane-aligned HBM slices, scripts/spike_pallas_scatter).
# The packed-moments sparse step (one table scatter + one Pallas mv write +
# sort/segment apparatus) measures ≈ 200ns per touched row (DR layer step at
# 10M items: 11.3ms apparatus / 57k rows); the split m/v fallback pays three
# ~100ns XLA scatters plus the apparatus ≈ 350ns per touched row.  The dense
# step reads/writes params, both moments and the dense gradient ≈ 0.8ns per
# table row at HBM bandwidth — PLUS the dense-grad scatter materialization,
# which costs the same ~100ns per touched row (xplane: 5.7ms for 57k rows
# into [10M,16] zeros).  Both sides scale with touched rows; only dense pays
# O(table).
_SPARSE_NS_PER_TOUCHED_ROW = 200.0
_SPLIT_NS_PER_TOUCHED_ROW = 350.0
_DENSE_NS_PER_TABLE_ROW = 0.8
_DENSE_NS_PER_TOUCHED_ROW = 100.0


def sparse_worthwhile(
    table_rows: int,
    touched_rows_per_step: int,
    embed_dim: int | None = None,
) -> bool:
    """Cost-model decision for the auto mode: lazy sparse Adam wins when the
    per-step scatter bill undercuts dense Adam's O(table) HBM traffic plus
    its own dense-gradient scatter materialization.

    ``embed_dim`` names the table width so the model can charge the format
    the trainer would actually get: the packed-row step (~200ns/row) when
    the width packs into 128-lane rows (mv or p|m|v), the split 3-scatter
    fallback (~350ns/row) otherwise.  ``None`` assumes packable (the common
    widths 8/16/32/64).

    Verified against xplane device timings at 10M items: TDM (8.4k touched
    rows / 33.5M-row table) sparse wins 28.6 -> 5.05 ms; DR's E-step at
    batch 4096 (57k touched / 10M-row table) sparse wins 45.2 -> 32.9 ms
    (scripts/profile_dr_estep.py; the round-2 packed-moments path changed
    the economics — the earlier 3-scatter sparse step lost this one).
    """
    ns = _SPARSE_NS_PER_TOUCHED_ROW
    if embed_dim is not None and not (
        _packed_slots(embed_dim) > 0 or pmv_slots(embed_dim) > 0
    ):
        ns = _SPLIT_NS_PER_TOUCHED_ROW
    return touched_rows_per_step * ns < (
        table_rows * _DENSE_NS_PER_TABLE_ROW
        + touched_rows_per_step * _DENSE_NS_PER_TOUCHED_ROW
    )


def _packed_slots(embed_dim: int) -> int:
    """Logical rows per 128-lane physical row of the packed m|v table
    (0 = packing not applicable for this width)."""
    if embed_dim <= 0 or 128 % (2 * embed_dim) != 0:
        return 0
    return 128 // (2 * embed_dim)


def init_state(
    table: jnp.ndarray, mu_dtype=jnp.float32, packed: bool | None = None
) -> dict:
    """Adam moment tables + step count for one embedding table.

    Moments are kept in ``mu_dtype`` (f32 by default, also under bf16
    params — mirroring the dense path's ``optax.adam(mu_dtype=f32)``).

    When the embed width divides a 128-lane row (E in {64, 32, 16, ...}) and
    moments are f32, m and v are stored interleaved in ONE [P, 128] physical
    table (logical row r keeps m|v at lanes [(r%S)*2E, (r%S+1)*2E) of
    physical row r//S, plus one sacrificial scratch row at P-1).  Same bytes
    as split m/v, but the per-step update becomes one 128-lane row gather +
    one Pallas DMA row write (ops/row_writer.py, ~30ns/row) instead of two
    ~100ns/row XLA scatters — the dominant cost of this step at catalog
    scale.  ``packed=None`` auto-selects; split format keeps exact backward
    compatibility for other widths/dtypes.
    """
    v_rows, e = table.shape
    s = _packed_slots(e)
    if packed is None:
        packed = s > 0 and mu_dtype == jnp.float32
    if packed:
        if s == 0 or mu_dtype != jnp.float32:
            raise ValueError(f"cannot pack moments for embed width {e}")
        phys = -(-v_rows // s) + 1  # +1 sacrificial scratch row
        return {
            "mv": jnp.zeros((phys, 128), jnp.float32),
            "count": jnp.zeros((), jnp.int32),
        }
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
    if "mv" in state:
        return _apply_rows_packed(
            table, state, flat_codes, g_rows, lr, b1, b2, eps
        )
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


def _bitcast_i32(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _bitcast_f32(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _apply_rows_packed(
    table, state, flat_codes, g_rows, lr, b1, b2, eps, use_pallas=None
):
    """Packed-moments variant: one 128-lane gather + one Pallas row write.

    Exact same per-row Adam math as the split path.  All f32 payloads that
    move through one-hot selections are routed as int32 bitpatterns (TPU
    default dot precision rounds f32 operands to bf16 — CLAUDE.md); int32
    contractions on the VPU are exact, and lanes not selected contribute
    int32 zeros (== f32 +0.0), so every merge below is bit-exact.
    """
    from dismember_tpu.ops.row_writer import write_rows_128

    e = table.shape[1]
    s_per = _packed_slots(e)
    mv = state["mv"]
    phys_rows = mv.shape[0]  # includes the scratch row at phys_rows-1
    codes_u, g, live = dedup_rows(flat_codes, g_rows)
    r = codes_u.shape[0]
    count = state["count"] + 1
    cf = count.astype(jnp.float32)

    safe_codes = jnp.where(live, codes_u, 0)
    phys = jnp.where(live, safe_codes // s_per, phys_rows - 1)
    slot = jnp.where(live, safe_codes % s_per, 0)
    rows128 = mv[phys]  # [R, 128] one gather covers m and v
    oh = (slot[:, None] == jnp.arange(s_per)[None, :]).astype(jnp.int32)

    # exact slot extraction: int32 one-hot contraction over the S slots
    ri = _bitcast_i32(rows128).reshape(r, s_per, 2 * e)
    old = _bitcast_f32(jnp.einsum("rse,rs->re", ri, oh))
    m_rows, v_rows = old[:, :e], old[:, e:]

    g = g.astype(jnp.float32)
    m_new = b1 * m_rows + (1.0 - b1) * g
    v_new = b2 * v_rows + (1.0 - b2) * (g * g)
    m_hat = m_new / (1.0 - jnp.power(b1, cf))
    v_hat = v_new / (1.0 - jnp.power(b2, cf))
    upd = (m_hat / (jnp.sqrt(v_hat) + eps)) * (-lr)

    # place m_new|v_new back into this row's slot lanes (int32-exact), then
    # combine the slots that share a physical row (slots are disjoint, so
    # int32 sums of their expansions never collide)
    payload = _bitcast_i32(jnp.concatenate([m_new, v_new], axis=1))
    expanded = jnp.einsum("re,rs->rse", payload, oh).reshape(r, 128)
    mask128 = jnp.repeat(oh, 2 * e, axis=1)  # [R, 128]
    startp = jnp.concatenate(
        [jnp.ones((1,), bool), phys[1:] != phys[:-1]]
    )
    segp = jnp.cumsum(startp) - 1
    upd_sum = jax.ops.segment_sum(expanded, segp, num_segments=r)
    mask_sum = jax.ops.segment_sum(mask128, segp, num_segments=r)
    # all occurrences of a physical row gathered identical bytes, so a
    # segment_max over the bitpatterns reproduces the old row exactly
    old_seg = jax.ops.segment_max(_bitcast_i32(rows128), segp, num_segments=r)
    new_rows = jnp.where(
        mask_sum > 0, _bitcast_f32(upd_sum), _bitcast_f32(old_seg)
    )
    phys_u = jax.ops.segment_max(phys, segp, num_segments=r)
    phys_w = jnp.where(phys_u >= 0, phys_u, phys_rows - 1)
    # empty segments (and the padding segment) target the scratch row with
    # whatever payload; live physical rows are unique within phys_w
    new_rows = jnp.where((phys_w == phys_rows - 1)[:, None], 0.0, new_rows)
    new_mv = write_rows_128(mv, phys_w, new_rows, use_pallas=use_pallas)

    livef = live[:, None]
    new_table = table.at[safe_codes].add(
        jnp.where(livef, upd, 0.0).astype(table.dtype)
    )
    return new_table, {"mv": new_mv, "count": count}


# --------------------------------------------------------------------------
# pmv: params + both moments packed into one 128-lane row
# --------------------------------------------------------------------------
# The mv format above still pays the ~100ns/row XLA scatter-add into the
# [V, E] param table every step (xplane: 13.4ms of the 32.9ms DR 10M-item
# E-step).  Packing the PARAM lanes next to m and v removes the last scatter:
# slot s of a physical row holds [p | m | v | pad] at lanes
# [s*(128/S), (s+1)*(128/S)), so one 128-lane row gather reads all three and
# one Pallas DMA row write (~30ns/row) commits all three.  The param table
# becomes trainer-internal state; consumers outside the train step read an
# unpacked [V, E] mirror (pmv_unpack), refreshed at epoch/eval boundaries.


def pmv_slots(embed_dim: int) -> int:
    """Logical rows per 128-lane physical row of a p|m|v packed table
    (0 = packing not applicable for this width).

    A slot needs 3*E lanes (p|m|v) plus whatever padding rounds the slot
    width to 128/S; S must divide 128, so S is the largest power of two
    with 128/S >= 3*E.  Non-power-of-two widths pack too — e.g. E=17
    (a [w | bias] rerank table) gets 2 slots of 64 lanes with 13 pad."""
    if embed_dim <= 0 or 3 * embed_dim > 128:
        return 0
    s = 1
    while 2 * s <= 128 // (3 * embed_dim):
        s *= 2
    return s


def _pmv_geometry(v_rows: int, e: int) -> tuple[int, int, int]:
    s = pmv_slots(e)
    if s == 0:
        raise ValueError(f"cannot pack p|m|v for embed width {e}")
    per = 128 // s  # lanes per logical row (p:e | m:e | v:e | pad:per-3e)
    phys = -(-v_rows // s)
    return s, per, phys


# chunk size for whole-table pack/refresh/unpack passes: one fused XLA
# program OOMs near ~3x its output at multi-GB outputs (CLAUDE.md), and at
# 10M items three packed tables already hold ~7.7GB — stream in ~256MB
# pieces through donated dynamic_update_slice programs instead.
_PMV_CHUNK_PHYS = 1 << 19


@functools.partial(jax.jit, donate_argnums=0)
def _pmv_write_chunk(buf, block, start):
    return jax.lax.dynamic_update_slice(buf, block, (start, 0))


@functools.partial(jax.jit, donate_argnums=0, static_argnums=(3, 4))
def _pmv_merge_chunk(buf, tb_chunk, start, e, per):
    """Replace the p lanes of buf[start : start+c] with tb_chunk, keeping
    the m/v/pad lanes."""
    c = tb_chunk.shape[0] // (128 // per)
    old = jax.lax.dynamic_slice(buf, (start, 0), (c, 128))
    s = 128 // per
    merged = jnp.concatenate(
        [tb_chunk.reshape(c, s, e), old.reshape(c, s, per)[..., e:]], axis=-1
    ).reshape(c, 128)
    return jax.lax.dynamic_update_slice(buf, merged, (start, 0))


def _padded_chunk(table: jnp.ndarray, r0: int, rows: int, per: int):
    """table[r0 : r0+rows] as f32, row-padded to ``rows`` and lane-padded to
    ``per`` — the p|0|0|0 block for one chunk of physical rows."""
    tb = table[r0 : min(r0 + rows, table.shape[0])].astype(jnp.float32)
    return jnp.pad(
        tb, ((0, rows - tb.shape[0]), (0, per - tb.shape[1]))
    )


def pmv_init(table: jnp.ndarray) -> dict:
    """Pack a [V, E] f32 param table into p|m|v rows with zero moments.

    Returns ``{"pmv": [phys+1, 128] f32, "count": 0}`` — the +1 is a
    sacrificial scratch row for padded DMA writes (same convention as the
    mv format).  Built chunk-wise into a donated buffer to bound transient
    HBM at catalog scale.  The intermediate buffers are donated internally;
    ``table`` itself is NOT consumed."""
    v_rows, e = table.shape
    s, per, phys = _pmv_geometry(v_rows, e)
    pmv = jnp.zeros((phys + 1, 128), jnp.float32)
    for p0 in range(0, phys, _PMV_CHUNK_PHYS):
        c = min(_PMV_CHUNK_PHYS, phys - p0)
        block = _padded_chunk(table, p0 * s, c * s, per).reshape(c, 128)
        pmv = _pmv_write_chunk(pmv, block, p0)
    return {"pmv": pmv, "count": jnp.zeros((), jnp.int32)}


def pmv_refresh(state: dict, table: jnp.ndarray) -> dict:
    """Overwrite the p lanes from ``table``, keeping moments and count —
    used when an external load replaced the trainer's param mirror.

    DONATES ``state["pmv"]``: the input buffer is consumed by the chunked
    merge (``_pmv_merge_chunk`` has ``donate_argnums=0``), so the caller
    must not touch the old ``state`` afterwards — on TPU a reuse raises a
    donated-buffer error (the CPU test backend ignores donation, so tests
    can't catch such misuse).  ``table`` is not consumed."""
    v_rows, e = table.shape
    s, per, phys = _pmv_geometry(v_rows, e)
    pmv = state["pmv"]
    for p0 in range(0, phys, _PMV_CHUNK_PHYS):
        c = min(_PMV_CHUNK_PHYS, phys - p0)
        tb = _padded_chunk(table, p0 * s, c * s, e)  # row pad only
        pmv = _pmv_merge_chunk(pmv, tb, p0, e, per)
    return {"pmv": pmv, "count": state["count"]}


@functools.partial(jax.jit, donate_argnums=0, static_argnums=(2, 3, 4))
def _pmv_unpack_chunk(out, buf, p0, e, per):
    s = 128 // per
    c = min(_PMV_CHUNK_PHYS, buf.shape[0] - 1 - p0)
    rows = jax.lax.dynamic_slice(buf, (p0, 0), (c, 128))
    vals = rows.reshape(c, s, per)[..., :e].reshape(c * s, e)
    return jax.lax.dynamic_update_slice(out, vals, (p0 * s, 0))


def pmv_unpack(state: dict, v_rows: int, e: int) -> jnp.ndarray:
    """Materialize the [V, E] param table from the packed state (chunk-wise;
    the last physical row's padding slots fall off the row-padded buffer)."""
    s, per, phys = _pmv_geometry(v_rows, e)
    out = jnp.zeros((phys * s, e), jnp.float32)
    for p0 in range(0, phys, _PMV_CHUNK_PHYS):
        out = _pmv_unpack_chunk(out, state["pmv"], p0, e, per)
    return out[:v_rows] if phys * s != v_rows else out


def pmv_gather(pmv: jnp.ndarray, codes: jnp.ndarray, e: int) -> jnp.ndarray:
    """Gather param rows [R, E] from the packed table (codes must be >= 0;
    mask padding on the caller side as with a plain table gather).

    The slot extraction rides an int32 one-hot contraction — exact for
    arbitrary f32 bitpatterns, unlike an f32 einsum which the MXU would
    round to bf16 (CLAUDE.md)."""
    s = pmv_slots(e)
    if s == 1:
        return pmv[codes][:, :e]
    per = 128 // s
    rows = pmv[codes // s]  # [R, 128]
    oh = (
        (codes % s)[:, None] == jnp.arange(s, dtype=codes.dtype)[None, :]
    ).astype(jnp.int32)
    ri = _bitcast_i32(rows).reshape(-1, s, per)
    return _bitcast_f32(jnp.einsum("rsl,rs->rl", ri, oh))[:, :e]


def pmv_apply_rows(
    state: dict,
    flat_codes: jnp.ndarray,
    g_rows: jnp.ndarray,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    use_pallas: bool | None = None,
) -> dict:
    """One lazy-Adam step on the packed p|m|v table: one row gather + one
    Pallas row write, zero XLA scatters.  Same per-touched-row Adam math as
    ``apply_rows`` (bit-identical given identical gradients)."""
    from dismember_tpu.ops.row_writer import write_rows_128

    e = g_rows.shape[1]
    s_per = pmv_slots(e)
    per = 128 // s_per
    pmv = state["pmv"]
    phys_rows = pmv.shape[0]  # includes the scratch row
    codes_u, g, live = dedup_rows(flat_codes, g_rows)
    r = codes_u.shape[0]
    count = state["count"] + 1
    cf = count.astype(jnp.float32)

    safe_codes = jnp.where(live, codes_u, 0)
    phys = jnp.where(live, safe_codes // s_per, phys_rows - 1)
    slot = jnp.where(live, safe_codes % s_per, 0)
    rows128 = pmv[phys]  # [R, 128] covers p, m and v
    oh = (slot[:, None] == jnp.arange(s_per)[None, :]).astype(jnp.int32)
    ri = _bitcast_i32(rows128).reshape(r, s_per, per)
    old = _bitcast_f32(jnp.einsum("rsl,rs->rl", ri, oh))
    p_rows, m_rows, v_rows = old[:, :e], old[:, e : 2 * e], old[:, 2 * e : 3 * e]

    g = g.astype(jnp.float32)
    m_new = b1 * m_rows + (1.0 - b1) * g
    v_new = b2 * v_rows + (1.0 - b2) * (g * g)
    m_hat = m_new / (1.0 - jnp.power(b1, cf))
    v_hat = v_new / (1.0 - jnp.power(b2, cf))
    p_new = p_rows + (m_hat / (jnp.sqrt(v_hat) + eps)) * (-lr)

    payload = _bitcast_i32(
        jnp.pad(
            jnp.concatenate([p_new, m_new, v_new], axis=1),
            ((0, 0), (0, per - 3 * e)),
        )
    )
    expanded = jnp.einsum("rl,rs->rsl", payload, oh).reshape(r, 128)
    mask128 = jnp.repeat(oh, per, axis=1)  # [R, 128]
    startp = jnp.concatenate([jnp.ones((1,), bool), phys[1:] != phys[:-1]])
    segp = jnp.cumsum(startp) - 1
    upd_sum = jax.ops.segment_sum(expanded, segp, num_segments=r)
    mask_sum = jax.ops.segment_sum(mask128, segp, num_segments=r)
    old_seg = jax.ops.segment_max(_bitcast_i32(rows128), segp, num_segments=r)
    new_rows = jnp.where(
        mask_sum > 0, _bitcast_f32(upd_sum), _bitcast_f32(old_seg)
    )
    phys_u = jax.ops.segment_max(phys, segp, num_segments=r)
    phys_w = jnp.where(phys_u >= 0, phys_u, phys_rows - 1)
    new_rows = jnp.where((phys_w == phys_rows - 1)[:, None], 0.0, new_rows)
    new_pmv = write_rows_128(pmv, phys_w, new_rows, use_pallas=use_pallas)
    return {"pmv": new_pmv, "count": count}
