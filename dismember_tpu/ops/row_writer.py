"""Pallas per-row DMA writer for 128-lane tables.

Why: XLA's row scatter costs ~100ns/row at every width
(scripts/bench_scatter_width.py), which dominates the lazy sparse-Adam step
(train/sparse_adam.py) — 3 scatters/step is ~300ns per touched row.  A
pipelined per-row async-copy Pallas kernel writes unique 512B-aligned
(1, 128) f32 rows at ~30ns/row (scripts/spike_pallas_scatter128.py; widths
<128 are rejected by Mosaic, which is why the first spike at width 16
failed).  This module wraps that kernel as ``write_rows_128`` with an XLA
``.at[].set`` fallback for CPU tests / non-128-lane shapes.

Scatter-adds don't fit this model (a DMA write is a set); callers that need
read-modify-write gather the old rows with XLA's fast 128-lane row gather
(9.3ns/row, CLAUDE.md), merge on the VPU, and write back the full rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BLOCK = 512  # rows per grid step
_INFLIGHT = 8  # DMAs in flight


def _on_tpu() -> bool:
    try:
        # a jax.default_device(cpu) scope (the multi-chip dryrun on a TPU-
        # default machine) must route to the XLA fallback even though the
        # process default backend is the TPU plugin
        dd = jax.config.jax_default_device
        if dd is not None:
            return getattr(dd, "platform", str(dd)) == "tpu"
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


def _pallas_write(table: jnp.ndarray, idx: jnp.ndarray, rows: jnp.ndarray):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = idx.shape[0]
    c = min(_BLOCK, r)
    k = _INFLIGHT

    def kernel(idx_ref, rows_ref, table_ref, out_ref, sems):
        step = pl.program_id(0)

        def mk(i, slot):
            dst = idx_ref[step * c + i]
            return pltpu.make_async_copy(
                rows_ref.at[pl.ds(i, 1)], out_ref.at[pl.ds(dst, 1)],
                sems.at[slot],
            )

        def body(i, _):
            @pl.when(i >= k)
            def _():
                mk(i - k, (i - k) % k).wait()

            mk(i, i % k).start()
            return 0

        jax.lax.fori_loop(0, c, body, 0)

        def drain(j, _):
            i = c - min(k, c) + j
            mk(i, i % k).wait()
            return 0

        jax.lax.fori_loop(0, min(k, c), drain, 0)

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(r // c,),
            in_specs=[
                pl.BlockSpec((c, 128), lambda step, idx_ref: (step, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((k,))],
        ),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={2: 0},
    )
    return call(idx, rows, table)


def write_rows_128(
    table: jnp.ndarray,
    idx: jnp.ndarray,
    rows: jnp.ndarray,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Overwrite ``table[idx[i]] = rows[i]`` and return the table.

    ``idx`` entries must be unique EXCEPT for repeats that carry identical
    payloads (e.g. a sacrificial scratch row) — duplicate DMAs then write the
    same bytes and the outcome is well-defined either way.  The Pallas path
    requires ``table.shape[1] == 128`` and f32; anything else (and the CPU
    backend) falls back to XLA scatter-set.  The row count is padded to the
    DMA block size by repeating the last (idx, row) pair.
    """
    if use_pallas is None:
        use_pallas = _on_tpu()
    if (
        not use_pallas
        or table.ndim != 2
        or table.shape[1] != 128
        or table.dtype != jnp.float32
        or idx.shape[0] == 0
    ):
        return table.at[idx].set(rows, mode="drop")
    r = idx.shape[0]
    c = min(_BLOCK, r)
    pad = (-r) % c
    if pad:
        idx = jnp.concatenate([idx, jnp.broadcast_to(idx[-1:], (pad,))])
        rows = jnp.concatenate(
            [rows, jnp.broadcast_to(rows[-1:], (pad, rows.shape[1]))]
        )
    return _pallas_write(table, idx.astype(jnp.int32), rows)
