"""Spike: can a Pallas per-row DMA writer beat XLA's ~100ns/row scatter?

Minimal scatter-set: write R unique rows of width E from a VMEM block into
an HBM-resident table at dynamic (scalar-prefetched) row offsets.  Variants:
serial DMA (latency floor) and K-deep pipelined DMAs.

Context: scripts/bench_scatter_width.py measured XLA scatter_add/set at
~100ns/row regardless of width/flags; XLA's *gather* engine does 5-9ns/row.
If per-row DMA lands well under 100ns/row, a fused Pallas sparse-Adam
kernel is worth building; if not, this records the evidence against it.
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from devtime import device_time_ms


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    V, E = 10_000_000, 16
    R = 57_344
    C = 512  # rows per grid step
    K = 8    # DMAs in flight (pipelined variant)

    rng = np.random.default_rng(0)
    # unique row ids (sparse-adam guarantees uniqueness after dedup)
    idx = jnp.asarray(
        rng.choice(V, size=R, replace=False).astype(np.int32)
    )
    vals = jnp.asarray(rng.normal(size=(R, E)), jnp.float32)

    def serial_kernel(idx_ref, vals_ref, table_ref, out_ref, sem):
        c = pl.program_id(0)

        def body(r, _):
            i = idx_ref[c * C + r]
            dma = pltpu.make_async_copy(
                vals_ref.at[pl.ds(r, 1)], out_ref.at[pl.ds(i, 1)], sem
            )
            dma.start()
            dma.wait()
            return 0

        jax.lax.fori_loop(0, C, body, 0)

    def piped_kernel(idx_ref, vals_ref, table_ref, out_ref, sems):
        c = pl.program_id(0)

        def start(r, slot):
            i = idx_ref[c * C + r]
            pltpu.make_async_copy(
                vals_ref.at[pl.ds(r, 1)], out_ref.at[pl.ds(i, 1)],
                sems.at[slot],
            ).start()

        def wait(r, slot):
            i = idx_ref[c * C + r]
            pltpu.make_async_copy(
                vals_ref.at[pl.ds(r, 1)], out_ref.at[pl.ds(i, 1)],
                sems.at[slot],
            ).wait()

        def body(r, _):
            @pl.when(r >= K)
            def _():
                wait(r - K, (r - K) % K)
            start(r, r % K)
            return 0

        jax.lax.fori_loop(0, C, body, 0)

        def drain(j, _):
            r = C - K + j
            wait(r, r % K)
            return 0

        jax.lax.fori_loop(0, K, drain, 0)

    for name, kernel, scratch in (
        ("serial", serial_kernel, [pltpu.SemaphoreType.DMA(())]),
        ("piped", piped_kernel, [pltpu.SemaphoreType.DMA((K,))]),
    ):
        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(R // C,),
                in_specs=[
                    pl.BlockSpec((C, E), lambda c, idx_ref: (c, 0)),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                scratch_shapes=scratch,
            ),
            out_shape=jax.ShapeDtypeStruct((V, E), jnp.float32),
            input_output_aliases={2: 0},
        )
        jitted = jax.jit(
            lambda i, v, t, call=call: call(i, v, t), donate_argnums=(2,)
        )
        state = {"t": jnp.zeros((V, E), jnp.float32)}

        def thunk():
            state["t"] = jitted(idx, vals, state["t"])
            return state["t"]

        try:
            ms = device_time_ms(thunk, iters=5)
            print(json.dumps({"variant": name, "ms": round(ms, 3),
                              "ns_per_row": round(ms * 1e6 / R, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — spike: record and move on
            print(json.dumps({"variant": name,
                              "error": f"{type(e).__name__}: {e}"[:400]}),
                  flush=True)


if __name__ == "__main__":
    main()
