"""Spike 2: per-row Pallas DMA scatter on 128-lane (512B-aligned) rows.

The first spike (spike_pallas_scatter.py) failed at width 16: Mosaic
rejects (1,16) f32 HBM slices.  This retries with the table viewed as
[V/8, 128] physical rows (512B each — the native HBM tile width), which is
how a fused sparse-update kernel would address a [V,16] table anyway
(logical row r lives at lanes (r%8)*16..(r%8)*16+16 of physical row r//8).

Measures, per width in {32, 64, 128}:
  - piped write-only DMA (K in flight): the floor for scatter-set
  - piped read-modify-write (2 DMAs/row): the floor for scatter-add
against XLA's measured ~100ns/row scatter.
"""

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

    R = 57_344
    C = 512   # rows per grid step
    K = 8     # DMAs in flight

    rng = np.random.default_rng(0)

    for W in (128, 64, 32):
        V = 10_000_000 * 16 // W  # same total bytes as the [10M,16] table
        idx = jnp.asarray(rng.choice(V, size=R, replace=False).astype(np.int32))
        vals = jnp.asarray(rng.normal(size=(R, W)), jnp.float32)

        def piped_write(idx_ref, vals_ref, table_ref, out_ref, sems):
            c = pl.program_id(0)

            def mk(r, slot):
                i = idx_ref[c * C + r]
                return pltpu.make_async_copy(
                    vals_ref.at[pl.ds(r, 1)], out_ref.at[pl.ds(i, 1)],
                    sems.at[slot],
                )

            def body(r, _):
                @pl.when(r >= K)
                def _():
                    mk(r - K, (r - K) % K).wait()
                mk(r, r % K).start()
                return 0

            jax.lax.fori_loop(0, C, body, 0)

            def drain(j, _):
                r = C - K + j
                mk(r, r % K).wait()
                return 0

            jax.lax.fori_loop(0, K, drain, 0)

        def piped_rmw(idx_ref, vals_ref, table_ref, out_ref, buf, rsems, wsems):
            """Read row -> add val -> write back, K-deep pipelined."""
            c = pl.program_id(0)

            def rd(r, slot):
                i = idx_ref[c * C + r]
                return pltpu.make_async_copy(
                    out_ref.at[pl.ds(i, 1)], buf.at[pl.ds(slot, 1)],
                    rsems.at[slot],
                )

            def wr(r, slot):
                i = idx_ref[c * C + r]
                return pltpu.make_async_copy(
                    buf.at[pl.ds(slot, 1)], out_ref.at[pl.ds(i, 1)],
                    wsems.at[slot],
                )

            def body(r, _):
                slot = r % K

                @pl.when(r >= K)
                def _():
                    wr(r - K, slot).wait()
                rd(r, slot).start()
                rd(r, slot).wait()
                buf[slot, :] = buf[slot, :] + vals_ref[r, :]
                wr(r, slot).start()
                return 0

            jax.lax.fori_loop(0, C, body, 0)

            def drain(j, _):
                r = C - K + j
                wr(r, r % K).wait()
                return 0

            jax.lax.fori_loop(0, K, drain, 0)

        for name, kernel, scratch in (
            ("write", piped_write, [pltpu.SemaphoreType.DMA((K,))]),
            ("rmw", piped_rmw, [
                pltpu.VMEM((K, W), jnp.float32),
                pltpu.SemaphoreType.DMA((K,)),
                pltpu.SemaphoreType.DMA((K,)),
            ]),
        ):
            try:
                call = pl.pallas_call(
                    kernel,
                    grid_spec=pltpu.PrefetchScalarGridSpec(
                        num_scalar_prefetch=1,
                        grid=(R // C,),
                        in_specs=[
                            pl.BlockSpec((C, W), lambda c, idx_ref: (c, 0)),
                            pl.BlockSpec(memory_space=pltpu.ANY),
                        ],
                        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                        scratch_shapes=scratch,
                    ),
                    out_shape=jax.ShapeDtypeStruct((V, W), jnp.float32),
                    input_output_aliases={2: 0},
                )
                jitted = jax.jit(
                    lambda i, v, t, call=call: call(i, v, t),
                    donate_argnums=(2,),
                )
                state = {"t": jnp.zeros((V, W), jnp.float32)}

                def thunk():
                    state["t"] = jitted(idx, vals, state["t"])
                    return state["t"]

                ms = device_time_ms(thunk, iters=5)
                print(json.dumps({"variant": name, "width": W,
                                  "ms": round(ms, 3),
                                  "ns_per_row": round(ms * 1e6 / R, 1)}),
                      flush=True)
            except Exception as e:  # noqa: BLE001 — spike: record and move on
                print(json.dumps({"variant": name, "width": W,
                                  "error": f"{type(e).__name__}: {e}"[:300]}),
                      flush=True)
            finally:
                state = None


if __name__ == "__main__":
    main()
