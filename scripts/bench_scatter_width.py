"""Row-scatter throughput vs row width on the TPU (donated, in-place).

Mirrors scripts/bench_gather_width.py: gathers were found to be strongly
width-dependent (16-lane rows fine, 36-lane pathological, 128 best per-byte).
This probes `table.at[idx].add(vals)` — the hot op of the lazy sparse-Adam
path (train/sparse_adam.py) — for the same widths, plus scatter-set, plus
the 3-scatters-per-step pattern.

Usage: python scripts/bench_scatter_width.py [--rows 10000000] [--nidx 57344]
"""

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from devtime import device_time_ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--nidx", type=int, default=57_344)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, args.rows, size=args.nidx), jnp.int32)

    for w in (16, 32, 48, 64, 128):
        table = jnp.zeros((args.rows, w), jnp.float32)
        vals = jnp.asarray(rng.normal(size=(args.nidx, w)), jnp.float32)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def add(t, i, v):
            return t.at[i].add(v)

        # keep reassigning so donation holds
        state = {"t": table}

        def thunk():
            state["t"] = add(state["t"], idx, vals)
            return state["t"]

        ms = device_time_ms(thunk, iters=args.iters)
        ns_row = ms * 1e6 / args.nidx
        print(json.dumps({"op": "scatter_add", "width": w,
                          "ms": round(ms, 3), "ns_per_row": round(ns_row, 1)}),
              flush=True)

    # flag variants at width 16: unique/sorted indices let XLA skip the
    # duplicate-handling serialization; OOB sentinel rows are dropped
    idx_sorted = jnp.sort(idx)
    for name, kw, ix in (
        ("scatter_add_unique", dict(unique_indices=True), idx),
        ("scatter_add_unique_sorted",
         dict(unique_indices=True, indices_are_sorted=True), idx_sorted),
        ("scatter_set_unique_sorted",
         dict(unique_indices=True, indices_are_sorted=True), idx_sorted),
    ):
        table = jnp.zeros((args.rows, 16), jnp.float32)
        vals = jnp.asarray(rng.normal(size=(args.nidx, 16)), jnp.float32)

        if "set" in name:
            @functools.partial(jax.jit, donate_argnums=(0,))
            def op(t, i, v, kw=kw):
                return t.at[i].set(v, **kw)
        else:
            @functools.partial(jax.jit, donate_argnums=(0,))
            def op(t, i, v, kw=kw):
                return t.at[i].add(v, **kw)

        state = {"t": table}

        def thunk():
            state["t"] = op(state["t"], ix, vals)
            return state["t"]

        ms = device_time_ms(thunk, iters=args.iters)
        print(json.dumps({"op": name, "width": 16, "ms": round(ms, 3),
                          "ns_per_row": round(ms * 1e6 / args.nidx, 1)}),
              flush=True)

    # gather+compute+scatter roundtrip at width 16 (the sparse-adam shape)
    table = jnp.zeros((args.rows, 16), jnp.float32)
    vals = jnp.asarray(rng.normal(size=(args.nidx, 16)), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def rmw(t, i, v):
        rows = t[i]
        return t.at[i].add(v - rows)

    state = {"t": table}

    def thunk():
        state["t"] = rmw(state["t"], idx, vals)
        return state["t"]

    ms = device_time_ms(thunk, iters=args.iters)
    print(json.dumps({"op": "gather_then_scatter_add", "width": 16,
                      "ms": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
