"""Gather speed matrix: {host,dev} x {narrow,wide} indices, interleaved twice
to expose order effects.  Per-call times (ms) for the SAME jitted gather.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    n_codes = 2_000_001
    b, width = 4096, 40
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (n_codes, 16), jnp.float32)
    meta = jax.random.normal(key, (n_codes, 2), jnp.float32)
    rng = np.random.default_rng(0)

    host_narrow = jnp.asarray(
        rng.integers(2**11, 2**12, size=(b, width)).astype(np.int32))
    host_wide = jnp.asarray(
        rng.integers(0, n_codes, size=(b, width)).astype(np.int32))

    @jax.jit
    def dev_of(x):
        return x ^ 0  # force a device computation producing the same values

    dev_narrow = dev_of(host_narrow)
    dev_wide = dev_of(host_wide)

    for name, a in [("host_narrow", host_narrow), ("host_wide", host_wide),
                    ("dev_narrow", dev_narrow), ("dev_wide", dev_wide)]:
        print(f"{name}: min={int(a.min())} max={int(a.max())}")

    @jax.jit
    def g(table, meta, cc):
        return table[cc], meta[cc]

    # warm up compile
    jax.block_until_ready(g(table, meta, host_narrow))

    def percall(name, cc, n=6):
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = g(table, meta, cc)
            jax.block_until_ready(out)
            times.append(round(1e3 * (time.perf_counter() - t0), 3))
        print(f"{name}: {times}")

    for rnd in (1, 2):
        print(f"--- round {rnd}")
        percall("host_narrow", host_narrow)
        percall("host_wide  ", host_wide)
        percall("dev_narrow ", dev_narrow)
        percall("dev_wide   ", dev_wide)


if __name__ == "__main__":
    main()
