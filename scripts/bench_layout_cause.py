"""Confirm: index-array physical layout decides gather speed.

Prints .format for device-computed vs host-committed index arrays, then
times the same gather executable fed each, plus device_put-relayout copies,
plus wide-range device-computed indices.
"""

import json
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
    idx_np = rng.integers(2**11, 2**12, size=(b, width)).astype(np.int32)
    max_code = n_codes - 1

    host_idx = jnp.asarray(idx_np)

    @jax.jit
    def make_idx(x):
        return jnp.clip(x * 2 + 1, 0, max_code)

    dev_idx = make_idx(host_idx // 2)

    @jax.jit
    def make_wide_idx(k):
        return jax.random.randint(k, (b, width), 0, n_codes, jnp.int32)

    dev_wide = make_wide_idx(key)

    print("host_idx format:", host_idx.format)
    print("dev_idx  format:", dev_idx.format)
    print("dev_wide format:", dev_wide.format)

    @jax.jit
    def g(table, meta, cc):
        return table[cc], meta[cc]

    def t(name, *args, iters=20):
        out = g(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = g(*args)
        jax.block_until_ready(out)
        ms = 1e3 * (time.perf_counter() - t0) / iters
        print(json.dumps({"variant": name, "ms": round(ms, 3)}), flush=True)

    t("host_narrow", table, meta, host_idx)
    t("dev_narrow", table, meta, dev_idx)
    t("dev_wide", table, meta, dev_wide)

    relaid = jax.device_put(host_idx, dev_idx.format)
    print("relaid  format:", relaid.format)
    t("host_relaid_to_dev_format", table, meta, relaid)


if __name__ == "__main__":
    main()
