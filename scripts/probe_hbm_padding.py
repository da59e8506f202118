"""Infer HBM physical width from full-sweep bandwidth: time chained y=y+1
over [2M, w] for several w.  Device time scales with PHYSICAL bytes, so
ms/logical-GB reveals the padding ratio.  (memory_stats is unavailable
through the device tunnel.)"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    n = 2_000_000

    @jax.jit
    def step(y):
        return y + 1.0

    for w in (2, 16, 36, 64, 128):
        y = jnp.zeros((n, w), jnp.float32)
        y = step(y)
        y.block_until_ready()
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            y = step(y)
        y.block_until_ready()
        ms = 1e3 * (time.perf_counter() - t0) / iters
        logical_gb = n * w * 4 * 2 / 1e9  # read + write
        print(f"w={w:4d}  {ms:7.3f} ms  logical {logical_gb:6.3f} GB  "
              f"=> {logical_gb/ms*1e3:7.1f} GB/s apparent")
        del y


if __name__ == "__main__":
    main()
