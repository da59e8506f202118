"""Is the XLA gather element-bound?  Profile gathers of 81920 random rows
from [1M, W] for several widths/dtypes; report ms and elements/s."""

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

    n = 1_048_575
    rows = 81920
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n, size=(4096, 20)).astype(np.int32))

    @jax.jit
    def g(table, cc):
        return table[cc]

    for w, dt in [(16, jnp.float32), (18, jnp.float32), (36, jnp.float32),
                  (72, jnp.float32), (36, jnp.bfloat16), (8, jnp.float32),
                  (128, jnp.float32)]:
        key = jax.random.PRNGKey(0)
        table = jax.random.normal(key, (n, w), jnp.float32).astype(dt)
        ms = device_time_ms(lambda: g(table, idx), iters=5)
        elems = rows * w
        print(json.dumps({
            "w": w, "dtype": str(dt.__name__), "ms": round(ms, 3),
            "meps": round(elems / ms / 1e3, 1),  # million elements / s
            "ns_per_row": round(ms * 1e6 / rows, 1),
        }), flush=True)
        del table


if __name__ == "__main__":
    main()
