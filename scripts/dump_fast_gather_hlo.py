"""Dump compiled HLO of the FAST isolated gather program (45us) to learn the
fast formulation, vs the same gather with a trivial consumer (sum)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    n_codes = 2_000_001
    b, width = 4096, 40
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (n_codes, 16), jnp.float32)
    rng = np.random.default_rng(0)
    cc = jnp.asarray(rng.integers(0, n_codes, size=(b, width)).astype(np.int32))

    @jax.jit
    def g_alone(table, cc):
        return table[cc]

    @jax.jit
    def g_sum(table, cc):
        return table[cc].sum(-1)

    for name, fn in [("g_alone", g_alone), ("g_sum", g_sum)]:
        print(f"######## {name} ########")
        txt = fn.lower(table, cc).compile().as_text()
        print(txt[:6000])


if __name__ == "__main__":
    main()
