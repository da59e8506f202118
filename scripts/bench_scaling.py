"""Data-parallel scaling harness: train-step throughput at 1..N devices.

On a real multi-chip slice this measures the north-star scaling efficiency
(per-device batch held constant, ≥80% target); on a single-chip/dev machine
run it on the virtual CPU mesh to validate the sharded program:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py --cpu

The measured quantity is expanded sample rows/s of the full TDM train step
(sampling + grouped DIN forward/backward + Adam) with the batch sharded over
'data' and the node table row-sharded over 'model' when n_model > 1.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--items", type=int, default=100_000)
    parser.add_argument("--per-device-targets", type=int, default=64)
    parser.add_argument("--n-model", type=int, default=1)
    parser.add_argument("--steps", type=int, default=20)
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from dismember_tpu.core import mesh as meshlib
    from dismember_tpu.index.arraytree import ArrayTree
    from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
    from dismember_tpu.models import din
    from dismember_tpu.train.sampler import TreeSampler
    from dismember_tpu.train.spmd import make_sharded_train_step, padded_num_index

    n_dev_total = len(jax.devices())
    ids = np.arange(1, args.items + 1)
    sid, codes = category_sorted_codes(ids, np.zeros(args.items, np.int64))
    tree_path = "/tmp/_scaling_tree.bin"
    write_tree(tree_path, sid, codes)
    tree = ArrayTree.from_file(tree_path)
    neg = ",".join(str(min(i, 2**i - 1, 25)) for i in range(tree.max_level + 1))
    rng = np.random.default_rng(0)

    results = []
    n = 1
    while n <= n_dev_total:
        n_model = args.n_model if n % args.n_model == 0 and n >= args.n_model else 1
        mesh = meshlib.make_mesh(
            n_data=n // n_model, n_model=n_model, devices=jax.devices()[:n]
        )
        sampler = TreeSampler.build(tree, neg, start_level=1)
        num_index = padded_num_index((1 << (tree.max_level + 1)) - 1, mesh)
        params = din.init_params(jax.random.PRNGKey(0), num_index, 32)
        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(params)
        step, params, opt_state = make_sharded_train_step(
            din.forward, sampler, optimizer, mesh, params, opt_state
        )
        b = args.per_device_targets * (n // n_model)
        tc = jnp.asarray(rng.choice(tree.item_codes, b).astype(np.int32))
        sc = jnp.asarray(tree.ids_to_codes(rng.integers(1, args.items, (b, 10))))
        key = jax.random.PRNGKey(1)
        params, opt_state, loss = step(params, opt_state, key, tc, sc)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for i in range(args.steps):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, sub, tc, sc)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.steps
        rows_s = b * sampler.unit / dt
        results.append({"devices": n, "rows_per_s": rows_s})
        base = results[0]["rows_per_s"]
        eff = rows_s / (base * n)
        print(
            json.dumps(
                {
                    "devices": n,
                    "mesh": f"{n // n_model}x{n_model}",
                    "expanded_rows_per_s": round(rows_s),
                    "scaling_efficiency": round(eff, 3),
                }
            ),
            flush=True,
        )
        n *= 2
    os.remove(tree_path)


if __name__ == "__main__":
    main()
