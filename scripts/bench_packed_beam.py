"""Deep-catalog shootout: classic beam loop vs packed pair-table loop.

Device time comes from xplane traces (host wall-clock through the tunnel is
unreliable — see scripts/devtime.py).  Also checks result parity at depth.

Usage: python scripts/bench_packed_beam.py [--items 1000000] [--batch 4096]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from devtime import device_time_ms, top_ops


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--embed", type=int, default=16)
    ap.add_argument("--beam", type=int, default=20)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--ops", action="store_true", help="print top device ops")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dismember_tpu.index.arraytree import ArrayTree
    from dismember_tpu.index.tree_io import category_sorted_codes, write_tree
    from dismember_tpu.models import din
    from dismember_tpu.retrieval.packed_beam import (
        make_hybrid_beam_fn,
        make_packed_beam_fn,
        make_packed_tree,
        make_stride2_beam_fn,
        make_subtree_tree,
    )
    from dismember_tpu.retrieval.tree_beam import make_beam_fn

    ids = np.arange(1, args.items + 1)
    sorted_ids, codes = category_sorted_codes(ids, ids % 97)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "t.bin")
        write_tree(p, sorted_ids, codes)
        tree = ArrayTree.from_file(p)
    print(json.dumps({"items": args.items, "levels": tree.max_level}), flush=True)

    num_index = (1 << (tree.max_level + 1)) - 1
    params = din.init_params(jax.random.PRNGKey(0), num_index, args.embed)
    rng = np.random.default_rng(0)
    seq_codes = jnp.asarray(tree.ids_to_codes(
        rng.integers(1, args.items + 1, size=(args.batch, 10))
    ))

    classic = make_beam_fn(
        din.forward, tree, beam=args.beam,
        precompute=din.precompute_seq, apply=din.apply_with_ctx,
    )
    packed = make_packed_tree(tree, params["embedding"], beam=args.beam)
    packed_fn = make_packed_beam_fn(packed, din.precompute_seq, din.apply_from_emb)
    st = make_subtree_tree(tree, params["embedding"], beam=args.beam)
    stride_fn = make_stride2_beam_fn(st, din.precompute_seq, din.apply_from_emb)
    from dismember_tpu.retrieval.packed_beam import make_packed_beam_fn_pallas
    pallas_fn = make_packed_beam_fn_pallas(packed)
    hybrid_fns = {
        f"hybrid{cap}": make_hybrid_beam_fn(
            packed, din.precompute_seq, din.apply_from_emb,
            max_contract_rows=cap,
        )
        for cap in (256, 512, 1024, 4096)
    }

    # parity at depth
    ids_c, sc_c = jax.device_get(classic(params, seq_codes[:64]))
    for pname, pfn in [("packed", packed_fn), ("stride2", stride_fn),
                       ("pallas", pallas_fn),
                       ("hybrid512", hybrid_fns["hybrid512"])]:
        ids_p, sc_p = jax.device_get(pfn(params, seq_codes[:64]))
        # order-insensitive: compare id-sorted (id, score) pairs per row
        parity = True
        for i in range(len(ids_c)):
            ac, ap = ids_c[i] >= 0, ids_p[i] >= 0
            oc, op = np.argsort(ids_c[i][ac]), np.argsort(ids_p[i][ap])
            if not np.array_equal(ids_p[i][ap][op], ids_c[i][ac][oc]) or \
               not np.allclose(sc_p[i][ap][op], sc_c[i][ac][oc], rtol=1e-4):
                parity = False
                break
        print(json.dumps({f"parity_{pname}_64rows": parity}), flush=True)

    for name, fn in [("classic", classic), ("packed", packed_fn),
                     ("stride2", stride_fn), ("pallas", pallas_fn),
                     *hybrid_fns.items()]:
        ms = device_time_ms(lambda: fn(params, seq_codes), iters=args.iters)
        qps = args.batch / (ms / 1e3) if ms > 0 else 0.0
        print(json.dumps({"variant": name, "device_ms_per_batch": round(ms, 2),
                          "qps": round(qps)}), flush=True)
        if args.ops:
            for op, t in top_ops(lambda: fn(params, seq_codes), iters=args.iters):
                print(json.dumps({"op": op, "ms": t}), flush=True)


if __name__ == "__main__":
    main()
