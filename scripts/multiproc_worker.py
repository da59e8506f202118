"""Worker process for the multi-process SPMD harness.

Launched N times (once per simulated host) by tests/test_multiproc.py or
__graft_entry__.dryrun_multichip.  Each worker joins the jax.distributed
coordination service, exposes K virtual CPU devices, runs the sharded TDM
train step over the global mesh, and (process 0) writes losses + final
params to an npz for the launcher to compare against a single-process run.

Usage:
  python scripts/multiproc_worker.py --process-id I --num-processes N \
      --coordinator 127.0.0.1:PORT --local-devices K --steps S --out OUT.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--global-batch", type=int, default=16)
    ap.add_argument("--n-model", type=int, default=2)
    ap.add_argument("--mode", choices=["tdm", "deep"], default="tdm")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from dismember_tpu.train import multiproc

    multiproc.initialize(
        coordinator=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
        local_devices=args.local_devices,
    )
    import jax

    assert jax.process_count() == args.num_processes, jax.process_count()
    if args.mode == "deep":
        result = multiproc.run_deep_serving(
            n_model=args.n_model, global_batch_size=args.global_batch
        )
        if args.out and jax.process_index() == 0:
            import numpy as np

            np.savez(args.out, **result)
        print(
            f"multiproc deep worker {args.process_id}/{args.num_processes}: "
            f"{len(jax.devices())} global devices, "
            f"rerank_loss={result['dr_rerank_loss']:.4f}",
            flush=True,
        )
        return
    result = multiproc.run_tdm_steps(
        steps=args.steps,
        global_batch_size=args.global_batch,
        n_model=args.n_model,
    )
    if args.out and jax.process_index() == 0:
        import numpy as np

        flat = {
            "losses": np.asarray(result["losses"]),
            "beam_ids": result["beam_ids"],
            "beam_scores": result["beam_scores"],
        }
        leaves, _ = jax.tree_util.tree_flatten_with_path(result["params"])
        for path, leaf in leaves:
            flat["param:" + jax.tree_util.keystr(path)] = leaf
        np.savez(args.out, **flat)
    print(
        f"multiproc worker {args.process_id}/{args.num_processes}: "
        f"{len(jax.devices())} global devices, losses={result['losses']}",
        flush=True,
    )


if __name__ == "__main__":
    main()
