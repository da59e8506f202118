"""Trace the slow dummy-body variant and dump per-op device times.

Writes a jax.profiler trace, then parses the xplane.pb with
tensorboard_plugin_profile to print the top device ops by self time.
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dismember_tpu.retrieval.tree_beam import onehot_select

    n_codes = 2_000_001
    b, beam, width = 4096, 20, 40
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (n_codes, 16), jnp.float32)
    meta = jax.random.normal(key, (n_codes, 2), jnp.float32)
    rng = np.random.default_rng(0)
    frontier = jnp.asarray(rng.integers(2**10, 2**11, size=(b, width)), jnp.int32)
    scores = jnp.asarray(rng.normal(size=(b, width)), jnp.float32)
    max_code = n_codes - 1

    @jax.jit
    def v0(frontier, scores, meta, table):
        top_scores, top_idx = jax.lax.top_k(scores, beam)
        top_codes = onehot_select(frontier, top_idx)
        top_alive = top_scores > -1e38
        ch = jnp.stack([2 * top_codes + 1, 2 * top_codes + 2], axis=-1)
        ch = ch.reshape(b, width)
        child_alive = jnp.repeat(top_alive, 2, axis=1)
        cc = jnp.clip(ch, 0, max_code)
        return ch, meta[cc], table[cc], child_alive

    out = v0(frontier, scores, meta, table)
    jax.block_until_ready(out)
    trace_dir = "/tmp/body_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            out = v0(frontier, scores, meta, table)
        jax.block_until_ready(out)

    xp = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))[-1]
    print("xplane:", xp)
    from tensorboard_plugin_profile.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xp, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        durs = {}
        for line in plane.lines:
            for ev in line.events:
                name = evmeta.get(ev.metadata_id, str(ev.metadata_id))
                durs[name] = durs.get(name, 0) + ev.duration_ps
        top = sorted(durs.items(), key=lambda kv: -kv[1])[:25]
        print("== plane:", plane.name)
        for name, ps in top:
            print(json.dumps({"op": name[:110], "us": round(ps / 1e6, 1)}))


if __name__ == "__main__":
    main()
