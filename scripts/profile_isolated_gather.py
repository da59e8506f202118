"""Profile the isolated gather with wide fixed indices: true device time."""

import glob
import json
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
    def g(table, cc):
        return table[cc]

    jax.block_until_ready(g(table, cc))
    trace_dir = "/tmp/iso_gather_trace"
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(5):
            out = g(table, cc)
        jax.block_until_ready(out)

    xp = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))[-1]
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    xs = xplane_pb2.XSpace()
    with open(xp, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        durs = {}
        counts = {}
        for line in plane.lines:
            for ev in line.events:
                name = evmeta.get(ev.metadata_id, str(ev.metadata_id))
                durs[name] = durs.get(name, 0) + ev.duration_ps
                counts[name] = counts.get(name, 0) + 1
        print("== plane:", plane.name)
        for name, ps in sorted(durs.items(), key=lambda kv: -kv[1])[:10]:
            print(json.dumps({"op": name[:100], "us": round(ps / 1e6, 1),
                              "n": counts[name]}))


if __name__ == "__main__":
    main()
