"""Device-time measurement via xplane traces — the only trustworthy timing
through the device tunnel (host wall-clock is unreliable: async dispatch and
the relay hide device time; blocked calls pay ~30ms RTT).

Usage:
    from devtime import device_time_ms
    ms = device_time_ms(lambda: fn(*args), iters=5)   # total jit time / iters
"""

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_trace(trace_dir: str) -> dict[str, float]:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    xp = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    with open(xp, "rb") as f:
        xs.ParseFromString(f.read())
    durs: dict[str, float] = {}
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = evmeta.get(ev.metadata_id, str(ev.metadata_id))
                durs[name] = durs.get(name, 0.0) + ev.duration_ps / 1e9
    return durs  # name -> total ms


def profile_ops(thunk, iters: int = 5) -> dict[str, float]:
    """Run thunk() iters times under a trace; per-op total device ms."""
    import jax

    jax.block_until_ready(thunk())  # compile outside the trace
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            out = None
            for _ in range(iters):
                out = thunk()
            jax.block_until_ready(out)
        return _parse_trace(td)


def device_time_ms(thunk, iters: int = 5, match: str = "jit_") -> float:
    """Total device time of ops whose name contains ``match``, / iters."""
    durs = profile_ops(thunk, iters)
    tot = sum(ms for name, ms in durs.items() if match in name)
    return tot / iters


def top_ops(thunk, iters: int = 5, n: int = 12) -> list[tuple[str, float]]:
    durs = profile_ops(thunk, iters)
    return sorted(((k[:110], round(v / iters, 3)) for k, v in durs.items()),
                  key=lambda kv: -kv[1])[:n]
