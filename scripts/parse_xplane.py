"""Parse a jax.profiler xplane.pb and print top device ops by total time.

Run under an interpreter that has tensorflow (for the xplane proto):
    /opt/venv/bin/python scripts/parse_xplane.py /tmp/trace/**/x.xplane.pb
"""

import json
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore


def main(path: str, top_n: int = 30) -> None:
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        total = 0
        durs = {}
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = evmeta.get(ev.metadata_id, str(ev.metadata_id))
                durs[name] = durs.get(name, 0) + ev.duration_ps
                total += ev.duration_ps
        if not durs:
            continue
        print(f"== plane: {plane.name}  (sum {total/1e9:.2f} us over lines)")
        for name, ps in sorted(durs.items(), key=lambda kv: -kv[1])[:top_n]:
            print(json.dumps({"op": name[:120], "us": round(ps / 1e6, 1)}))


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
