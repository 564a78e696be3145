"""Aggregate XPlane device op self-times by op family.

Groups `%name.123 = type[shape] op(...)` events by (family, shape) where
family strips the SSA counter, so 40 resnet conv fusions collapse into
one row. Only "XLA Ops" lines count (real device execution; async lines
overlap and double-count).
"""
import re
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def family(name: str) -> str:
    head = name.split(" = ", 1)
    label = re.sub(r"\.\d+$", "", head[0].lstrip("%"))
    shape = ""
    if len(head) > 1:
        m = re.match(r"\s*\(?([a-z0-9]+\[[0-9,]*\])", head[1])
        if m:
            shape = m.group(1)
    return f"{label} {shape}"


def main(path, top=35):
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        totals = defaultdict(float)
        counts = defaultdict(int)
        module_ms = 0.0
        for line in plane.lines:
            if line.name == "XLA Modules":
                for ev in line.events:
                    module_ms += ev.duration_ps / 1e9
                continue
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                f = family(ev_meta[ev.metadata_id].name)
                totals[f] += ev.duration_ps / 1e9
                counts[f] += 1
        print(f"== plane: {plane.name}  modules total {module_ms:.1f} ms")
        acc = 0.0
        for f, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
            acc += ms
            print(f"{ms:9.2f} ms x{counts[f]:5d}  {f[:100]}")
        rest = sum(totals.values()) - acc
        print(f"{rest:9.2f} ms        (everything else)")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 35)
