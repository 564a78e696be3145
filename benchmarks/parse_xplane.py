"""Aggregate op self-times from an XPlane trace (TPU device plane)."""
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def main(path, top=40):
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        totals = defaultdict(float)
        counts = defaultdict(int)
        for line in plane.lines:
            lname = line.name
            if "step" in lname.lower():
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                totals[(lname, name)] += ev.duration_ps / 1e9  # ms
                counts[(lname, name)] += 1
        print(f"== plane: {plane.name}")
        rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
        for (lname, name), ms in rows:
            print(f"{ms:9.2f} ms x{counts[(lname, name)]:4d}  [{lname}] {name[:110]}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 40)
