"""List the top device ops in an xplane trace, by total time.

Usage: python tools/xplane_toplist.py trace.xplane.pb [plane-substring]"""
import sys
from collections import defaultdict

from _xplane import xplane_pb2

xs = xplane_pb2.XSpace()
xs.ParseFromString(open(sys.argv[1], 'rb').read())
for plane in xs.planes:
    nevents = sum(len(l.events) for l in plane.lines)
    print(f"=== plane: {plane.name} lines={len(plane.lines)} events={nevents}")

want = sys.argv[2] if len(sys.argv) > 2 else 'TPU'
for plane in xs.planes:
    if want not in plane.name:
        continue
    emeta = plane.event_metadata
    smeta = plane.stat_metadata
    for line in plane.lines:
        totals = defaultdict(float); counts = defaultdict(int)
        for ev in line.events:
            md = emeta[ev.metadata_id]
            name = md.display_name or md.name
            totals[name] += ev.duration_ps / 1e9   # ms
            counts[name] += 1
        if not totals:
            continue
        tot = sum(totals.values())
        print(f"--- {plane.name} / line '{line.name}': total {tot:.2f} ms, {len(totals)} distinct")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:45]:
            print(f"  {ms:9.3f} ms x{counts[name]:4d}  {name[:150]}")
