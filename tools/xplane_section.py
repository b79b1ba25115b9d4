"""Aggregate an xplane TPU trace into per-section step-time breakdown.

Usage: python tools/xplane_section.py [trace.xplane.pb] [section-name]
The xplane_pb2 module is generated from tools/xplane.proto (a minimal
transcription of the public tsl XSpace schema) on first use."""
import sys
import glob
from collections import defaultdict

from _xplane import xplane_pb2  # noqa: F401  (generated on import)

N_STEPS = 5

path = sys.argv[1] if len(sys.argv) > 1 else glob.glob(
    '/tmp/dsrl_trace/plugins/profile/*/*.xplane.pb')[0]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, 'rb').read())


def section_of(tf_op, source, name, category):
    t = tf_op or ''
    s = source or ''
    if 'pallas_call' in t or 'fused_tail' in s or 'pallas' in s:
        if 'losses/fa' in s or 'pallas_fa' in s:
            return 'fa-loss-kernel'
        return 'fused-tail-kernel'
    if '/backbone/' in t:
        if '/bn' in t or '/downsample.1/' in t:
            return 'backbone-bn'
        return 'backbone-conv'
    if '/aspp' in t:
        return 'aspp'
    if 'shortcut_conv' in t:
        return 'shortcut'
    if 'SSSR_decoder' in t:
        return 'sssr-decoder'
    if 'SISR_decoder' in t:
        return 'sisr-decoder'
    if 'feature_transformer' in t:
        return 'fa-transformers'
    if 'losses/fa' in s or '/fa.py' in s:
        return 'fa-loss'
    if 'losses/' in s:
        return 'losses-other'
    if 'jit(post)' in t or 'augment.py' in s:
        return 'augment-post'
    if 'optim.py' in s or 'sgd' in t:
        return 'optimizer'
    if 'conv.py' in s:
        return 'group-layout-ops'
    if 'norm.py' in s:
        return 'bn-other'
    if category == 'data formatting':
        return 'unattributed-copies'
    if 'threefry' in t or 'random' in t or 'rng' in t:
        return 'rng'
    return 'other'


for plane in xs.planes:
    if 'TPU:0' not in plane.name:
        continue
    smeta = plane.stat_metadata

    def stats_of(md):
        out = {}
        for st in md.stats:
            nm = smeta[st.metadata_id].name
            out[nm] = st.str_value or st.int64_value or st.double_value or (
                smeta[st.ref_value].name if st.ref_value else '')
        return out

    for line in plane.lines:
        if line.name != 'XLA Ops':
            continue
        sec_ms = defaultdict(float)
        sec_flops = defaultdict(float)
        sec_bytes = defaultdict(float)
        cat_ms = defaultdict(float)
        top_by_sec = defaultdict(list)
        for ev in line.events:
            md = plane.event_metadata[ev.metadata_id]
            s = stats_of(md)
            ms = ev.duration_ps / 1e9 / N_STEPS
            sec = section_of(s.get('tf_op'), s.get('source'),
                             md.display_name or md.name, s.get('hlo_category'))
            sec_ms[sec] += ms
            cat_ms[s.get('hlo_category', '?')] += ms
            try:
                sec_flops[sec] += float(s.get('flops') or 0) / N_STEPS
            except (TypeError, ValueError):
                pass
            try:
                sec_bytes[sec] += float(s.get('bytes_accessed') or 0) / N_STEPS
            except (TypeError, ValueError):
                pass
            top_by_sec[sec].append((ms, md.display_name or md.name,
                                    (s.get('tf_op') or '')[:110]))
        total = sum(sec_ms.values())
        print(f"TOTAL device busy: {total:.2f} ms/step")
        print(f"{'section':22s} {'ms':>8s} {'%':>6s} {'TFLOP/s':>8s} {'GB/s':>8s}")
        for sec, ms in sorted(sec_ms.items(), key=lambda kv: -kv[1]):
            tf = sec_flops[sec] / (ms / 1e3) / 1e12 if ms else 0
            gb = sec_bytes[sec] / (ms / 1e3) / 1e9 if ms else 0
            print(f"{sec:22s} {ms:8.2f} {100*ms/total:6.1f} {tf:8.1f} {gb:8.0f}")
        print("\nby hlo_category:")
        for cat, ms in sorted(cat_ms.items(), key=lambda kv: -kv[1])[:12]:
            print(f"  {cat:30s} {ms:8.2f} ms")
        if len(sys.argv) > 2:
            want = sys.argv[2]
            print(f"\ntop ops in '{want}':")
            for ms, name, t in sorted(top_by_sec[want], reverse=True)[:25]:
                print(f"  {ms:7.3f} ms  {name:40s} {t}")
