#!/usr/bin/env python
"""Aggregate device op durations from a jax.profiler xplane trace.

Usage: python tools/parse_xplane.py /tmp/trace_dir [top_n]

Sums event durations per HLO op name on the TPU device plane(s) and prints
the top offenders plus per-category totals.  This is the trustworthy way to
attribute time on this machine — host-side timers under-report through the
axon tunnel (see PERF.md).
"""

import collections
import glob
import sys


def load_xspace(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(f"{path}/**/*.xplane.pb", recursive=True))
    if not files:
        raise SystemExit(f"no .xplane.pb under {path}")
    space = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        space.ParseFromString(f.read())
    return space


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiled_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    space = load_xspace(path)

    by_name = collections.Counter()          # ps
    by_category = collections.Counter()      # ps
    total_ps = 0
    steps = 0
    for plane in space.planes:
        if "TPU" not in plane.name and "device:" not in plane.name.lower():
            continue
        meta = {m_id: m for m_id, m in plane.event_metadata.items()}
        stat_meta = {m_id: m.name for m_id, m in plane.stat_metadata.items()}
        for line in plane.lines:
            if line.name in ("Steps",):
                continue
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                name = m.name if m else f"id{ev.metadata_id}"
                dur = ev.duration_ps
                cat = None
                for st in list(ev.stats) + (list(m.stats) if m else []):
                    if stat_meta.get(st.metadata_id) == "hlo_category":
                        cat = st.str_value or st.ref_value
                if "XLA Modules" in line.name:
                    total_ps += dur
                    steps += 1
                    continue
                if "XLA Ops" not in line.name:
                    continue
                by_name[name] += dur
                if cat is not None:
                    by_category[str(cat)] += dur

    def ms(ps):
        return ps / 1e9

    print(f"== module total: {ms(total_ps):.1f} ms over {steps} executions")
    print("== by category ==")
    for cat, ps in by_category.most_common():
        print(f"  {ms(ps):9.2f} ms  {cat}")
    print(f"== top {top_n} ops ==")
    for name, ps in by_name.most_common(top_n):
        print(f"  {ms(ps):9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
