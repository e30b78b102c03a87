#!/usr/bin/env python
"""Minimal XSpace (.xplane.pb) reader — no tensorflow/tensorboard needed.

jax.profiler writes TensorFlow XSpace protos; this environment has no proto
parser for them, so this decodes the wire format directly (the schema is
tensorflow/core/profiler/protobuf/xplane.proto):

  XSpace:  planes=1 (XPlane)
  XPlane:  id=1 name=2 lines=3 event_metadata=4 (map<i64, XEventMetadata>)
  XLine:   id=1 name=2 timestamp_ns=3 events=4 display_name=11
  XEvent:  metadata_id=1 offset_ps=2 duration_ps=3 num_occurrences=5
  XEventMetadata: id=1 name=2 display_name=4

Usage: python dev/xplane_parse.py <trace.xplane.pb> [top_n]
Aggregates total duration per event name per plane/line — on a TPU device
plane the "XLA Ops" line gives per-fusion self times, which is the profile
the ablation sweeps approximate at 100x the cost.
"""

from __future__ import annotations

import collections
import sys


def _varint(buf: memoryview, i: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def fields(buf: memoryview):
    """Yield (field_number, wire_type, value_or_subbuf)."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            v, i = _varint(buf, i)
            yield fnum, wt, v
        elif wt == 2:  # length-delimited
            ln, i = _varint(buf, i)
            yield fnum, wt, buf[i : i + ln]
            i += ln
        elif wt == 5:  # 32-bit
            yield fnum, wt, bytes(buf[i : i + 4])
            i += 4
        elif wt == 1:  # 64-bit
            yield fnum, wt, bytes(buf[i : i + 8])
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")


def parse_plane(buf: memoryview):
    name = ""
    lines = []
    meta = {}
    for fnum, wt, v in fields(buf):
        if fnum == 2 and wt == 2:
            name = bytes(v).decode("utf-8", "replace")
        elif fnum == 3 and wt == 2:
            lines.append(v)
        elif fnum == 4 and wt == 2:  # map entry {key=1, value=2}
            mid, mname = None, ""
            for f2, w2, v2 in fields(v):
                if f2 == 1 and w2 == 0:
                    mid = v2
                elif f2 == 2 and w2 == 2:  # XEventMetadata
                    for f3, w3, v3 in fields(v2):
                        if f3 == 1 and w3 == 0 and mid is None:
                            mid = v3
                        elif f3 == 2 and w3 == 2:
                            mname = bytes(v3).decode("utf-8", "replace")
            if mid is not None:
                meta[mid] = mname
    out_lines = []
    for lbuf in lines:
        lname = ""
        events = []
        for fnum, wt, v in fields(lbuf):
            if fnum == 2 and wt == 2:
                lname = bytes(v).decode("utf-8", "replace")
            elif fnum == 11 and wt == 2 and not lname:
                lname = bytes(v).decode("utf-8", "replace")
            elif fnum == 4 and wt == 2:
                mid = dur = occ = 0
                for f2, w2, v2 in fields(v):
                    if f2 == 1 and w2 == 0:
                        mid = v2
                    elif f2 == 3 and w2 == 0:
                        dur = v2
                    elif f2 == 5 and w2 == 0:
                        occ = v2
                events.append((mid, dur, occ))
        out_lines.append((lname, events))
    return name, out_lines, meta


def summarize(path: str, top_n: int = 40):
    with open(path, "rb") as f:
        data = memoryview(f.read())
    for fnum, wt, v in fields(data):
        if fnum != 1 or wt != 2:
            continue
        pname, plines, meta = parse_plane(v)
        total_events = sum(len(e) for _, e in plines)
        if not total_events:
            continue
        print(f"\n=== plane: {pname!r} ({total_events} events) ===")
        for lname, events in plines:
            if not events:
                continue
            agg = collections.defaultdict(lambda: [0, 0])  # name -> [ps, n]
            for mid, dur, occ in events:
                a = agg[meta.get(mid, f"#{mid}")]
                a[0] += dur
                a[1] += max(occ, 1)
            tot = sum(a[0] for a in agg.values())
            print(f"-- line {lname!r}: {len(events)} events, "
                  f"{tot/1e9:.3f} ms total")
            rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_n]
            for name, (ps, n) in rows:
                if ps == 0:
                    continue
                print(f"  {ps/1e9:9.3f} ms  x{n:<5d} {name[:110]}")


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 40)
