"""Summarize a jax.profiler xplane trace without tensorboard.

This image's tensorboard_plugin_profile cannot convert xplane files (its
pywrap binding lacks xspace_to_tools_data), so this is a minimal wire-format
protobuf walker over the xplane schema
(tensorflow/tsl/profiler/protobuf/xplane.proto — field numbers hardcoded):

  XSpace.planes=1; XPlane{id=1,name=2,lines=3,event_metadata=4,stat_metadata=5}
  XLine{id=1,name=2,timestamp_ns=3,events=4}; XEvent{metadata_id=1,offset_ps=2,
  duration_ps=3,num_occurrences=5}; XEventMetadata{id=1,name=2,display_name=4}

Usage: python tools/profile_summary.py <trace_dir_or_xplane.pb> [top_n]
Prints per-plane op totals sorted by time — the tool for answering "where
do the milliseconds of a train step actually go" on this tunneled backend.
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict


def _varint(buf, i):
    x = shift = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << shift
        if not b & 0x80:
            return x, i
        shift += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over one message's wire data."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def parse_plane(buf):
    name = ""
    meta = {}
    lines = []
    for fn, wt, v in fields(buf):
        if fn == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 4 and wt == 2:  # event_metadata map entry
            mid, mname = None, ""
            for f2, w2, v2 in fields(v):
                if f2 == 1:
                    mid = v2
                elif f2 == 2 and w2 == 2:  # XEventMetadata
                    for f3, w3, v3 in fields(v2):
                        if f3 == 2 and w3 == 2:
                            mname = v3.decode("utf-8", "replace")
            if mid is not None:
                meta[mid] = mname
        elif fn == 3 and wt == 2:
            lines.append(v)
    return name, meta, lines


def parse_events(line_buf):
    for fn, wt, v in fields(line_buf):
        if fn == 4 and wt == 2:  # XEvent
            mid = dur = occ = 0
            for f2, w2, v2 in fields(v):
                if f2 == 1:
                    mid = v2
                elif f2 == 3:
                    dur = v2
                elif f2 == 5:
                    occ = v2
            yield mid, dur, max(occ, 1)


def line_name(line_buf):
    for fn, wt, v in fields(line_buf):
        if fn == 2 and wt == 2:
            return v.decode("utf-8", "replace")
    return ""


def summarize(path, top_n=30, per_line=False):
    if os.path.isdir(path):
        cands = glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                          recursive=True)
        if not cands:
            raise SystemExit(f"no *.xplane.pb under {path}")
        path = max(cands, key=os.path.getmtime)
    buf = open(path, "rb").read()
    print(f"# {path} ({len(buf)/1e6:.1f} MB)")
    for fn, wt, v in fields(buf):
        if fn != 1 or wt != 2:
            continue
        pname, meta, lines = parse_plane(v)
        if per_line:
            # async copies/DMAs live on their own queue lines and overlap
            # compute — per-line totals separate the critical compute queue
            # from overlapped background traffic
            for lb in lines:
                tot = defaultdict(int)
                cnt = defaultdict(int)
                for mid, dur, occ in parse_events(lb):
                    tot[mid] += dur
                    cnt[mid] += occ
                if not tot:
                    continue
                total_ms = sum(tot.values()) / 1e9
                print(f"\n-- plane {pname} / line '{line_name(lb)}' "
                      f"(total {total_ms:.2f} ms)")
                for mid, dur in sorted(tot.items(), key=lambda kv: -kv[1])[:top_n]:
                    print(f"  {dur/1e9:10.3f} ms  x{cnt[mid]:<6} "
                          f"{meta.get(mid, f'metadata_{mid}')[:110]}")
            continue
        tot = defaultdict(int)
        cnt = defaultdict(int)
        for lb in lines:
            for mid, dur, occ in parse_events(lb):
                tot[mid] += dur
                cnt[mid] += occ
        if not tot:
            continue
        total_ms = sum(tot.values()) / 1e9
        print(f"\n== plane: {pname}  (sum of event durations "
              f"{total_ms:.2f} ms; overlapping lines may double-count)")
        ranked = sorted(tot.items(), key=lambda kv: -kv[1])[:top_n]
        for mid, dur in ranked:
            name = meta.get(mid, f"metadata_{mid}")
            print(f"  {dur/1e9:10.3f} ms  x{cnt[mid]:<6} {name[:110]}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--lines"]
    summarize(args[0], int(args[1]) if len(args) > 1 else 30,
              per_line="--lines" in sys.argv)
