"""Minimal dependency-free XSpace (xplane.pb) parser.

jax.profiler.trace writes two artifacts: a perfetto trace.json.gz (which on
some backends carries only module-level device events) and an xplane.pb with
full per-op lines.  TensorFlow isn't in this image, so this module decodes
the protobuf wire format directly against the stable XSpace schema
(tensorflow/compiler/xla/tsl/profiler/protobuf/xplane.proto):

  XSpace.planes[]       -> XPlane{id=1, name=2, lines=3, event_metadata=4,
                                  stat_metadata=5}
  XPlane.lines[]        -> XLine{id=1, name=3, events=7? (see note)}
  XLine.events[]        -> XEvent{metadata_id=1, offset_ps=2|7, duration_ps=3,
                                  stats=4}
  XEventMetadata        -> {id=1, name=2, display_name=3}
  XStat                 -> {metadata_id=1, double=2, uint64=3, int64=4, str=5}

Field numbers for XLine differ across TF versions; we detect the events
field as "the repeated length-delimited field whose submessages look like
XEvent" instead of hardcoding it.
"""

from __future__ import annotations

import gzip
import struct
from collections import defaultdict
from typing import Dict, Iterator, List, Tuple


def _varint(buf: memoryview, i: int) -> Tuple[int, int]:
    res = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        res |= (b & 0x7F) << shift
        if not b & 0x80:
            return res, i
        shift += 7


def fields(buf: memoryview) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = struct.unpack_from("<q", buf, i)[0]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack_from("<i", buf, i)[0]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fn, wt, v


def _parse_event(buf: memoryview) -> Tuple[int, int]:
    """XEvent -> (metadata_id, duration_ps)."""
    mid = dur = 0
    for fn, wt, v in fields(buf):
        if fn == 1 and wt == 0:
            mid = v
        elif fn == 3 and wt == 0:
            dur = v
    return mid, dur


def _looks_like_events(v: memoryview) -> bool:
    try:
        mid, dur = _parse_event(v)
        return mid > 0
    except Exception:
        return False


def _parse_metadata_entry(buf: memoryview) -> Tuple[int, str]:
    """map<int64, XEventMetadata> entry -> (id, name)."""
    key = 0
    name = ""
    for fn, wt, v in fields(buf):
        if fn == 1 and wt == 0:
            key = v
        elif fn == 2 and wt == 2:  # XEventMetadata
            for f2, w2, v2 in fields(v):
                if f2 == 2 and w2 == 2:
                    name = bytes(v2).decode("utf-8", "replace")
    return key, name


def parse_xplane(path: str):
    """Returns [(plane_name, [(line_name, [(event_name, dur_ps), ...])])]."""
    raw = open(path, "rb").read()
    if path.endswith(".gz"):
        raw = gzip.decompress(raw)
    out = []
    for fn, wt, plane_buf in fields(memoryview(raw)):
        if fn != 1 or wt != 2:
            continue
        plane_name = ""
        line_bufs: List[memoryview] = []
        meta: Dict[int, str] = {}
        for f2, w2, v2 in fields(plane_buf):
            if f2 == 2 and w2 == 2:
                plane_name = bytes(v2).decode("utf-8", "replace")
            elif f2 == 3 and w2 == 2:
                line_bufs.append(v2)
            elif f2 == 4 and w2 == 2:
                k, nm = _parse_metadata_entry(v2)
                meta[k] = nm
        lines = []
        for lb in line_bufs:
            # XLine: id=1, timestamp_ns=3, events=4, duration_ps=9,
            # display_id=10, name=11, display_name=12
            line_name = ""
            events = []
            for f3, w3, v3 in fields(lb):
                if f3 in (11, 12) and w3 == 2 and not line_name:
                    line_name = bytes(v3).decode("utf-8", "replace")
                elif f3 == 4 and w3 == 2:
                    mid, dur = _parse_event(v3)
                    events.append((meta.get(mid, str(mid)), dur))
            lines.append((line_name, events))
        out.append((plane_name, lines))
    return out


def device_op_totals(path: str) -> Dict[str, Tuple[float, int]]:
    """Aggregate TPU-plane per-op time: {op_name: (total_ms, count)}."""
    agg: Dict[str, List[float]] = defaultdict(lambda: [0.0, 0])
    for plane_name, lines in parse_xplane(path):
        if "TPU" not in plane_name and "device" not in plane_name.lower():
            continue
        for line_name, events in lines:
            if "Steps" in line_name or "module" in line_name.lower():
                continue
            for name, dur_ps in events:
                agg[name][0] += dur_ps / 1e9  # ps -> ms
                agg[name][1] += 1
    return {k: (v[0], v[1]) for k, v in agg.items()}


if __name__ == "__main__":
    import sys

    path = sys.argv[1]
    planes = parse_xplane(path)
    print("planes:")
    for pn, lines in planes:
        total_events = sum(len(e) for _, e in lines)
        print(f"  {pn!r}: {len(lines)} lines, {total_events} events")
        for ln, evs in lines[:12]:
            print(f"      line {ln!r}: {len(evs)} events")
    totals = device_op_totals(path)
    rows = sorted(totals.items(), key=lambda kv: -kv[1][0])[:40]
    gt = sum(v[0] for v in totals.values())
    print(f"\nTPU per-op total: {gt:.1f} ms")
    for name, (ms, cnt) in rows:
        print(f"{ms:9.2f} ms {100*ms/max(gt,1e-9):5.1f}% x{cnt:<6} {name[:100]}")
