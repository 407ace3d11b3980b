"""Minimal XSpace/XPlane protobuf reader (no tensorflow dependency).

`jax.profiler.trace` writes `*.xplane.pb` files — serialized
`tensorflow.profiler.XSpace` protos. TensorFlow (the usual reader) is
not in this image, so this module decodes the generic protobuf wire
format directly against the XPlane schema
(tensorflow/core/profiler/protobuf/xplane.proto), which is stable and
tiny:

    XSpace    { repeated XPlane planes = 1; }
    XPlane    { int64 id = 1; string name = 2; repeated XLine lines = 3;
                map<int64, XEventMetadata> event_metadata = 4;
                map<int64, XStatMetadata>  stat_metadata  = 5; }
    XLine     { int64 id = 1; string name = 2; int64 timestamp_ns = 3;
                repeated XEvent events = 4; int64 duration_ps = 9;
                int64 display_id = 10; string display_name = 11; }
    XEvent    { int64 metadata_id = 1; int64 offset_ps = 2;
                int64 duration_ps = 3; repeated XStat stats = 4;
                int64 num_occurrences = 5; }
    XEventMetadata { int64 id = 1; string name = 2; bytes metadata = 3;
                display_name = 4; stats = 5; child_id = 6; }
    XStat     { int64 metadata_id = 1; double double_value = 2;
                uint64 uint64_value = 3; int64 int64_value = 4;
                string str_value = 5; bytes bytes_value = 6;
                uint64 ref_value = 7; }
    XStatMetadata { int64 id = 1; string name = 2; }

Only what the profile summarizer needs is materialized: plane names,
line names, events (name, duration, stats).
"""

from __future__ import annotations

import struct
from typing import Iterator


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[tuple[int, int, bytes | int]]:
    """Yields (field_number, wire_type, value) for one message."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:  # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        else:  # groups (3/4) never appear in xplane
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _zigzag_ok_int64(v: int) -> int:
    # xplane int64s are plain (not zigzag); fold negatives from two's complement
    return v - (1 << 64) if v >= (1 << 63) else v


class Event:
    __slots__ = ("name", "offset_ps", "duration_ps", "occurrences", "stats")

    def __init__(self, name, offset_ps, duration_ps, occurrences, stats):
        self.name = name
        self.offset_ps = offset_ps
        self.duration_ps = duration_ps
        self.occurrences = occurrences
        self.stats = stats  # dict name -> value


class Line:
    __slots__ = ("name", "events")

    def __init__(self, name, events):
        self.name = name
        self.events = events


class Plane:
    __slots__ = ("name", "lines")

    def __init__(self, name, lines):
        self.name = name
        self.lines = lines


def _parse_stat(buf: bytes, stat_meta: dict[int, str]):
    mid = 0
    val = None
    for f, w, v in _fields(buf):
        if f == 1:
            mid = v
        elif f == 2:
            val = struct.unpack("<d", v)[0]
        elif f == 3:
            val = v
        elif f == 4:
            val = _zigzag_ok_int64(v)
        elif f == 5:
            val = v.decode("utf-8", "replace")
        elif f == 6:
            val = v
        elif f == 7:
            val = v
    return stat_meta.get(mid, str(mid)), val


def _parse_event(buf: bytes, event_meta, stat_meta) -> Event:
    mid = 0
    off = 0
    dur = 0
    occ = 1
    stats = {}
    for f, w, v in _fields(buf):
        if f == 1:
            mid = v
        elif f == 2:
            off = _zigzag_ok_int64(v)
        elif f == 3:
            dur = v
        elif f == 4:
            k, sv = _parse_stat(v, stat_meta)
            stats[k] = sv
        elif f == 5:
            occ = v
    return Event(event_meta.get(mid, str(mid)), off, dur, occ, stats)


def _parse_line(buf: bytes, event_meta, stat_meta) -> Line:
    name = ""
    events = []
    for f, w, v in _fields(buf):
        if f == 2:
            name = v.decode("utf-8", "replace")
        elif f == 11 and not name:
            name = v.decode("utf-8", "replace")
        elif f == 4:
            events.append(_parse_event(v, event_meta, stat_meta))
    return Line(name, events)


def _parse_named_meta(buf: bytes) -> tuple[int, str]:
    """map entry -> (key, value.name); works for both metadata maps."""
    key = 0
    name = ""
    for f, w, v in _fields(buf):
        if f == 1:
            key = v
        elif f == 2:
            for f2, w2, v2 in _fields(v):
                if f2 == 2:
                    name = v2.decode("utf-8", "replace")
    return key, name


def _parse_plane(buf: bytes) -> Plane:
    name = ""
    line_bufs = []
    event_meta: dict[int, str] = {}
    stat_meta: dict[int, str] = {}
    for f, w, v in _fields(buf):
        if f == 2:
            name = v.decode("utf-8", "replace")
        elif f == 3:
            line_bufs.append(v)
        elif f == 4:
            k, nm = _parse_named_meta(v)
            event_meta[k] = nm
        elif f == 5:
            k, nm = _parse_named_meta(v)
            stat_meta[k] = nm
    lines = [_parse_line(lb, event_meta, stat_meta) for lb in line_bufs]
    return Plane(name, lines)


def parse_xspace(path: str) -> list[Plane]:
    with open(path, "rb") as f:
        buf = f.read()
    planes = []
    for f_, w, v in _fields(buf):
        if f_ == 1:
            planes.append(_parse_plane(v))
    return planes


def op_totals(planes: list[Plane], plane_filter: str = "TPU",
              line_filter: str | None = None,
              exact_line: str | None = None) -> dict[str, dict]:
    """Aggregate event durations (ms) by op name over matching planes.

    Caveat: async ops (slice-start / copy-start) report their whole
    outstanding window as `duration`, which OVERLAPS compute on other
    lines — summing across all lines double-counts. Pass `line_filter`
    (substring of the line name, e.g. "XLA Ops") or use `line_busy` for
    overlap-aware accounting.
    """
    totals: dict[str, dict] = {}
    for p in planes:
        if plane_filter.lower() not in p.name.lower():
            continue
        for ln in p.lines:
            if line_filter is not None and line_filter.lower() not in ln.name.lower():
                continue
            # "XLA Ops" substring-matches "Async XLA Ops" too — use
            # exact_line to take ONE hardware queue (async windows on
            # the other line overlap it and would double-count)
            if exact_line is not None and ln.name != exact_line:
                continue
            for ev in ln.events:
                rec = totals.setdefault(
                    ev.name, {"ms": 0.0, "count": 0, "line": ln.name})
                rec["ms"] += ev.duration_ps / 1e9
                rec["count"] += ev.occurrences
    return totals


def _union_ms(intervals: list[tuple[int, int]]) -> float:
    """Total length (ms) of the union of [start, end) ps intervals."""
    if not intervals:
        return 0.0
    intervals.sort()
    total = 0
    cur_s, cur_e = intervals[0]
    for s, e in intervals[1:]:
        if s > cur_e:
            total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    total += cur_e - cur_s
    return total / 1e9


def line_busy(planes: list[Plane], plane_filter: str = "TPU") -> dict[str, dict]:
    """Per trace line: interval-union busy time (ms), span, event count.

    Events on one line never overlap visually but async windows can;
    the union is the honest serial occupancy of that hardware queue.
    The device's true busy time is the union over its compute lines
    ("XLA Ops" / "XLA Modules"); DMA lines overlap them.
    """
    out: dict[str, dict] = {}
    for p in planes:
        if plane_filter.lower() not in p.name.lower():
            continue
        for ln in p.lines:
            ivs = [(ev.offset_ps, ev.offset_ps + ev.duration_ps)
                   for ev in ln.events]
            if not ivs:
                continue
            key = f"{p.name}::{ln.name}"
            span = (max(e for _, e in ivs) - min(s for s, _ in ivs)) / 1e9
            out[key] = {
                "busy_ms": _union_ms(ivs),
                "span_ms": span,
                "events": len(ivs),
            }
    return out
