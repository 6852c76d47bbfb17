"""Device-time breakdown from a jax.profiler trace (xplane.pb).

Round 4's prefill speed-of-light study parsed the xplane in an ad-hoc /tmp
harness; this commits the tool. The installed tensorboard_plugin_profile
converter is broken against the image's TF/protobuf pairing, so this
decodes the protobuf wire format directly (the XSpace schema is stable:
planes > lines > events with interned metadata names).

Library use:
    from benchmarks.trace_breakdown import trace_and_breakdown
    rows = trace_and_breakdown(lambda: float(step()), steps=3)
    # rows: [(fusion_name, total_device_seconds), ...] descending

CLI: parse an existing trace directory:
    python benchmarks/trace_breakdown.py /tmp/trace_dir [group_regex]
"""

from __future__ import annotations

import collections
import glob
import gzip
import os
import re
import sys
import tempfile
from typing import Dict, Iterator, List, Tuple


# --- minimal protobuf wire decoder -----------------------------------------


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, bytes | int]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        fnum, wtype = tag >> 3, tag & 7
        if wtype == 0:  # varint
            val, i = _read_varint(buf, i)
        elif wtype == 1:  # 64-bit
            val, i = int.from_bytes(buf[i:i + 8], "little"), i + 8
        elif wtype == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            val, i = buf[i:i + ln], i + ln
        elif wtype == 5:  # 32-bit
            val, i = int.from_bytes(buf[i:i + 4], "little"), i + 4
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        yield fnum, wtype, val


# --- XSpace walking ---------------------------------------------------------


def _plane_breakdown(plane: bytes) -> Dict[str, Dict[str, float]]:
    """line name -> {event name -> total duration (s)} for one XPlane.

    TPU op traces nest: the "XLA Modules" line holds the program span, the
    next line the top-level ops (a scan's ``while`` spans its whole body),
    deeper lines the loop-body ops. Summing across lines double-counts, so
    callers pick the line at the altitude they care about.
    """
    meta: Dict[int, str] = {}
    lines: List[bytes] = []
    for fnum, _, val in _fields(plane):
        if fnum == 3:  # XLine
            lines.append(val)
        elif fnum == 4:  # event_metadata map entry
            mid, name = 0, ""
            for f2, _, v2 in _fields(val):
                if f2 == 1:
                    mid = v2
                elif f2 == 2:  # XEventMetadata
                    for f3, _, v3 in _fields(v2):
                        if f3 == 1:
                            mid = v3
                        elif f3 == 2:
                            name = v3.decode("utf-8", "replace")
            meta[mid] = name
    out: Dict[str, Dict[str, float]] = {}
    for li, line in enumerate(lines):
        lname = f"line{li}"
        totals: Dict[str, float] = collections.defaultdict(float)
        for fnum, _, val in _fields(line):
            if fnum == 2:
                lname = f"{val.decode('utf-8', 'replace')}#{li}"
            if fnum != 4:  # XEvent
                continue
            mid = dur_ps = 0
            for f2, wt, v2 in _fields(val):
                if f2 == 1:
                    mid = v2
                elif f2 == 3 and wt == 0:
                    dur_ps = v2
            totals[meta.get(mid, f"#{mid}")] += dur_ps * 1e-12
        if totals:
            out[lname] = dict(totals)
    return out


def _plane_name(plane: bytes) -> str:
    for fnum, _, val in _fields(plane):
        if fnum == 2:
            return val.decode("utf-8", "replace")
    return ""


def parse_trace_lines(log_dir: str) -> Dict[str, Dict[str, float]]:
    """Per-line event-duration maps from every device plane in a trace."""
    pbs = glob.glob(
        os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True
    ) + glob.glob(os.path.join(log_dir, "**", "*.xplane.pb.gz"), recursive=True)
    if not pbs:
        raise FileNotFoundError(f"no .xplane.pb under {log_dir}")
    out: Dict[str, Dict[str, float]] = {}
    for pb in pbs:
        raw = (
            gzip.open(pb, "rb").read() if pb.endswith(".gz")
            else open(pb, "rb").read()
        )
        for fnum, _, val in _fields(raw):
            if fnum != 1:
                continue
            name = _plane_name(val)
            # device planes: "/device:TPU:0" / "TPU:0"; skip host threads
            if "TPU" not in name and "device" not in name.lower():
                continue
            for line, totals in _plane_breakdown(val).items():
                dst = out.setdefault(line, collections.defaultdict(float))
                for k, v in totals.items():
                    dst[k] += v
    return out


def parse_trace_dir(log_dir: str) -> Dict[str, float]:
    """Leaf-op durations: the deepest (largest-total) op line — the loop
    body breakdown — merged with ops that only appear on shallower lines."""
    lines = parse_trace_lines(log_dir)
    # drop the module line (one giant program event)
    op_lines = {
        k: v for k, v in lines.items()
        if not any(e.startswith("jit_") for e in list(v)[:3])
    } or lines
    merged: Dict[str, float] = collections.defaultdict(float)
    seen = set()
    # deepest-first: later lines hold nested (leaf) ops
    for k in sorted(op_lines, key=lambda k: k.split("#")[-1], reverse=True):
        for name, v in op_lines[k].items():
            if name.startswith(("%while", "%body", "%cond")):
                continue  # parent span of a loop body already counted
            if name not in seen:
                merged[name] += v
                seen.add(name)
    return dict(merged)


def trace_and_breakdown(run, steps: int = 1) -> List[Tuple[str, float]]:
    """Trace ``run()`` (called ``steps`` times) and return per-fusion device
    seconds divided by ``steps``, descending."""
    import jax

    with tempfile.TemporaryDirectory() as d:
        jax.profiler.start_trace(d)
        for _ in range(steps):
            run()
        jax.profiler.stop_trace()
        totals = parse_trace_dir(d)
    rows = [(k, v / steps) for k, v in totals.items()]
    rows.sort(key=lambda kv: -kv[1])
    return rows


def print_grouped(rows, patterns: List[Tuple[str, str]], top: int = 25) -> None:
    """Print the top rows and a grouped summary by regex buckets."""
    total = sum(v for _, v in rows)
    print(f"total device time/step: {total * 1e3:.2f} ms")
    groups: Dict[str, float] = collections.defaultdict(float)
    for name, v in rows:
        for label, pat in patterns:
            if re.search(pat, name):
                groups[label] += v
                break
        else:
            groups["other"] += v
    for label, v in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"  {label:28s} {v * 1e3:8.2f} ms  {100 * v / total:5.1f}%")
    print("top fusions:")
    for name, v in rows[:top]:
        print(f"  {v * 1e3:8.3f} ms  {name[:110]}")


if __name__ == "__main__":
    rows = sorted(
        parse_trace_dir(sys.argv[1]).items(), key=lambda kv: -kv[1]
    )
    pat = sys.argv[2] if len(sys.argv) > 2 else None
    if pat:
        rows = [(k, v) for k, v in rows if re.search(pat, k)]
    print_grouped(rows, [])
