#!/usr/bin/env python3
"""Summarize a JAX profiler xplane dump: per-op device time, top-N table.

The reference profiles with `perf record` + flamegraphs
(/root/reference/pano.sh:215-244); the TPU analog is the JAX profiler's
xplane trace (`pano.sh perf` / PANO_TPU_PROFILE=<dir>). TensorBoard's
profile plugin can't load in this environment (protobuf codegen mismatch),
so this standalone tool parses the XSpace proto directly via a minimal
schema mirror (tools/xplane.proto, compiled to xplane_pb2.py by protoc).

Usage:
  python tools/xprof_summary.py <trace_dir_or_xplane.pb> [--top 30] [--by-line]

Aggregates event durations on every device plane (/device:TPU:*), grouped by
event name, and prints total device-busy time per line (XLA modules overlap
fusions on the same line, so per-line busy time is the honest total).
"""

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

try:
    import xplane_pb2  # generated: protoc --python_out=tools tools/xplane.proto
except ImportError:  # pragma: no cover
    sys.exit(
        "xplane_pb2 missing - run: protoc --python_out=tools -Itools "
        "tools/xplane.proto"
    )


def find_pb(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True)
    )
    if not hits:
        sys.exit(f"no *.xplane.pb under {path}")
    return hits[-1]  # most recent dump


def load(path: str) -> "xplane_pb2.XSpace":
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def _busy_union_ps(spans) -> int:
    """Union length of (start_ps, end_ps) intervals — events on one XLA
    line can nest (module > fusion), so a plain sum double-counts."""
    spans = sorted(spans)
    busy = 0
    cur_s, cur_e = None, None
    for s, e in spans:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        busy += cur_e - cur_s
    return busy


def device_busy_ms(xs) -> float:
    """Total device-busy wall time (ms) across device planes.

    Per plane the busy time is the MAX over lines (a TPU plane carries
    parallel lines — e.g. 'XLA Modules' and the per-op 'XLA Ops' — that
    describe the SAME execution at different granularity; summing them
    would double-count). Used by bench.py to report a tunnel-independent
    compute metric next to the wall-clock headline."""
    total = 0.0
    for plane in xs.planes:
        name = plane.name.lower()
        if "device:" not in name and "tpu" not in name:
            continue
        best = 0
        for line in plane.lines:
            if not line.events:
                continue
            spans = [
                (ev.offset_ps, ev.offset_ps + ev.duration_ps)
                for ev in line.events
            ]
            best = max(best, _busy_union_ps(spans))
        total += best / 1e9
    return total


def summarize(xs, top: int = 30, by_line: bool = False) -> None:
    planes = [
        p
        for p in xs.planes
        if "device:" in p.name.lower() or "tpu" in p.name.lower()
    ]
    if not planes:
        # CPU-backend traces carry no device plane; fall back to the host
        # plane so `pano.sh perf` still yields a per-op table (the host
        # TraceMe lines hold the XLA:CPU executable timings).
        planes = [p for p in xs.planes if any(l.events for l in p.lines)]
        if planes:
            print("(no device plane in trace; summarizing host planes)")
    for plane in planes:
        print(f"\n=== plane: {plane.name} ===")
        meta = plane.event_metadata
        for line in plane.lines:
            if not line.events:
                continue
            by_name = collections.Counter()
            counts = collections.Counter()
            # Busy time = union of event intervals (events on one XLA line
            # can nest: module > fusion). Take only top-level spans for the
            # busy total; per-name sums still count every event.
            spans = []
            for ev in line.events:
                name = meta[ev.metadata_id].name if ev.metadata_id in meta else str(ev.metadata_id)
                dur_ms = ev.duration_ps / 1e9
                by_name[name] += dur_ms
                counts[name] += 1
                spans.append((ev.offset_ps, ev.offset_ps + ev.duration_ps))
            busy = _busy_union_ps(spans)
            label = line.display_name or line.name
            print(
                f"\n-- line: {label}  events={len(line.events)}  "
                f"busy={busy / 1e9:.3f} ms"
            )
            if by_line:
                continue
            width = max((len(n) for n, _ in by_name.most_common(top)), default=4)
            for name, ms in by_name.most_common(top):
                print(f"  {name:<{width}}  {ms:9.3f} ms  x{counts[name]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="trace dir or .xplane.pb file")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--by-line", action="store_true",
                    help="only per-line busy totals")
    args = ap.parse_args()
    pb = find_pb(args.path)
    print(f"reading {pb}")
    summarize(load(pb), args.top, args.by_line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
