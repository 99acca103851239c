"""Unit test for tools/xprof_summary.py — the `pano.sh perf` report stage
(the analog of the reference's `perf report --stdio`,
/root/reference/pano.sh:231-235).

Builds a tiny synthetic XSpace proto and checks the per-line busy-time
computation (union of possibly-nested event intervals) and per-op
aggregation.
"""

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

import xplane_pb2  # noqa: E402
import xprof_summary  # noqa: E402


def _space():
    xs = xplane_pb2.XSpace()
    plane = xs.planes.add()
    plane.name = "/device:TPU:0"
    plane.event_metadata[1].id = 1
    plane.event_metadata[1].name = "fusion.1"
    plane.event_metadata[2].id = 2
    plane.event_metadata[2].name = "custom-call.7"
    line = plane.lines.add()
    line.name = "XLA Ops"
    # Three events: [0, 10ms], nested [2, 5ms], disjoint [20, 25ms]
    # -> busy union = 10 + 5 = 15 ms; fusion.1 total = 13 ms (x2).
    for md, off_ms, dur_ms in ((1, 0, 10), (1, 2, 3), (2, 20, 5)):
        ev = line.events.add()
        ev.metadata_id = md
        ev.offset_ps = int(off_ms * 1e9)
        ev.duration_ps = int(dur_ms * 1e9)
    # A host plane that must be skipped.
    host = xs.planes.add()
    host.name = "/host:CPU"
    return xs


def test_busy_union_and_aggregation():
    out = io.StringIO()
    with redirect_stdout(out):
        xprof_summary.summarize(_space(), top=10)
    text = out.getvalue()
    assert "/device:TPU:0" in text
    assert "/host:CPU" not in text
    assert "busy=15.000 ms" in text
    assert "fusion.1" in text and "x2" in text
    assert "custom-call.7" in text and "x1" in text


def test_find_pb(tmp_path):
    d = tmp_path / "trace" / "plugins"
    d.mkdir(parents=True)
    p = d / "host.xplane.pb"
    p.write_bytes(_space().SerializeToString())
    assert xprof_summary.find_pb(str(tmp_path)) == str(p)
    loaded = xprof_summary.load(str(p))
    assert loaded.planes[0].name == "/device:TPU:0"
