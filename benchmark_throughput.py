#!/usr/bin/env python3
"""Pipelined serving-throughput benchmark: pairs/s at a bounded in-flight
window, the deployment analog of bench.py's single-pair latency number.

The reference has no serving story — each of its binaries processes one
image list per process (/root/reference/src/serial/main.cpp:430-451). For a
TPU service the relevant number is throughput with dispatch/fetch overlap:
the host keeps DEPTH pairs' fused stitch graphs in flight and fetches the
oldest pair's packed result while the device works on the newer dispatches,
so the 30-85 ms tunnel RTT (CLAUDE.md) is paid once per DEPTH pairs of
useful work instead of once per pair. The per-pair device compute
(~10.4 ms, BASELINE.md) becomes the rate limiter as DEPTH grows.

The loop runs the SAME device graphs as PairStitcher.stitch_pair_fast's
common path (fused estimate + tier-0 fused compose, one packed fetch + the
crop); pairs that would need the tier/staged fallback ladder are counted
and excluded from the claimed rate (none occur on the bench pair).

Usage: python benchmark_throughput.py [--pairs N] [--depth D]
Prints one JSON line: {"metric": "mountain_4k_throughput_pairs_per_s", ...}
"""

import argparse
import json
import os
import sys
import time
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

MOUNTAIN = [
    "/root/reference/images/mountain/mountain1.jpg",
    "/root/reference/images/mountain/mountain2.jpg",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=30)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("images", nargs="*", default=MOUNTAIN)
    args = ap.parse_args()
    if len(args.images) != 2:
        ap.error(f"expected exactly 2 image paths, got {len(args.images)}")

    import jax.numpy as jnp

    from pano_tpu.config import DEFAULT_CONFIG
    from pano_tpu.io import imread_bgr
    from pano_tpu.pipeline import PairStitcher, _host_fetch, fast_path_crop
    from pano_tpu.timer import force_sync

    left = jnp.asarray(imread_bgr(args.images[0]), jnp.uint8)
    right = jnp.asarray(imread_bgr(args.images[1]), jnp.uint8)
    stitcher = PairStitcher(DEFAULT_CONFIG, print_timing=False)
    hr, wr = right.shape[:2]

    def dispatch():
        """Queue one pair's full fused stitch; returns device handles."""
        est_packed, _pts, src_plane = stitcher._fused_estimate_src(
            left, right
        )
        packed_src = (
            src_plane if src_plane is not None
            else stitcher._pack_src()(right)
        )
        packed_out, canvas = stitcher._fused_compose(0, hr, wr)(
            left, packed_src, est_packed
        )
        # Start the D2H transfer of the packed vector NOW: by the time this
        # pair is retired (DEPTH dispatches later) the tunnel RTT has been
        # paid behind newer pairs' device work, so retire()'s fetch returns
        # without a synchronous round trip.
        try:
            packed_out.copy_to_host_async()
        except AttributeError:
            pass
        return packed_out, canvas

    def retire(handles):
        """Fetch the packed vector (the pipeline's one sync) and crop."""
        packed_out, canvas = handles
        status, cropped = fast_path_crop(_host_fetch(packed_out), canvas)
        return cropped if status == "ok" else None

    # Warmup (compiles); validate the fast path applies.
    pano = retire(dispatch())
    if pano is None:
        print(json.dumps({"error": "bench pair needs the fallback ladder"}))
        return 1
    force_sync(pano)

    fallbacks = 0
    inflight = deque()
    t0 = time.perf_counter()
    for _ in range(args.pairs):
        inflight.append(dispatch())
        if len(inflight) >= args.depth:
            if retire(inflight.popleft()) is None:
                fallbacks += 1
    while inflight:
        if retire(inflight.popleft()) is None:
            fallbacks += 1
    total_s = time.perf_counter() - t0

    rate = (args.pairs - fallbacks) / total_s
    print(json.dumps({
        "metric": "mountain_4k_throughput_pairs_per_s",
        "value": round(rate, 2),
        "unit": "pairs/s",
        "ms_per_pair": round(total_s / args.pairs * 1e3, 2),
        "depth": args.depth,
        "fallback_pairs": fallbacks,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
