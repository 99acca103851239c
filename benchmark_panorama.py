#!/usr/bin/env python3
"""Strong/weak scaling benchmark (reference benchmark_panorama.py:1-142).

The reference sweeps OMP_NUM_THREADS in {1..64} over the OpenMP binary and
parses its 'Total Execution Time (OpenMP):' stdout line; the TPU-native
scaling axes are image resolution (weak scaling: downsample so per-unit work
tracks the reference's sqrt(t/max) rule, benchmark_panorama.py:52-63) and —
when more than one device is visible — the mesh size for the sharded path.

Outputs CSV + log-log matplotlib plots with ideal-scaling lines, like the
reference (benchmark_panorama.py:101-137).
"""

import argparse
import csv
import os
import re
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))

TIME_RE = {
    "serial": re.compile(r"^Total Execution Time: ([\d.]+) ms$", re.M),
    "tpu": re.compile(r"^Total Execution Time(?: \(TPU\))?: ([\d.]+) ms$", re.M),
    "sharded": re.compile(
        r"^Total Execution Time \((?:Sharded|OpenMP)\): ([\d.]+) ms$", re.M
    ),
}
STITCH_RE = re.compile(
    r"^Total Stitching Process(?: \((?:TPU|Sharded|OpenMP)\))?: ([\d.]+) ms$",
    re.M,
)


def downsample_images(src_dir, dst_dir, scale):
    """Reference downsample rule (benchmark_panorama.py:11-21)."""
    import cv2

    os.makedirs(dst_dir, exist_ok=True)
    for name in sorted(os.listdir(src_dir)):
        path = os.path.join(src_dir, name)
        img = cv2.imread(path)
        if img is None:
            continue
        if scale < 1.0:
            img = cv2.resize(
                img,
                (max(2, int(img.shape[1] * scale)),
                 max(2, int(img.shape[0] * scale))),
            )
        cv2.imwrite(os.path.join(dst_dir, name), img)


def run_once(impl, image_dir, out_file, env=None):
    full_env = dict(os.environ)
    if env:
        full_env.update(env)
    proc = subprocess.run(
        [sys.executable, "-m", "pano_tpu.cli", impl, "--warmup", "--dir",
         image_dir, "--out", out_file],
        capture_output=True,
        text=True,
        env=full_env,
        cwd=HERE,
    )
    matches = STITCH_RE.findall(proc.stdout)
    if not matches:
        print(proc.stdout[-2000:], proc.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"no timing line from {impl}")
    return float(matches[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="/root/reference/images/mountain")
    ap.add_argument("--impl", default="tpu",
                    choices=["serial", "tpu", "sharded"])
    ap.add_argument(
        "--scales", default="0.125,0.177,0.25,0.354,0.5,0.707,1.0",
        help="resolution scales to sweep (weak-scaling axis)",
    )
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--csv", default="benchmark_results.csv")
    ap.add_argument("--plot", default="benchmark_scaling.png")
    args = ap.parse_args()

    scales = [float(s) for s in args.scales.split(",")]
    rows = []
    with tempfile.TemporaryDirectory() as tmp:
        for scale in scales:
            d = os.path.join(tmp, f"s{scale}")
            downsample_images(args.dataset, d, scale)
            times = [
                run_once(args.impl, d, os.path.join(tmp, "out.jpg"))
                for _ in range(args.repeats)
            ]
            best = min(times)
            area = scale * scale
            rows.append({"scale": scale, "area": area, "ms": best})
            print(f"scale={scale:.3f} area={area:.3f} best={best:.1f} ms",
                  flush=True)

    with open(args.csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["scale", "area", "ms"])
        w.writeheader()
        w.writerows(rows)
    print(f"Wrote {args.csv}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        areas = [r["area"] for r in rows]
        ms = [r["ms"] for r in rows]
        plt.figure(figsize=(7, 5))
        plt.loglog(areas, ms, "o-", label=f"{args.impl} measured")
        ideal = [ms[-1] * a / areas[-1] for a in areas]
        plt.loglog(areas, ideal, "--", label="ideal (linear in pixels)")
        plt.xlabel("image area (fraction of full)")
        plt.ylabel("total stitching time (ms)")
        plt.title(f"Resolution scaling — {os.path.basename(args.dataset)}")
        plt.legend()
        plt.grid(True, which="both", alpha=0.3)
        plt.savefig(args.plot, dpi=120, bbox_inches="tight")
        print(f"Wrote {args.plot}")
    except Exception as e:  # pragma: no cover
        print(f"plotting skipped: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
