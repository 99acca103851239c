"""Guard the library-API example against API drift.

examples/library_quickstart.py is the documented embedding surface
(README "Library API"); this runs its synthetic no-dataset demo in a
subprocess (own backend config — PANO_CPU=1 forces the CPU platform the
way the example documents) and asserts it stitches the two overlapping
crops back into the full scene.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_library_quickstart_synthetic_demo():
    env = dict(os.environ, PANO_CPU="1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "library_quickstart.py")],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "synthetic demo ok" in out.stdout
    # Scene reconstructed at its true extent (sub-pixel fp noise in the
    # estimated homography can shift the canvas ceil by one pixel).
    import re

    m = re.search(r"-> \((\d+), (\d+), 3\)", out.stdout)
    assert m, out.stdout
    h, w = int(m.group(1)), int(m.group(2))
    assert abs(h - 480) <= 2 and abs(w - 960) <= 2, (h, w)


def test_library_quickstart_single_image_errors(tmp_path):
    """One image path is almost always a typo'd second path: the example
    must exit with a usage error, not silently run the synthetic demo
    (ADVICE r3). Also covers the argparse rewrite: --out must not be
    swallowed into the positional image list."""
    env = dict(os.environ, PANO_CPU="1")
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "examples", "library_quickstart.py"),
            str(tmp_path / "only_one.jpg"),
            "--out", str(tmp_path / "pano.jpg"),
        ],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO,
    )
    assert out.returncode != 0
    assert "at least two images" in out.stderr
    assert "synthetic demo ok" not in out.stdout
