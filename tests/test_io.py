"""Reader-layer tests: CLI arg semantics (src/reader/reader.cpp:14-82
parity) and native-vs-Python decode equivalence."""

import os

import numpy as np
import pytest

from pano_tpu import io as pio


@pytest.fixture
def image_dir(tmp_path, rng):
    import cv2

    paths = []
    for i, name in enumerate(["b.png", "a.png", "c.png"]):
        img = rng.integers(0, 256, (20 + i, 30, 3), dtype=np.uint8)
        p = str(tmp_path / name)
        cv2.imwrite(p, img)
        paths.append(p)
    (tmp_path / "notes.txt").write_text("not an image")
    return str(tmp_path)


def test_dir_mode_sorted_and_skips_unreadable(image_dir, capsys):
    res = pio.read_images_from_args(["--dir", image_dir])
    # 3 images, lexicographic order (a, b, c) — the deliberate determinism
    # fix over the reference's unsorted directory_iterator.
    assert len(res.images) == 3
    assert [os.path.basename(p) for p in res.paths] == [
        "a.png", "b.png", "c.png",
    ]
    assert "Warning: Unable to open image file" in capsys.readouterr().err
    assert res.output_file == "result.jpg"


def test_positional_and_out_flag(image_dir):
    files = sorted(
        os.path.join(image_dir, f)
        for f in os.listdir(image_dir)
        if f.endswith(".png")
    )
    res = pio.read_images_from_args([files[0], "--out", "pano.png", files[1]])
    assert len(res.images) == 2
    assert res.output_file == "pano.png"


def test_dir_takes_precedence_over_positionals(image_dir):
    files = sorted(
        os.path.join(image_dir, f)
        for f in os.listdir(image_dir)
        if f.endswith(".png")
    )
    # reader.cpp:53-79: when --dir is given, positionals are ignored.
    res = pio.read_images_from_args([files[0], "--dir", image_dir])
    assert len(res.images) == 3


def test_missing_dir_exits(tmp_path):
    with pytest.raises(SystemExit):
        pio.read_images_from_args(["--dir", str(tmp_path / "nope")])


def test_imread_parity_native_vs_cv2(image_dir):
    """When the native reader is loaded, it must decode byte-identically to
    cv2 (both are OpenCV imgcodecs underneath)."""
    import cv2

    p = os.path.join(image_dir, "a.png")
    ours = pio.imread_bgr(p)
    ref = cv2.imread(p, cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(ours, ref)


def test_imwrite_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    assert pio.imwrite_bgr(p, img)
    back = pio.imread_bgr(p)
    np.testing.assert_array_equal(back, img)
