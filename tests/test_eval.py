"""Tests for the quality-evaluation subsystem (pano_tpu.eval)."""

import numpy as np
import pytest

from pano_tpu import eval as peval


def test_ssim_identical_images_is_one(rng):
    a = rng.integers(0, 256, (64, 64), dtype=np.uint8).astype(np.float64)
    mask = np.ones((64, 64), bool)
    assert peval.masked_ssim(a, a, mask) == pytest.approx(1.0)


def test_ssim_decreases_with_noise(rng):
    a = rng.integers(0, 256, (64, 64)).astype(np.float64)
    mask = np.ones((64, 64), bool)
    b1 = a + rng.normal(0, 5, a.shape)
    b2 = a + rng.normal(0, 50, a.shape)
    s1 = peval.masked_ssim(a, b1, mask)
    s2 = peval.masked_ssim(a, b2, mask)
    assert 1.0 > s1 > s2 > 0.0


def test_ssim_mask_isolates_region(rng):
    a = rng.integers(0, 256, (64, 64)).astype(np.float64)
    b = a.copy()
    b[:, 32:] = rng.integers(0, 256, (64, 32))  # destroy right half
    left = np.zeros((64, 64), bool)
    left[:, : 32 - 8] = True  # stay clear of the filter support
    assert peval.masked_ssim(a, b, left) == pytest.approx(1.0, abs=1e-6)


def test_grade_thresholds():
    cats, overall = peval.grade(
        {
            "PSNR": 40.0,
            "SSIM": 0.95,
            "Inlier Ratio": 0.9,
            "Reprojection Error": 0.5,
            "Seam Smoothness": 5.0,
        }
    )
    assert overall == "Good"
    assert all(v == "good" for v in cats.values())

    cats, overall = peval.grade(
        {
            "PSNR": 30.0,   # acceptable
            "SSIM": 0.95,
            "Inlier Ratio": 0.9,
            "Reprojection Error": 0.5,
            "Seam Smoothness": 5.0,
        }
    )
    assert overall == "Acceptable"

    cats, overall = peval.grade(
        {
            "PSNR": 10.0,   # poor
            "SSIM": 0.95,
            "Inlier Ratio": 0.9,
            "Reprojection Error": 0.5,
            "Seam Smoothness": 5.0,
        }
    )
    assert overall == "Poor"


def test_compute_metrics_self_comparison(rng):
    """A panorama compared against itself must grade near-perfect."""
    import cv2

    img = np.zeros((200, 300, 3), np.uint8)
    img[:] = 40
    r = np.random.default_rng(0)
    for _ in range(120):
        y, x = r.integers(10, 180), r.integers(10, 280)
        cv2.circle(img, (int(x), int(y)), int(r.integers(3, 9)),
                   tuple(int(c) for c in r.integers(50, 255, 3)), -1)
    m = peval.compute_metrics(img, img)
    assert m["SSIM"] > 0.99
    assert m["PSNR"] > 50 or m["PSNR"] == float("inf")
    assert m["Reprojection Error"] < 1.0
    _, overall = peval.grade(m)
    assert overall == "Good"


def test_compute_metrics_detects_misalignment(rng):
    import cv2

    img = np.zeros((200, 300, 3), np.uint8)
    r = np.random.default_rng(1)
    for _ in range(120):
        y, x = r.integers(10, 180), r.integers(10, 280)
        cv2.circle(img, (int(x), int(y)), int(r.integers(3, 9)),
                   tuple(int(c) for c in r.integers(50, 255, 3)), -1)
    noisy = img.copy()
    noisy = (noisy.astype(np.int32) + r.integers(-60, 60, img.shape)).clip(
        0, 255
    ).astype(np.uint8)
    m = peval.compute_metrics(img, noisy)
    assert m["SSIM"] < 0.9
