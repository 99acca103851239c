"""Unit tests: Harris detection vs a numpy oracle of the reference's
seqHarrisCornerDetectorDetect (src/serial/main.cpp:119-185)."""

import numpy as np
import jax.numpy as jnp
import cv2

from pano_tpu.config import HarrisOptions
from pano_tpu.ops import harris


def harris_oracle(img_bgr: np.ndarray, opts: HarrisOptions):
    """Reference-semantics Harris in numpy/f64: returns (keypoint set, resp).

    Uses the library's own gray conversion (validated against cv2 separately)
    so this oracle isolates the conv/response/NMS math.
    """
    gray = np.asarray(
        harris.bgr_to_gray_f32(jnp.asarray(img_bgr)), np.float64
    )

    def conv(a, k):
        kk = k.shape[0] // 2
        out = np.zeros_like(a)
        h, w = a.shape
        for y in range(kk, h - kk):
            for x in range(kk, w - kk):
                out[y, x] = np.sum(a[y - kk:y + kk + 1, x - kk:x + kk + 1] * k)
        return out

    sx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float64)
    sy = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float64)
    half = 2
    xs = np.arange(5) - half
    g = np.exp(-(xs[:, None] ** 2 + xs[None, :] ** 2) / 2.0)
    g /= g.sum()

    gx = conv(gray, sx)
    gy = conv(gray, sy)
    sxx = conv(gx * gx, g)
    syy = conv(gy * gy, g)
    sxy = conv(gx * gy, g)
    resp = sxx * syy - sxy * sxy - opts.k * (sxx + syy) ** 2

    kps = set()
    hl = opts.nms_neighborhood // 2
    h, w = gray.shape
    for y in range(hl, h - hl):
        for x in range(hl, w - hl):
            r = resp[y, x]
            if r <= opts.nms_thresh:
                continue
            nb = resp[y - hl:y + hl + 1, x - hl:x + hl + 1].copy()
            nb[hl, hl] = -np.inf
            if r > nb.max():
                kps.add((x, y))
    return kps, resp


def test_gray_matches_cv2(rng):
    img = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    got = np.asarray(harris.bgr_to_gray_f32(jnp.asarray(img)))
    want = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).astype(np.float32)
    diff = np.abs(got - want)
    # Exact except for pixels on a rounding boundary (tie-breaking differs
    # between cv2 builds); those may be off by exactly 1.
    assert diff.max() <= 1.0
    assert (diff > 0).mean() < 0.01


def test_response_matches_oracle(rng):
    img = rng.integers(0, 256, (24, 28, 3), dtype=np.uint8)
    opts = HarrisOptions()
    gray = harris.bgr_to_gray_f32(jnp.asarray(img))
    got = np.asarray(harris.harris_response(gray, opts.k))
    _, want = harris_oracle(img, opts)
    # f32 vs f64: responses reach ~1e9 on random noise; tolerate relative err.
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e3)


def test_detect_matches_oracle_keypoint_set(rng):
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    # exact selection: this test checks NMS semantics, not selection policy
    opts = HarrisOptions(max_keypoints=512, topk_method="exact")
    kps = harris.harris_detect(jnp.asarray(img), opts)
    got = {
        (int(x), int(y))
        for (x, y), v in zip(np.asarray(kps.xy), np.asarray(kps.valid))
        if v
    }
    want, _ = harris_oracle(img, opts)
    # Tie-breaking and f32 rounding may flip borderline peaks; demand high
    # overlap rather than exact equality (the acceptance gate is statistical).
    inter = len(got & want)
    union = len(got | want)
    assert union > 0
    assert inter / union > 0.95, (len(got), len(want), inter)


def test_detect_respects_capacity_and_masks():
    img = np.zeros((40, 40, 3), np.uint8)
    img[10:30:4, 10:30:4] = 255  # sparse bright dots -> strong corners
    opts = HarrisOptions(max_keypoints=8)
    kps = harris.harris_detect(jnp.asarray(img), opts)
    assert kps.xy.shape == (8, 2)
    assert kps.valid.shape == (8,)
    # Responses of valid keypoints sorted descending (top-k order).
    r = np.asarray(kps.response)[np.asarray(kps.valid)]
    assert np.all(np.diff(r) <= 0)


def test_detect_empty_image_no_keypoints():
    img = np.zeros((32, 32, 3), np.uint8)
    kps = harris.harris_detect(jnp.asarray(img), HarrisOptions(max_keypoints=16))
    assert int(kps.count()) == 0
