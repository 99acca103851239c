"""Pipeline orchestration: stitch a pair, fold over many images.

Reference equivalents: stitchTwoImages / stitchAllImages in each main
(serial src/serial/main.cpp:311-414, openmp src/openmp/main.cpp:457-560, gpu
src/gpu/main.cpp:322-449). One implementation here serves every execution
config (CPU / single TPU / sharded) — the reference maintains four copies.

Stage structure (matching the reference's timed stages and its stdout
timing-line contract, see pano_tpu.timer):
  1. Harris detection on both images          (ops.harris, on device)
  2. SSD matching, right=query / left=train   (ops.match, on device)
  3. RANSAC homography right->left            (ops.ransac, on device)
  4. canvas geometry                          (host, 3x3 math only)
  5. fused warp + blend                       (ops.warp, on device)

Failure semantics mirror the reference: no matches -> stderr message + None
(src/serial/main.cpp:321-324); RANSAC below the inlier gate -> OpenCV
findHomography fallback when available (src/gpu/ransac.cu:499-511,
src/gpu/main.cpp:356-367); a failed pair in the fold is skipped and the fold
continues with the previous panorama (src/serial/main.cpp:404-407).
"""

from __future__ import annotations

import sys
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pano_tpu.config import DEFAULT_CONFIG, PanoConfig
from pano_tpu.ops import harris as harris_ops
from pano_tpu.ops import match as match_ops
from pano_tpu.ops import ransac as ransac_ops
from pano_tpu.ops import warp as warp_ops
from pano_tpu.timer import Timer, print_stage

try:
    import cv2  # type: ignore

    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    _HAVE_CV2 = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _suffix(label: str, tag: str) -> str:
    return f"{label} ({tag})" if tag else label


class PairStitcher:
    """Stitches image pairs; owns the jitted stage functions.

    `timing_tag` suffixes stage labels the way the reference per-impl mains
    do ("(OpenMP)", "(GPU)"; src/openmp/main.cpp:230, src/gpu/main.cpp:335).
    """

    def __init__(
        self,
        config: PanoConfig = DEFAULT_CONFIG,
        print_timing: bool = True,
        timing_tag: str = "",
    ):
        self.config = config
        self.print_timing = print_timing
        self.timing_tag = timing_tag
        self._match_and_ransac = jax.jit(
            self._match_and_ransac_impl, static_argnames=()
        )

    # --- device stages -----------------------------------------------------

    def detect(self, img_dev: jnp.ndarray) -> harris_ops.KeyPoints:
        t = Timer()
        kps = harris_ops.harris_detect_jit(img_dev, self.config.harris)
        kps = jax.block_until_ready(kps)
        if self.print_timing:
            print_stage(
                _suffix("Harris Corner Detection", self.timing_tag),
                t.elapsed(),
            )
        return kps

    def _match_and_ransac_impl(self, kps_q, kps_t, img_q, img_t):
        matches = match_ops.match_keypoints(
            kps_q, kps_t, img_q, img_t, self.config.harris
        )
        pts_q, pts_t, valid = match_ops.gather_match_points(
            kps_q, kps_t, matches
        )
        res = ransac_ops.ransac_homography(
            pts_q, pts_t, valid, self.config.ransac
        )
        return matches, (pts_q, pts_t, valid), res

    def match(self, kps_q, kps_t, img_q, img_t) -> match_ops.Matches:
        t = Timer()
        m = match_ops.match_keypoints(
            kps_q, kps_t, img_q, img_t, self.config.harris
        )
        m = jax.block_until_ready(m)
        if self.print_timing:
            print_stage(
                _suffix("Harris Corner Matching", self.timing_tag), t.elapsed()
            )
        return m

    def ransac(self, pts_q, pts_t, valid) -> ransac_ops.RansacResult:
        t = Timer()
        res = ransac_ops.ransac_homography(
            pts_q, pts_t, valid, self.config.ransac
        )
        res = jax.block_until_ready(res)
        if self.print_timing:
            print_stage(
                _suffix("RANSAC Homography Estimation", self.timing_tag),
                t.elapsed(),
            )
        return res

    # --- host fallback -----------------------------------------------------

    def _opencv_fallback_h(
        self, pts_q: np.ndarray, pts_t: np.ndarray, valid: np.ndarray
    ) -> Optional[np.ndarray]:
        """cv::findHomography(RANSAC) fallback, as the reference GPU path uses
        below its inlier gate (src/gpu/ransac.cu:499-511)."""
        if not _HAVE_CV2:
            return None
        n = int(valid.sum())
        if n < 4:
            return None
        h, _ = cv2.findHomography(
            pts_q[:n].astype(np.float64),
            pts_t[:n].astype(np.float64),
            cv2.RANSAC,
            self.config.ransac.distance_threshold,
        )
        return h

    # --- pair stitch -------------------------------------------------------

    def estimate_homography(
        self, left_dev: jnp.ndarray, right_dev: jnp.ndarray
    ) -> Optional[np.ndarray]:
        """Detect/match/RANSAC; returns H mapping right->left (float64 host),
        or None on failure. Matching treats the right image as query and the
        left as train (src/serial/main.cpp:319-328)."""
        kps_left = self.detect(left_dev)
        kps_right = self.detect(right_dev)

        matches = self.match(kps_right, kps_left, right_dev, left_dev)
        pts_q, pts_t, valid = match_ops.gather_match_points(
            kps_right, kps_left, matches
        )
        if int(matches.count()) == 0:
            print("Not enough matched corners for stitching!", file=sys.stderr)
            return None

        res = self.ransac(pts_q, pts_t, valid)
        if bool(res.ok):
            return np.asarray(res.H, dtype=np.float64)

        # Below the inlier quality gate: reference-style CPU fallback.
        h = self._opencv_fallback_h(
            np.asarray(pts_q), np.asarray(pts_t), np.asarray(valid)
        )
        if h is None:
            if int(res.inlier_count) > 0:
                return np.asarray(res.H, dtype=np.float64)
            print(
                "RANSAC failed to estimate a homography matrix!",
                file=sys.stderr,
            )
            return None
        return h

    def composite(
        self,
        left_dev: jnp.ndarray,
        right_dev: jnp.ndarray,
        h_right_to_left: np.ndarray,
    ) -> jnp.ndarray:
        """Canvas geometry on host, fused warp+blend on device, crop."""
        cfg = self.config.stitch
        (canvas_h, canvas_w), t_mat, (min_x, min_y) = (
            warp_ops.compute_canvas_geometry(
                h_right_to_left,
                left_dev.shape[:2],
                right_dev.shape[:2],
            )
        )
        m = t_mat @ h_right_to_left
        m_inv = np.linalg.inv(m)

        pad_h = _round_up(canvas_h, cfg.canvas_bucket)
        pad_w = _round_up(canvas_w, cfg.canvas_bucket)
        tx = int(-min_x)  # cv::Rect int conversion truncates (main.cpp:376)
        ty = int(-min_y)

        canvas = warp_ops.warp_and_blend(
            left_dev,
            right_dev,
            jnp.asarray(m_inv, jnp.float32),
            jnp.asarray(tx, jnp.int32),
            jnp.asarray(ty, jnp.int32),
            pad_h,
            pad_w,
            cfg.blend,
        )
        return canvas[:canvas_h, :canvas_w]

    def stitch_pair(
        self, left_dev: jnp.ndarray, right_dev: jnp.ndarray
    ) -> Optional[jnp.ndarray]:
        """stitchTwoImages (src/serial/main.cpp:311-391): returns the stitched
        canvas on device, or None on failure."""
        t = Timer()
        h = self.estimate_homography(left_dev, right_dev)
        if h is None:
            return None
        canvas = self.composite(left_dev, right_dev, h)
        canvas = jax.block_until_ready(canvas)
        if self.print_timing:
            print_stage(_suffix("Image Stitching", self.timing_tag), t.elapsed())
        return canvas


def stitch_all_images(
    images: List[np.ndarray],
    config: PanoConfig = DEFAULT_CONFIG,
    print_timing: bool = True,
    timing_tag: str = "",
    device: Optional[jax.Device] = None,
) -> Optional[np.ndarray]:
    """Left-fold stitching (stitchAllImages, src/serial/main.cpp:395-414).

    Failed pairs are skipped and the fold continues with the previous
    panorama (src/serial/main.cpp:404-407). Returns host uint8 BGR.
    """
    t = Timer()
    if not images:
        return None
    stitcher = PairStitcher(config, print_timing, timing_tag)

    def to_dev(a):
        arr = jnp.asarray(a, dtype=jnp.uint8)
        return jax.device_put(arr, device) if device is not None else arr

    panorama = to_dev(images[0])
    n = len(images)
    for i in range(1, n):
        print(f"Stitching image {i + 1} of {n}...", flush=True)
        temp = stitcher.stitch_pair(panorama, to_dev(images[i]))
        if temp is None:
            print(f"Failed to stitch image {i}!", file=sys.stderr)
            continue
        panorama = temp
    if print_timing:
        print_stage(_suffix("Total Stitching Process", timing_tag), t.elapsed())
    return np.asarray(panorama)
