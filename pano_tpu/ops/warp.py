"""Projective inverse warp + fused compositing on device.

Reference equivalents (the stage the reference never accelerated — its GPU
path does warping and blending on the host with OpenCV + serial loops,
src/gpu/main.cpp:369-421):
  * canvas geometry: warped corners -> bounds -> translation
    (src/serial/main.cpp:334-369);
  * cv::warpPerspective(right, T*H, canvasSize) with INTER_LINEAR and
    BORDER_CONSTANT=0 (src/serial/main.cpp:371-372);
  * left image copied into the canvas ROI (src/serial/main.cpp:375-377);
  * overlay blend: any non-(0,0,0) warped pixel overwrites the canvas
    (src/serial/main.cpp:380-386, parallelized at src/openmp/main.cpp:526-533).

TPU-native design: one jitted kernel computes, for every canvas pixel, the
inverse-mapped source coordinate, gathers the 4 bilinear taps (out-of-bounds
taps contribute the 0 border), composites against the translated left image,
and writes the final uint8 canvas — warp and blend fused into a single HBM
pass. Canvas dimensions are bucketed (StitchOptions.canvas_bucket) so XLA
recompiles only per size bucket, and the exact canvas is cropped afterwards.

Blend modes:
  * 'overlay'  — reference parity.
  * 'feather'  — distance-ramp weighted average over the overlap (no
    reference analog; needed to push SSIM toward the quality bar, the
    reference's hard overlay is why its seams are visible).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def compute_canvas_geometry(
    h_right_to_left: np.ndarray,
    left_shape: Tuple[int, int],
    right_shape: Tuple[int, int],
) -> Tuple[Tuple[int, int], np.ndarray, Tuple[float, float]]:
    """Host-side canvas math (tiny; only the 3x3 H crosses device->host).

    Mirrors src/serial/main.cpp:334-369: warp the right image's corners by H,
    take the union with the left rect, build the translation that shifts
    negative coordinates into view.

    Returns ((canvas_h, canvas_w), T (3,3) float64, (min_x, min_y)).
    """
    hl, wl = left_shape
    hr, wr = right_shape
    corners = np.array(
        [[0.0, 0.0, 1.0], [wr, 0.0, 1.0], [wr, hr, 1.0], [0.0, hr, 1.0]],
        dtype=np.float64,
    )
    warped = (h_right_to_left.astype(np.float64) @ corners.T).T
    warped = warped[:, :2] / warped[:, 2:3]

    min_x = min(0.0, warped[:, 0].min())
    min_y = min(0.0, warped[:, 1].min())
    max_x = max(float(wl), warped[:, 0].max())
    max_y = max(float(hl), warped[:, 1].max())

    t = np.array(
        [[1.0, 0.0, -min_x], [0.0, 1.0, -min_y], [0.0, 0.0, 1.0]],
        dtype=np.float64,
    )
    canvas_w = int(np.ceil(max_x - min_x))
    canvas_h = int(np.ceil(max_y - min_y))
    return (canvas_h, canvas_w), t, (min_x, min_y)


def _bilinear_sample_u8(
    img: jnp.ndarray,          # (H, W, C) uint8
    sx: jnp.ndarray,           # (Hc, Wc) f32 source x
    sy: jnp.ndarray,           # (Hc, Wc) f32 source y
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """INTER_LINEAR sample with BORDER_CONSTANT=0; returns (f32 rgb, weight).

    Out-of-bounds taps contribute zero, matching cv::warpPerspective's
    constant border. `weight` is the summed in-bounds bilinear weight (1.0
    strictly inside, <1 at the border fringe, 0 outside) — reused by feather
    blending as the warped validity/alpha.
    """
    h, w = img.shape[:2]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    out = None
    wsum = None
    for dy, dx, wgt in (
        (0, 0, (1 - fx) * (1 - fy)),
        (0, 1, fx * (1 - fy)),
        (1, 0, (1 - fx) * fy),
        (1, 1, fx * fy),
    ):
        xi = x0i + dx
        yi = y0i + dy
        ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        tap = img[yi_c, xi_c].astype(jnp.float32)
        wm = jnp.where(ok, wgt, 0.0)
        contrib = tap * wm[..., None]
        out = contrib if out is None else out + contrib
        wsum = wm if wsum is None else wsum + wm
    return out, wsum


def _inverse_map(
    h_inv: jnp.ndarray, out_h: int, out_w: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map every canvas pixel through the inverse homography -> source xy."""
    ys = lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xs = lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    denom = h_inv[2, 0] * xs + h_inv[2, 1] * ys + h_inv[2, 2]
    sx = (h_inv[0, 0] * xs + h_inv[0, 1] * ys + h_inv[0, 2]) / denom
    sy = (h_inv[1, 0] * xs + h_inv[1, 1] * ys + h_inv[1, 2]) / denom
    return sx, sy


def warp_perspective_u8(
    img: jnp.ndarray, h_inv: jnp.ndarray, out_h: int, out_w: int
) -> jnp.ndarray:
    """cv::warpPerspective(img, M, size) equivalent, given M^-1.

    Standalone warp (uint8 out); the pipeline normally uses the fused
    warp_and_blend below instead.
    """
    sx, sy = _inverse_map(h_inv, out_h, out_w)
    rgb, _ = _bilinear_sample_u8(img, sx, sy)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)


def _edge_ramp(h: int, w: int) -> jnp.ndarray:
    """Feather weight map: distance to nearest image edge, normalized."""
    ys = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    d = jnp.minimum(
        jnp.minimum(xs + 1.0, w - xs), jnp.minimum(ys + 1.0, h - ys)
    )
    return d / jnp.asarray(min(h, w) / 2.0, jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("out_h", "out_w", "blend")
)
def warp_and_blend(
    left: jnp.ndarray,          # (Hl, Wl, 3) uint8
    right: jnp.ndarray,         # (Hr, Wr, 3) uint8
    h_inv: jnp.ndarray,         # (3, 3) f32 — inverse of T @ H
    tx: jnp.ndarray,            # () int32 — left placement offset x
    ty: jnp.ndarray,            # () int32
    out_h: int,
    out_w: int,
    blend: str = "overlay",
) -> jnp.ndarray:
    """Fused inverse warp of `right` + composite with translated `left`.

    Produces the (out_h, out_w, 3) uint8 canvas in one device pass. `tx, ty`
    are traced so one compiled kernel serves every pair within a canvas-size
    bucket.
    """
    hl, wl = left.shape[:2]
    hr, wr = right.shape[:2]

    sx, sy = _inverse_map(h_inv, out_h, out_w)
    right_f, right_w = _bilinear_sample_u8(right, sx, sy)
    warped_right = jnp.clip(jnp.round(right_f), 0, 255).astype(jnp.uint8)

    # Translated left image on the canvas (src/serial/main.cpp:375-377).
    canvas_left = jnp.zeros((out_h, out_w, 3), jnp.uint8)
    canvas_left = lax.dynamic_update_slice(
        canvas_left, left, (ty, tx, jnp.asarray(0, ty.dtype))
    )
    ys = lax.broadcasted_iota(jnp.int32, (out_h, out_w), 0)
    xs = lax.broadcasted_iota(jnp.int32, (out_h, out_w), 1)
    left_mask = (
        (ys >= ty) & (ys < ty + hl) & (xs >= tx) & (xs < tx + wl)
    )

    if blend == "overlay":
        # Reference semantics: non-black warped pixels win
        # (src/serial/main.cpp:380-386).
        right_nonblack = jnp.any(warped_right != 0, axis=-1)
        return jnp.where(
            right_nonblack[..., None], warped_right, canvas_left
        )

    if blend == "feather":
        ramp_r = _edge_ramp(hr, wr)
        wr_map, _ = _bilinear_sample_u8(
            (ramp_r[..., None] * 255.0).astype(jnp.uint8), sx, sy
        )
        w_right = (wr_map[..., 0] / 255.0) * right_w
        ramp_l = _edge_ramp(hl, wl)
        canvas_wl = jnp.zeros((out_h, out_w), jnp.float32)
        canvas_wl = lax.dynamic_update_slice(canvas_wl, ramp_l, (ty, tx))
        w_left = jnp.where(left_mask, canvas_wl, 0.0)

        total = w_left + w_right
        safe = jnp.maximum(total, 1e-6)
        blended = (
            canvas_left.astype(jnp.float32) * w_left[..., None]
            + right_f * w_right[..., None]
        ) / safe[..., None]
        # Regions covered by only one image fall back to that image exactly.
        only_left = (w_right <= 0.0) & left_mask
        only_right = (w_left <= 0.0) & (right_w > 0.0)
        out = jnp.where(only_left[..., None], canvas_left.astype(jnp.float32), blended)
        out = jnp.where(only_right[..., None], right_f, out)
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)

    raise ValueError(f"unknown blend mode: {blend}")
