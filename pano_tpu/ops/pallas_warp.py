"""Pallas projective-warp kernel: 2-pass resampling at VPU speed.

Why this kernel exists: XLA lowers per-pixel gathers (the heart of
cv::warpPerspective, src/serial/main.cpp:371-372) to a scalar gather that
runs at ~70M elements/s on v5e — ~190 ms for a 4K panorama canvas, 100x off
the HBM floor. Mosaic's `tpu.dynamic_gather` can permute inside a vreg
(8 sublanes or 128 lanes), which is enough to rebuild the warp as a classic
Catmull–Smith two-pass resample:

  * A projective map sends each output ROW to a LINE in source space, so the
    vertical source coordinate along that line is exactly linear in the
    source x: vy = alpha_r + beta_r * sx. Pass V gathers rows with
    `take_along_axis(axis=0)` over a handful of 8-row vregs (round-select).
  * Pass H then resamples columns with `take_along_axis(axis=1)` over a few
    128-lane vregs.

The two-pass factorization evaluates the vertical interpolation at the tap
columns x0/x0+1 instead of at sx, a sub-pixel approximation bounded by
|beta| (the per-row tilt) — far below the quality gate's tolerance for
panorama homographies, and host-side guards (`supports_homography`) fall
back to the exact XLA path when the warp is too tilted or too zoomed.

Memory plan per (128, 128) output tile:
  * the source image is packed BGRA into int32 (alpha=127 inside the image —
    255<<24 would overflow positive int32, see pack_bgra; the 1-px black
    border and all padding have alpha=0, reproducing cv2's BORDER_CONSTANT
    blending at edges) and padded so any clamped window fits;
  * one async DMA pulls the (WIN_H, WIN_W) source window (dynamic, aligned
    start) HBM -> VMEM;
  * an unrolled loop over 8-row chunks recomputes coordinates from iota,
    does the two gather passes (vertical taps, then a requantized
    BGRA-packed single-gather horizontal pass), and writes packed u8 RGB +
    a f32 alpha/weight map.

Outputs feed the same XLA blend epilogue as the reference path
(ops/warp.py), so overlay and feather compositing are unchanged.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile / window geometry (all compile-time constants).
# The 256-wide output tile amortizes the fixed per-window costs that a
# 128-wide tile pays per 128 output columns: the 128-lane alignment waste
# in the source window (Mosaic requires lane-dim dynamic slices to be
# 128-aligned, so ~130 px of every window is alignment + taps, not span),
# the per-tile scalar bounds/DMA-issue work, and the per-chunk (8, 1)
# line-fit ops. Measured on the 4K mountain window: 2.55 -> 2.0 ms.
TH, TW = 128, 256          # output tile
WIN_H, WIN_W = 208, 512    # VMEM source window per tile (int32: 852 KB
#                            double-buffered; sized for SCALE_MAX below —
#                            y: 8 align + 1.32*TH + margins <= 208,
#                            x: 128 align + 1.32*TW + 130 <= 512)
RV = 5                     # max vertical gather rounds (chunk spans <= 40
#                            rows). Low-tilt homographies (chunk span <= 16
#                            rows — nearly every panorama pair) run the
#                            RV_FAST=3 variant: the rounds loop is the
#                            kernel's hottest sequence, and the dead rounds
#                            cost real gather/select issue slots. Callers
#                            pick per-warp via supports_homography(rv=...) /
#                            the fused path's tier ladder.
RV_FAST = 3
VW = 512                   # pass-V column span per chunk (4 lane vregs)
RH = 4                     # horizontal gather rounds over VW. Measured
#                            dead end (2026-08-18, v5e): replacing the
#                            4-src-vreg scan with a per-output-group 384-col
#                            DYNAMIC window (VMEM roundtrip of packedv +
#                            3 x 2 gathers, scalar-core corner bounds) was
#                            bit-identical but 9% SLOWER on the 4K window —
#                            the store->load dependency breaks the unrolled
#                            chunks' cross-iteration ILP, same failure mode
#                            as runtime round predication (see RV note).
_BORDER = 1                # black border offset baked into padded coords
# Quality bound on the local Jacobian (minification): the two-pass resample
# is bit-exact vs the XLA bilinear oracle up to ~1.3x downscale and degrades
# non-monotonically beyond (measured on v5e 2026-08-16: max diff 1 at 1.3,
# 43+ at 1.35+). Panorama pair warps have scale ~1; out-of-bound warps fall
# back to the exact XLA path via the envelope guards below.
SCALE_MAX = 1.32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_bgra(
    img_u8: jnp.ndarray, alpha_plane: jnp.ndarray = None
) -> jnp.ndarray:
    """(H, W, 3) uint8 -> (Hp, Wp) int32 BGRA with 1-px black border and
    window-sized padding (alpha=127 inside the image, 0 elsewhere).

    `alpha_plane` (H, W) in [0, 1] replaces the constant alpha — feather
    blending packs its edge-distance ramp here, so the kernel's weight
    output IS the warped feather weight (ramp x border validity).
    """
    h, w = img_u8.shape[:2]
    p = img_u8.astype(jnp.int32)
    if alpha_plane is None:
        alpha = 127
    else:
        alpha = jnp.clip(
            jnp.round(alpha_plane * 127.0), 1.0, 127.0
        ).astype(jnp.int32)
    # alpha<=127 keeps the packed value positive in int32 (255<<24 overflows)
    packed = p[..., 0] | (p[..., 1] << 8) | (p[..., 2] << 16) | (alpha << 24)
    hp = _round_up(h + 2 * _BORDER, 8) + WIN_H
    wp = _round_up(w + 2 * _BORDER, 128) + WIN_W
    return jnp.pad(
        packed, ((_BORDER, hp - h - _BORDER), (_BORDER, wp - w - _BORDER))
    )


MAX_MIP = 2  # deepest 2x prefilter level the mip path will try (4x total)


def mip_m_inv(m_inv: np.ndarray, lvl: int) -> np.ndarray:
    """Inverse map re-targeted at the 2^lvl-downsampled source: the full-res
    source coordinate divided by the mip scale."""
    s = float(2 ** lvl)
    return np.diag([1.0 / s, 1.0 / s, 1.0]) @ np.asarray(m_inv, np.float64)


def pick_mip_level(
    m_inv: np.ndarray,
    out_h: int,
    out_w: int,
    off_x: float = 0.0,
    off_y: float = 0.0,
) -> "int | None":
    """Smallest mip level (0 = full res) at which the kernel's envelope
    accepts this warp, or None if even the deepest level fails.

    Kills the minification quality/perf cliff: beyond SCALE_MAX (~1.32x
    zoom-out) the kernel's two-pass resample degrades and the old gate fell
    back to the XLA gather warp (~190 ms for a 4K canvas, see module
    docstring). Warping from a 2x-box-prefiltered source halves the
    effective Jacobian, so scales up to SCALE_MAX * 2^MAX_MIP stay on the
    kernel — and the prefilter anti-aliases, which plain bilinear at >2x
    minification does not (standard mipmapping argument)."""
    for lvl in range(MAX_MIP + 1):
        if supports_homography(
            mip_m_inv(m_inv, lvl), out_h, out_w, off_x, off_y
        ):
            return lvl
    return None


def pick_rv(
    m_inv: np.ndarray,
    out_h: int,
    out_w: int,
    off_x: float = 0.0,
    off_y: float = 0.0,
) -> int:
    """Host-side round-count pick for an in-envelope warp: RV_FAST when the
    3-round chunk budget holds (low-tilt maps — nearly every panorama
    pair), RV otherwise. Call with the mip-adjusted m_inv the kernel will
    actually run."""
    return (
        RV_FAST
        if supports_homography(m_inv, out_h, out_w, off_x, off_y, rv=RV_FAST)
        else RV
    )


def supports_homography(
    m_inv: np.ndarray,
    out_h: int,
    out_w: int,
    off_x: float = 0.0,
    off_y: float = 0.0,
    rv: int = RV,
) -> bool:
    """Host-side guard: does this inverse map fit the kernel's static
    windows? Checks the local Jacobian scale and row tilt at the canvas
    window's corners/center; falls back to the XLA warp otherwise.
    With rv=RV_FAST the tighter chunk-row budget of the 3-round kernel
    variant is checked instead (see RV_FAST)."""
    m = np.asarray(m_inv, np.float64)
    pts = np.array(
        [
            [0, 0], [out_w, 0], [0, out_h], [out_w, out_h],
            [out_w / 2, out_h / 2],
        ],
        np.float64,
    ) + np.array([off_x, off_y])
    for x, y in pts:
        den = m[2, 0] * x + m[2, 1] * y + m[2, 2]
        if abs(den) < 1e-9:
            return False
        # Jacobian of (sx, sy) wrt (ox, oy) at this point.
        sx = (m[0, 0] * x + m[0, 1] * y + m[0, 2]) / den
        sy = (m[1, 0] * x + m[1, 1] * y + m[1, 2]) / den
        j00 = (m[0, 0] - sx * m[2, 0]) / den
        j01 = (m[0, 1] - sx * m[2, 1]) / den
        j10 = (m[1, 0] - sy * m[2, 0]) / den
        j11 = (m[1, 1] - sy * m[2, 1]) / den
        # Tile source extents.
        x_span = abs(j00) * TW + abs(j01) * TH
        y_span = abs(j10) * TW + abs(j11) * TH
        if x_span + 132 > WIN_W or y_span + 34 > WIN_H:
            return False
        # Resampling-quality bound (see SCALE_MAX).
        if x_span > SCALE_MAX * TW or y_span > SCALE_MAX * TH:
            return False
        # Chunk extents: pass-V span VW columns horizontally, 8 rows.
        if abs(j00) * TW + 132 > VW:
            return False
        # Row tilt beta = dy/dx along an output row.
        if abs(j00) < 1e-9:
            return False
        beta = j10 / j00
        chunk_rows = 8 * abs(j11 - j10 * j01 / j00) + abs(beta) * VW + 3
        if chunk_rows > rv * 8 - 8:  # alignment slop
            return False
    return True


def envelope_ok_device(
    m_inv: jnp.ndarray,     # (3, 3) f32, traced
    off_x: jnp.ndarray,     # () traced window origin
    off_y: jnp.ndarray,
    out_h: int,
    out_w: int,
    rv: int = RV,
) -> jnp.ndarray:
    """Device-side twin of supports_homography (for fully-fused graphs where
    H never visits the host). Returns a () bool."""
    m = m_inv.astype(jnp.float32)
    base = jnp.array(
        [
            [0.0, 0.0], [out_w, 0.0], [0.0, out_h], [out_w, out_h],
            [out_w / 2.0, out_h / 2.0],
        ],
        jnp.float32,
    )
    pts = base + jnp.stack(
        [off_x.astype(jnp.float32), off_y.astype(jnp.float32)]
    )
    x, y = pts[:, 0], pts[:, 1]
    den = m[2, 0] * x + m[2, 1] * y + m[2, 2]
    den_ok = jnp.abs(den) > 1e-9
    den_s = jnp.where(den_ok, den, 1.0)
    sx = (m[0, 0] * x + m[0, 1] * y + m[0, 2]) / den_s
    sy = (m[1, 0] * x + m[1, 1] * y + m[1, 2]) / den_s
    j00 = (m[0, 0] - sx * m[2, 0]) / den_s
    j01 = (m[0, 1] - sx * m[2, 1]) / den_s
    j10 = (m[1, 0] - sy * m[2, 0]) / den_s
    j11 = (m[1, 1] - sy * m[2, 1]) / den_s

    x_span = jnp.abs(j00) * TW + jnp.abs(j01) * TH
    y_span = jnp.abs(j10) * TW + jnp.abs(j11) * TH
    ok = den_ok
    ok &= x_span + 132 < WIN_W
    ok &= y_span + 34 < WIN_H
    ok &= x_span <= SCALE_MAX * TW     # resampling-quality bound
    ok &= y_span <= SCALE_MAX * TH
    ok &= jnp.abs(j00) * TW + 132 < VW
    ok &= jnp.abs(j00) > 1e-9
    j00_s = jnp.where(jnp.abs(j00) > 1e-9, j00, 1.0)
    beta = j10 / j00_s
    chunk_rows = (
        8 * jnp.abs(j11 - j10 * j01 / j00_s) + jnp.abs(beta) * VW + 3
    )
    ok &= chunk_rows < rv * 8 - 8
    return ok.all()


def _interpreted_trace() -> bool:
    """True when the current pallas_call trace will run on the CPU
    interpreter (tests / virtual-device meshes) rather than Mosaic.

    The interpreter compiles the kernel body with XLA:CPU, whose fusion can
    RECOMPUTE a value separately for each consumer with different FMA/
    rounding codegen, so at integer knife edges the copies disagree by one
    index step. Observed concretely (both reproduced, then fixed by the
    ref roundtrips below):
      * pass H: x0i = floor(lx) said 51 while fxh = lx - floor(lx) said
        0.0 for lx = 51.999985 — full weight on the WRONG column (output
        shifted one source column left in ULP-dependent runs);
      * pass V feeding pass H: the packedv consumed by the gathers
        disagreed with the packedv value jax.debug.print showed.
    A value-level lax.optimization_barrier does NOT stop it — only a real
    store/load through a kernel ref does, so chunk_body roundtrips vy, lx
    and packedv through VMEM scratch refs on the interpreted path (ref
    loads are effect-sequenced and return one fixed value; every
    downstream consumer is then a single exactly-rounded op). Mosaic
    lowers ops individually with no such refusion pass; the roundtrips
    are skipped there to keep stores off the chunk pipeline's critical
    path."""
    # Private-attribute access is deliberate (no public probe exists in
    # jax 0.9.0) and must fail LOUDLY on a jax upgrade: silently falling
    # back would drop the roundtrips for interpret-under-TPU-backend runs
    # and reintroduce the knife-edge bug as intermittent pixel diffs.
    from jax._src import config as _jax_config

    if _jax_config.pallas_tpu_interpret_mode_context_manager.value \
            is not None:
        return True
    return jax.default_backend() != "tpu"


def _warp_kernel(params_ref, *rest,
                 has_alpha: bool = True, emit_weight: bool = True,
                 interp: bool = False, rv: int = RV,
                 compose: bool = False, hl: int = 0, wl: int = 0,
                 nlb_y: int = 0, nlb_x: int = 0,
                 nwb_y: int = 0, nwb_x: int = 0):
    rest = list(rest)
    if compose:
        # Fused warp + overlay composite (canvas-direct): the grid covers
        # the WHOLE canvas; warped pixels blend against the base (left
        # placement) in-register and the kernel writes final u8 canvas
        # tiles — the packed-RGB window (~64 MB on a 4K canvas) never
        # exists, killing its HBM write + compose-pass re-read
        # (BASELINE.md round-4 'deferred warp+compose fusion' note).
        blk_ref = rest.pop(0)   # (4,) i32 [ty_b, tx_b, wy_b, wx_b]
        src_ref = rest.pop(0)
        left_ref = rest.pop(0)  # (3, TH, TW) u8 block (clamped index map)
        out_ref = rest.pop(0)   # (3, TH, TW) u8 canvas block
        rgb_ref = w_ref = None
    else:
        blk_ref = left_ref = out_ref = None
        src_ref = rest.pop(0)
        rgb_ref = rest.pop(0)
        if emit_weight:
            w_ref = rest.pop(0)
        else:
            # Overlay compose never reads the weight map (warped-pixel
            # validity is rgb != 0): skip the (out_h, out_w) f32 store —
            # 62 MB of dead HBM traffic on a 4K canvas window.
            w_ref = None
    w_and_scratch = rest
    s_vmem, win_org = w_and_scratch[0], w_and_scratch[1]
    if interp:
        # Interpret-only roundtrip buffers — see _interpreted_trace.
        pv_ref, vy_ref, lx_ref, sem = w_and_scratch[2:]
    else:
        pv_ref = vy_ref = lx_ref = None
        sem = w_and_scratch[2]
    """One (TH, TW) output tile of one batch element; see module docstring
    for the algorithm. The grid is (batch, tiles_y, tiles_x) — the batch
    rides the leading grid axis (the Harris kernel's pattern), so a BATCH
    of warps (the sharded global composite, composite_pairs_batched) is ONE
    kernel launch whose window DMAs prefetch straight across image
    boundaries. Per-image params live in the (B, 13) scalar-prefetch array.

    The source window DMA is double-buffered across grid steps: pallas runs
    the grid as a sequential loop on the core with persistent scratch, so at
    step t we wait on the window prefetched at step t-1 and immediately
    start the DMA for step t+1 — hiding the ~30us per-tile DMA latency that
    would otherwise serialize (measured ~40 ms over a 1275-tile canvas).
    """
    bb = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    nb = pl.num_programs(0)
    n_i = pl.num_programs(1)
    n_j = pl.num_programs(2)
    _, hp, wp = src_ref.shape

    def proj_s(bbb, x, y):
        """Scalar projective map (padded-source coords) — runs entirely on
        the scalar unit; used for tile/window bounds instead of full
        (TH, TW) coordinate maps (the map is edge-monotone over a rectangle
        when den has no pole inside, which the envelope guards ensure, so
        rectangle extrema live at the 4 corners)."""
        den = params_ref[bbb, 6] * x + params_ref[bbb, 7] * y \
            + params_ref[bbb, 8]
        sx = (
            params_ref[bbb, 0] * x + params_ref[bbb, 1] * y
            + params_ref[bbb, 2]
        ) / den + float(_BORDER)
        sy = (
            params_ref[bbb, 3] * x + params_ref[bbb, 4] * y
            + params_ref[bbb, 5]
        ) / den + float(_BORDER)
        return sx, sy

    def tile_bounds(bbb, tii, tjj):
        """(sx_min, sx_max, sy_min, sy_max) of the UNCLIPPED source coords
        over output tile (bbb, tii, tjj), from its 4 corners (scalar math).
        """
        x0 = (tjj * TW).astype(jnp.float32) + params_ref[bbb, 9]
        y0 = (tii * TH).astype(jnp.float32) + params_ref[bbb, 10]
        x1 = x0 + float(TW - 1)
        y1 = y0 + float(TH - 1)
        sx0, sy0 = proj_s(bbb, x0, y0)
        sx1, sy1 = proj_s(bbb, x1, y0)
        sx2, sy2 = proj_s(bbb, x0, y1)
        sx3, sy3 = proj_s(bbb, x1, y1)
        sx_min = jnp.minimum(jnp.minimum(sx0, sx1), jnp.minimum(sx2, sx3))
        sx_max = jnp.maximum(jnp.maximum(sx0, sx1), jnp.maximum(sx2, sx3))
        sy_min = jnp.minimum(jnp.minimum(sy0, sy1), jnp.minimum(sy2, sy3))
        sy_max = jnp.maximum(jnp.maximum(sy0, sy1), jnp.maximum(sy2, sy3))
        return sx_min, sx_max, sy_min, sy_max

    def window_start(bbb, tii, tjj):
        """Aligned source-window origin for output tile (bbb, tii, tjj).

        Aligning DOWN from (min - 2) keeps >= 2 px of slack below the first
        tap and loses at most (align - 1) px to alignment, leaving
        WIN - align - 1 px of coverage above the minimum — consistent with
        the envelope guards' span budgets. (Subtracting a full alignment
        unit BEFORE aligning, as an earlier version did, wastes up to one
        extra alignment unit of right/bottom coverage, which for near-limit
        spans at unlucky phases could push the last taps out the window.)
        """
        sx_min, _, sy_min, _ = tile_bounds(bbb, tii, tjj)
        sxc = jnp.clip(sx_min, 0.0, float(wp - 2))
        syc = jnp.clip(sy_min, 0.0, float(hp - 2))
        wy = pl.multiple_of(
            jnp.clip((syc.astype(jnp.int32) - 2) & ~7, 0, hp - WIN_H), 8
        )
        wx = pl.multiple_of(
            jnp.clip((sxc.astype(jnp.int32) - 2) & ~127, 0, wp - WIN_W), 128
        )
        return wy, wx

    def start_dma(bbb, tii, tjj, into_slot):
        wy, wx = window_start(bbb, tii, tjj)
        # Stash the origin the DMA ACTUALLY used: the compute phase reads it
        # back from SMEM instead of re-evaluating window_start, whose two
        # inlined instances (prefetch at step t-1 vs compute at step t) the
        # compiler may otherwise round differently at integer knife edges —
        # an 8-row window shift between fetch and gather.
        win_org[into_slot, 0] = wy
        win_org[into_slot, 1] = wx
        pltpu.make_async_copy(
            src_ref.at[bbb, pl.ds(wy, WIN_H), pl.ds(wx, WIN_W)],
            s_vmem.at[into_slot],
            sem.at[into_slot],
        ).start()

    def _wait_dma(slot_):
        pltpu.make_async_copy(
            src_ref.at[0, pl.ds(0, WIN_H), pl.ds(0, WIN_W)],  # shape-only
            s_vmem.at[slot_],
            sem.at[slot_],
        ).wait()

    if compose:
        # The grid covers the CANVAS; source-window DMAs run only for tiles
        # inside the validated warp-window rectangle (every content-bearing
        # tile is inside it — the fused path's `safe` predicate). Window
        # tiles are visited in grid order, so their window-local ordinal
        # reproduces the per-step two-slot double buffering: tile k waits
        # on the DMA tile k-1 issued and prefetches tile k+1.
        ty_b, tx_b = blk_ref[0], blk_ref[1]
        wy_b, wx_b = blk_ref[2], blk_ref[3]
        in_win = (
            (ti >= wy_b) & (ti < wy_b + nwb_y)
            & (tj >= wx_b) & (tj < wx_b + nwb_x)
        )
        ordinal = (ti - wy_b) * nwb_x + (tj - wx_b)
        slot = lax.rem(ordinal, 2)
        next_slot = lax.rem(ordinal + 1, 2)

        @pl.when(in_win & (ordinal == 0))
        def _():
            start_dma(bb, ti, tj, slot)

        last_col = wx_b + nwb_x - 1
        nti = jnp.where(tj < last_col, ti, ti + 1)
        ntj = jnp.where(tj < last_col, tj + 1, wx_b)

        @pl.when(in_win & (ordinal + 1 < nwb_y * nwb_x))
        def _():
            start_dma(bb, nti, ntj, next_slot)

        @pl.when(in_win)
        def _():
            _wait_dma(slot)
    else:
        in_win = None
        step = (bb * n_i + ti) * n_j + tj
        slot = lax.rem(step, 2)
        next_slot = lax.rem(step + 1, 2)

        @pl.when(step == 0)
        def _():
            start_dma(bb, ti, tj, slot)

        # Prefetch the next tile's window while this tile computes (straight
        # across batch boundaries — the next tile may belong to image bb+1).
        @pl.when(step + 1 < nb * n_i * n_j)
        def _():
            s1 = step + 1
            bb1 = s1 // (n_i * n_j)
            r1 = s1 - bb1 * (n_i * n_j)
            start_dma(bb1, r1 // n_j, lax.rem(r1, n_j), next_slot)

        _wait_dma(slot)

    wy0 = win_org[slot, 0]   # the origin this slot's DMA used (see start_dma)
    wx0 = win_org[slot, 1]
    s_cur = s_vmem.at[slot]
    wy0f = wy0.astype(jnp.float32)
    wx0f = wx0.astype(jnp.float32)

    # This batch element's params (closures below capture these).
    h00 = params_ref[bb, 0]
    h01 = params_ref[bb, 1]
    h02 = params_ref[bb, 2]
    h10 = params_ref[bb, 3]
    h11 = params_ref[bb, 4]
    h12 = params_ref[bb, 5]
    h20 = params_ref[bb, 6]
    h21 = params_ref[bb, 7]
    h22 = params_ref[bb, 8]
    off_x = params_ref[bb, 9]   # canvas-window origin (canvas coords)
    off_y = params_ref[bb, 10]

    # Off-image tile skip: if the tile's entire preimage misses the real
    # image extent (params 11/12), write zeros and skip the gather passes —
    # worst-case-sized windows in the fused path leave many such tiles.
    real_w = params_ref[bb, 11]
    real_h = params_ref[bb, 12]
    t_sx_min, t_sx_max, t_sy_min, t_sy_max = tile_bounds(bb, ti, tj)
    tile_hits = (
        (t_sx_max > 0.5)
        & (t_sx_min < real_w + 1.5)
        & (t_sy_max > 0.5)
        & (t_sy_min < real_h + 1.5)
    )

    if compose:
        # Base tile — the compose kernel's left-placement logic in-register:
        # the left image's pixels where this canvas tile overlaps the
        # translated left rect (ragged edge masked per pixel), else zeros.
        run_tile = in_win & tile_hits
        bly = (
            lax.broadcasted_iota(jnp.int32, (TH, TW), 0) + (ti - ty_b) * TH
        )
        blx = (
            lax.broadcasted_iota(jnp.int32, (TH, TW), 1) + (tj - tx_b) * TW
        )
        in_left = (
            (ti >= ty_b) & (ti < ty_b + nlb_y)
            & (tj >= tx_b) & (tj < tx_b + nlb_x)
        )
        left_px = in_left & (bly < hl) & (blx < wl)
        base = jnp.where(left_px[None, :, :], left_ref[...], jnp.uint8(0))

        @pl.when(jnp.logical_not(run_tile))
        def _():
            out_ref[...] = base
    else:
        run_tile = tile_hits
        base = None

        @pl.when(jnp.logical_not(tile_hits))
        def _():
            rgb_ref[...] = jnp.zeros((1, TH, TW), jnp.int32)
            if emit_weight:
                w_ref[...] = jnp.zeros((1, TH, TW), jnp.float32)

    # --- per-chunk two-pass resample -----------------------------------
    def chunk_body(c, c_static):
        roy = (
            lax.broadcasted_iota(jnp.int32, (8, TW), 0).astype(jnp.float32)
            + (ti * TH + c * 8).astype(jnp.float32) + off_y
        )
        rox = (
            lax.broadcasted_iota(jnp.int32, (8, TW), 1).astype(jnp.float32)
            + (tj * TW).astype(jnp.float32) + off_x
        )
        rden = h20 * rox + h21 * roy + h22
        rinv = 1.0 / rden
        csx_raw = (h00 * rox + h01 * roy + h02) * rinv + float(_BORDER)
        csy_raw = (h10 * rox + h11 * roy + h12) * rinv + float(_BORDER)
        csx = jnp.clip(csx_raw, 0.0, float(wp - 2))
        # (csy is never clipped/used directly: the vertical coordinate is
        # resampled through the per-row line fit vy below.)

        # Row-line parameters: sy is exactly linear in sx along each row.
        # MUST use the unclamped coordinates — clamped endpoints corrupt the
        # line fit for tiles that map partially off-image (off-image pixels
        # carry alpha=0 and don't care what they sample).
        sxl = csx_raw[:, :1]
        sxr = csx_raw[:, TW - 1:]
        syl = csy_raw[:, :1]
        syr = csy_raw[:, TW - 1:]
        dx = sxr - sxl
        safe = jnp.where(jnp.abs(dx) < 1e-6, 1.0, dx)
        beta = jnp.where(jnp.abs(dx) < 1e-6, 0.0, (syr - syl) / safe)
        alpha = syl - beta * sxl

        # Chunk-local column window (128-aligned within the tile window).
        # csx is row-monotone (Mobius map, monotone under round-to-nearest),
        # so its extrema over the chunk are in the endpoint columns — no
        # (8, TW) reduction needed. Align DOWN from (min - 2): see
        # window_start for the coverage accounting.
        # The chunk column window: with VW == WIN_W (the current geometry)
        # it is exactly the tile window, i.e. cx0 = 0 (the clip range
        # [0, WIN_W - VW] is empty); the general alignment computation is
        # kept for a future VW < WIN_W split.
        if VW == WIN_W:
            cx0 = 0
        else:
            csx_lo = jnp.min(jnp.minimum(csx[:, :1], csx[:, TW - 1:]))
            cx0 = pl.multiple_of(
                jnp.clip(
                    (csx_lo.astype(jnp.int32) - wx0 - 2) & ~127,
                    0, WIN_W - VW,
                ),
                128,
            )
        cx0f = 0.0 if VW == WIN_W else cx0.astype(jnp.float32)
        xs = (
            lax.broadcasted_iota(jnp.int32, (8, VW), 1).astype(jnp.float32)
            + wx0f + cx0f
        )
        vy = alpha + beta * xs                       # (8, VW) padded coords
        vy = jnp.clip(vy, 0.0, float(hp - 2))
        if interp:
            vy_ref[...] = vy
            vy = vy_ref[...]
        vy0 = jnp.floor(vy)
        fyv = vy - vy0

        # Chunk-local row window (8-aligned). vy is linear in xs along each
        # row and rounding is monotone, so the map's OWN endpoint entries
        # bound every interior entry. The bound slices vy itself rather
        # than recomputing alpha + beta * xs_end: a recomputation is only
        # bitwise-consistent with the map if the compiler picks the same
        # FMA contraction for both expressions, which it need not.
        v_ends = jnp.minimum(vy[:, :1], vy[:, VW - 1:])
        vmin_i = jnp.min(jnp.floor(v_ends)).astype(jnp.int32)
        rl0 = pl.multiple_of(
            jnp.clip((vmin_i - wy0) & ~7, 0, WIN_H - rv * 8), 8
        )
        li = vy0.astype(jnp.int32) - wy0 - rl0       # in [0, rv*8) if guarded

        # All rv rounds run unconditionally: runtime predication of the
        # dead rounds (lax.cond per round) was measured SLOWER by ~1 ms on
        # v5e — the branches break Mosaic's instruction scheduling, while
        # the dead rounds' gathers are cheap next to that loss. The round
        # COUNT is static instead: callers compile the rv=RV_FAST variant
        # when the homography's chunk-row budget allows (see RV_FAST).
        #
        # Round-select arithmetic: a tap with sub-window row index q lives
        # in round q >> 3 at sublane q & 7, so the round test is ONE
        # compare against a loop-invariant (li >> 3) instead of the
        # two-compare range test, and the gather index is a loop-invariant
        # AND instead of a per-round clip (identical results: discarded
        # lanes' gathered values never reach the mix, and selected lanes'
        # indices are equal by definition; negative li — off-image
        # don't-care lanes — shifts to a negative round index that matches
        # nothing, exactly like the old range test).
        g0 = jnp.zeros((8, VW), jnp.int32)
        g1 = jnp.zeros((8, VW), jnp.int32)
        li_r0 = li >> 3          # tap-0 round index per lane
        li_a0 = li & 7           # tap-0 sublane within its round
        li_r1 = (li + 1) >> 3
        li_a1 = (li + 1) & 7
        for r in range(rv):
            # Round r serves g0 taps with li in [8r, 8r+7] and g1 taps
            # with li in [8r-1, 8r+6].
            s_r = s_cur[
                pl.ds(pl.multiple_of(rl0 + 8 * r, 8), 8), pl.ds(cx0, VW)
            ]
            t = jnp.take_along_axis(s_r, li_a0, axis=0)
            g0 = jnp.where(li_r0 == r, t, g0)
            t1 = jnp.take_along_axis(s_r, li_a1, axis=0)
            g1 = jnp.where(li_r1 == r, t1, g1)

        # Vertical mix in integer SWAR: two channels ride each i32 in
        # 16-bit fields (lo = B | R<<16, hi = G | A<<16), so one multiply
        # mixes two channels — i32 multiplies are full-throughput on the
        # v5e VPU (measured vs f32), halving the mix op count vs a
        # per-channel f32 unpack/mix/round. 7-bit weights + round-to-
        # nearest keep the requantized result within +-1 of the f32 mix
        # (cv2's own fixed-point INTER_LINEAR keeps only 5 fractional
        # bits). Field headroom: 255*128 + 64 = 32704 < 2^16, and the high
        # field tops out at 32704<<16 < 2^31, so nothing carries or wraps.
        # The repack to ONE BGRA-packed i32 plane also lets pass H fetch
        # every channel with a single gather per tap (3-4x fewer dynamic
        # gathers; measured -1.8 ms on the 4K window).
        M2 = jnp.int32(0x00FF00FF)
        iw1 = jnp.round(fyv * 128.0).astype(jnp.int32)
        iw0 = 128 - iw1
        lo = (g0 & M2) * iw0 + (g1 & M2) * iw1 + 0x00400040
        hi = ((g0 >> 8) & M2) * iw0 + ((g1 >> 8) & M2) * iw1 + 0x00400040
        packedv = ((lo >> 7) & M2) | (((hi >> 7) & M2) << 8)
        if interp:
            pv_ref[...] = packedv
            packedv = pv_ref[...]

        # Pass H: resample columns at lx (chunk-local).
        lx = csx - (wx0f + cx0f)  # (8, TW) in [0, VW)
        lx = jnp.clip(lx, 0.0, float(VW - 2))
        if interp:
            lx_ref[...] = lx
            lx = lx_ref[...]
        x0 = jnp.floor(lx)
        fxh = lx - x0
        x0i = x0.astype(jnp.int32)

        # Same SWAR trick horizontally: two i32 accumulators hold all four
        # channels; the two taps' 7-bit weights sum to 128, so every
        # 16-bit field stays <= 255*128 + 64 and the final (x + 64) >> 7
        # needs no clip. Gathers run per 128-column output group (Mosaic's
        # dynamic_gather permutes within one vreg, and take_along_axis
        # needs index shape == source shape). As in pass V, the source-vreg
        # test is one compare against the loop-invariant lane-group index
        # (x >> 7) and the gather index the loop-invariant (x & 127) —
        # replaces the two-compare range test + per-(h, tap) offset/clip
        # with identical sums (unselected lanes multiply by weight 0).
        iwh1 = jnp.round(fxh * 128.0).astype(jnp.int32)
        acc_parts = []
        for g in range(TW // 128):
            gsl = slice(128 * g, 128 * (g + 1))
            x0i_g = x0i[:, gsl]
            iw1_g = iwh1[:, gsl]
            taps = (
                (x0i_g >> 7, x0i_g & 127, 128 - iw1_g),
                ((x0i_g + 1) >> 7, (x0i_g + 1) & 127, iw1_g),
            )
            acc_lo = jnp.zeros((8, 128), jnp.int32)
            acc_hi = jnp.zeros((8, 128), jnp.int32)
            for h in range(RH):
                src_h = packedv[:, 128 * h : 128 * (h + 1)]
                for xg, xa, w in taps:
                    wgt = jnp.where(xg == h, w, 0)
                    q = jnp.take_along_axis(src_h, xa, axis=1)
                    acc_lo = acc_lo + (q & M2) * wgt
                    acc_hi = acc_hi + ((q >> 8) & M2) * wgt
            acc_parts.append((acc_lo, acc_hi))
        acc_lo = jnp.concatenate([p[0] for p in acc_parts], axis=1)
        acc_hi = jnp.concatenate([p[1] for p in acc_parts], axis=1)
        acc_lo = acc_lo + 0x00400040
        acc_hi = acc_hi + 0x00400040

        if not emit_weight:
            alpha_w = None
        elif has_alpha:
            # A field: bits 16.. of acc_hi, value scale 127 * 128.
            alpha_w = (acc_hi >> 23).astype(jnp.float32) * (1.0 / 127.0)
        else:
            # Analytic border weight: a tap at padded coord t is a real
            # image pixel iff t in [1, W] (resp. [1, H]); the summed
            # in-bounds bilinear weight factorizes per axis into
            # clip(s, 0, 1) * clip(dim + 1 - s, 0, 1). This is EXACT (the
            # XLA oracle's weight), where the resampled alpha channel is
            # only the two-pass approximation of it.
            wx_a = jnp.clip(csx_raw, 0.0, 1.0) * jnp.clip(
                real_w + 1.0 - csx_raw, 0.0, 1.0
            )
            wy_a = jnp.clip(csy_raw, 0.0, 1.0) * jnp.clip(
                real_h + 1.0 - csy_raw, 0.0, 1.0
            )
            alpha_w = wx_a * wy_a

        packed = (
            ((acc_lo >> 7) & 0xFF)             # B
            | (((acc_hi >> 7) & 0xFF) << 8)    # G
            | (((acc_lo >> 23) & 0xFF) << 16)  # R
        )

        if compose:
            # Overlay blend in-register (src/serial/main.cpp:380-386 / the
            # compose kernel's _blend_tile): any non-(0,0,0) warped pixel
            # overwrites the base; the final u8 canvas slab is the ONLY
            # HBM store — no packed-RGB window ever exists.
            nbm = packed != 0
            slab = slice(c_static * 8, c_static * 8 + 8)
            for ch, shift in enumerate((0, 8, 16)):
                out_ref[ch, pl.ds(c * 8, 8), :] = jnp.where(
                    nbm,
                    ((packed >> shift) & 0xFF).astype(jnp.uint8),
                    base[ch, slab, :],
                )
        else:
            rgb_ref[0, pl.ds(c * 8, 8), :] = packed
            if emit_weight:
                w_ref[0, pl.ds(c * 8, 8), :] = alpha_w
        return 0

    @pl.when(run_tile)
    def _():
        # Fully unrolled (16 chunks): a lax.fori_loop here was measured
        # 3+ ms slower on the 4K window — the loop boundary serializes
        # Mosaic's scheduling; unrolling restores cross-chunk ILP.
        for _c in range(TH // 8):
            chunk_body(jnp.int32(_c), _c)


def make_params(
    m_inv, off_x: float, off_y: float, real_h: int, real_w: int
) -> jnp.ndarray:
    """(13,) f32 kernel params: h_inv.ravel(), window origin, image extent.
    All entries may be traced values (used inside fused graphs)."""
    return jnp.concatenate(
        [
            jnp.asarray(m_inv, jnp.float32).reshape(-1),
            jnp.stack(
                [
                    jnp.asarray(off_x, jnp.float32),
                    jnp.asarray(off_y, jnp.float32),
                    jnp.asarray(real_w, jnp.float32),
                    jnp.asarray(real_h, jnp.float32),
                ]
            ),
        ]
    )


def make_params_host(
    m_inv, off_x: float, off_y: float, real_h: int, real_w: int
) -> np.ndarray:
    """Host twin of make_params (identical (13,) f32 layout) for the sharded
    batch paths: param rows are assembled in numpy and enter the device via
    ONE explicit device_put, instead of an eager h2d transfer per entry
    (each is a 30-85 ms RPC on the axon tunnel, and an uncommitted eager
    placement lands on the DEFAULT backend — the MULTICHIP_r04 bug class).
    tests/test_sharding.py pins the two layouts equal."""
    return np.concatenate(
        [
            np.asarray(m_inv, np.float32).reshape(-1),
            np.asarray([off_x, off_y, real_w, real_h], np.float32),
        ]
    )


def _warp_batched_call(
    srcs: jnp.ndarray,         # (B, Hp, Wp) int32 from pack_bgra
    params: jnp.ndarray,       # (B, 13) f32 from make_params
    out_h: int,
    out_w: int,
    has_alpha: bool,
    emit_weight: bool,
    rv: int,
):
    """One (B, tiles_y, tiles_x)-grid kernel launch over a batch of warps."""
    assert out_h % TH == 0 and out_w % TW == 0, (out_h, out_w)
    nb = srcs.shape[0]
    grid = (nb, out_h // TH, out_w // TW)
    tile_spec = pl.BlockSpec(
        (1, TH, TW), lambda b, i, j, *_: (b, i, j), memory_space=pltpu.VMEM
    )
    out_specs = [tile_spec, tile_spec] if emit_weight else [tile_spec]
    out_shape = [jax.ShapeDtypeStruct((nb, out_h, out_w), jnp.int32)]
    if emit_weight:
        out_shape.append(
            jax.ShapeDtypeStruct((nb, out_h, out_w), jnp.float32)
        )
    interp = _interpreted_trace()
    scratch = [
        pltpu.VMEM((2, WIN_H, WIN_W), jnp.int32),
        pltpu.SMEM((2, 2), jnp.int32),       # per-slot DMA window origin
    ]
    if interp:
        # Roundtrip buffers for packedv / vy / lx — see _interpreted_trace.
        scratch += [
            pltpu.VMEM((8, VW), jnp.int32),
            pltpu.VMEM((8, VW), jnp.float32),
            pltpu.VMEM((8, TW), jnp.float32),
        ]
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    return pl.pallas_call(
        functools.partial(
            _warp_kernel, has_alpha=has_alpha, emit_weight=emit_weight,
            interp=interp, rv=rv,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
    )(params.astype(jnp.float32), srcs)


@functools.lru_cache(maxsize=None)
def _warp_fn(
    out_h: int, out_w: int, has_alpha: bool, emit_weight: bool, rv: int
):
    """Single-warp function with a custom vmap rule: batching maps to the
    natively-batched kernel launch (the Harris kernel's pattern, see
    ops/pallas_harris._scores_fn) instead of jax's generic pallas_call
    batching, which cannot lower ANY-memory-space inputs on Mosaic. This is
    what lets the sharded composite paths run the kernel instead of the
    ~80x-slower XLA gather (VERDICT r3 missing #1)."""

    @jax.custom_batching.custom_vmap
    def f(src_packed, params):
        out = _warp_batched_call(
            src_packed[None], params[None], out_h, out_w,
            has_alpha, emit_weight, rv,
        )
        return tuple(o[0] for o in out)

    @f.def_vmap
    def _rule(axis_size, in_batched, srcs, params):  # noqa: ARG001
        if not in_batched[0]:
            srcs = jnp.broadcast_to(srcs, (axis_size,) + srcs.shape)
        if not in_batched[1]:
            params = jnp.broadcast_to(params, (axis_size,) + params.shape)
        out = _warp_batched_call(
            srcs, params, out_h, out_w, has_alpha, emit_weight, rv
        )
        return tuple(out), (True,) * len(out)

    return f


@functools.partial(
    jax.jit,
    static_argnames=("out_h", "out_w", "has_alpha", "emit_weight", "rv"),
)
def warp_packed(
    src_packed: jnp.ndarray,   # (Hp, Wp) int32 from pack_bgra
    params: jnp.ndarray,       # (13,) f32 from make_params
    out_h: int,
    out_w: int,
    has_alpha: bool = True,
    emit_weight: bool = True,
    rv: int = RV,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp the packed source onto an (out_h, out_w) canvas window.

    Returns (packed u8 RGB int32 (out_h, out_w), weight f32 (out_h, out_w)).
    out_h/out_w must be multiples of the (TH, TW) tile size. With
    has_alpha=False (overlay blends, constant packed alpha) the weight map
    is the exact analytic border weight instead of the resampled alpha
    channel (the SWAR mix carries the A field for free either way, so the
    flag now only selects the weight derivation). With emit_weight=False
    (overlay compose, which keys validity on rgb != 0 and never reads the
    weight) the weight output is dropped entirely — no f32 store, no
    weight math — and None is returned in its place.

    vmap-safe: batching lowers to ONE (B, tiles_y, tiles_x)-grid kernel
    (see _warp_fn), so batched/sharded compositing runs the real Mosaic
    kernel.
    """
    out = _warp_fn(out_h, out_w, has_alpha, bool(emit_weight), rv)(
        src_packed, params
    )
    if emit_weight:
        return out[0], out[1]
    return out[0], None


@functools.partial(
    jax.jit,
    static_argnames=("win_h", "win_w", "pad_h", "pad_w", "rv"),
)
def warp_compose_overlay(
    src_packed: jnp.ndarray,   # (Hp, Wp) int32 from pack_bgra
    params: jnp.ndarray,       # (13,) f32 — make_params(m_inv, 0, 0, hr,
    #                            wr): the output frame IS the canvas
    left: jnp.ndarray,         # (hl, wl, 3) uint8
    ty: jnp.ndarray,           # () int32 left placement — TH multiple
    tx: jnp.ndarray,           # () int32 — TW multiple
    wy0: jnp.ndarray,          # () int32 validated window origin — TH mult
    wx0: jnp.ndarray,          # () int32 — TW multiple
    win_h: int,                # static validated window extent (TH mult)
    win_w: int,                # (TW multiple)
    pad_h: int,                # static canvas dims (TH/TW multiples)
    pad_w: int,
    rv: int = RV,
) -> jnp.ndarray:
    """Fused warp + overlay composite: ONE canvas pass, no RGB window.

    The separate warp-then-compose pipeline materializes a packed-RGB
    window (~64 MB for a 4K canvas) that the compose kernel immediately
    re-reads — pure HBM round-trip. Here the warp kernel's grid covers the
    whole canvas: window tiles run the two-pass resample and overlay-blend
    against the base (the left placement, computed in-register exactly as
    pallas_compose._compose_kernel does) and every other tile is the plain
    base copy, so the u8 canvas is the only large store. Source-window
    DMAs are scheduled over the validated window rectangle only (see
    _warp_kernel's compose branch). Byte-identical to
    warp_packed(emit_weight=False) + compose_canvas(blend='overlay') —
    the select consumes the same requantized ints the packer would have
    packed (parity-tested in interpret mode and on hardware).

    (wy0, wx0, win_h, win_w) is the window rect the caller validated with
    envelope_ok_device — content-bearing tiles outside it would be dropped,
    exactly like the window-output variant, and the fused path's `safe`
    predicate already guarantees containment.

    Returns the (pad_h, pad_w, 3) uint8 canvas.
    """
    assert pad_h % TH == 0 and pad_w % TW == 0, (pad_h, pad_w)
    assert win_h % TH == 0 and win_w % TW == 0, (win_h, win_w)
    hl, wl = left.shape[:2]
    # (hl, wl, 3) u8 lives as {1,0,2} (planar) on TPU: a layout bitcast.
    left_chw = jnp.transpose(left, (2, 0, 1))
    nlb_y = -(-hl // TH)
    nlb_x = -(-wl // TW)
    nwb_y = win_h // TH
    nwb_x = win_w // TW
    blk = jnp.stack(
        [ty // TH, tx // TW, wy0 // TH, wx0 // TW]
    ).astype(jnp.int32)
    grid = (1, pad_h // TH, pad_w // TW)
    interp = _interpreted_trace()
    scratch = [
        pltpu.VMEM((2, WIN_H, WIN_W), jnp.int32),
        pltpu.SMEM((2, 2), jnp.int32),
    ]
    if interp:
        scratch += [
            pltpu.VMEM((8, VW), jnp.int32),
            pltpu.VMEM((8, VW), jnp.float32),
            pltpu.VMEM((8, TW), jnp.float32),
        ]
    scratch.append(pltpu.SemaphoreType.DMA((2,)))

    def left_map(b, i, j, p, s):
        return (
            0,
            jnp.clip(i - s[0], 0, nlb_y - 1),
            jnp.clip(j - s[1], 0, nlb_x - 1),
        )

    out = pl.pallas_call(
        functools.partial(
            _warp_kernel, has_alpha=False, emit_weight=False,
            interp=interp, rv=rv, compose=True, hl=hl, wl=wl,
            nlb_y=nlb_y, nlb_x=nlb_x, nwb_y=nwb_y, nwb_x=nwb_x,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((3, TH, TW), left_map),
            ],
            out_specs=pl.BlockSpec(
                (3, TH, TW), lambda b, i, j, p, s: (0, i, j)
            ),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((3, pad_h, pad_w), jnp.uint8),
    )(params.astype(jnp.float32)[None], blk, src_packed[None], left_chw)
    # Back to HWC — a layout bitcast on TPU.
    return jnp.transpose(out, (1, 2, 0))


def unpack_rgb(packed: jnp.ndarray) -> jnp.ndarray:
    """(H, W) int32 packed -> (H, W, 3) uint8 BGR."""
    return jnp.stack(
        [
            (packed & 0xFF).astype(jnp.uint8),
            ((packed >> 8) & 0xFF).astype(jnp.uint8),
            ((packed >> 16) & 0xFF).astype(jnp.uint8),
        ],
        axis=-1,
    )
