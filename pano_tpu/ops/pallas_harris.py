"""Pallas fused Harris-scores kernel: BGR u8 -> gray -> gradients ->
products -> Gaussian smoothing -> response -> strict NMS -> thresholded
score map, in one VMEM-resident pass per tile.

The XLA version (ops/harris.py) materializes ~7 intermediate 52 MB planes in
HBM per image and runs the shifted tap sums as separate fusions (~7 ms per
13 MP image on v5e after all XLA-level tuning). This kernel DMAs each tile's
u8 channel-plane window (with a 4-px stencil halo) into VMEM once — gray
conversion included, so not even the f32 gray image touches HBM — and keeps
the whole chain on-chip; the only HBM writes are the final score map.

Semantics are EXACTLY the reference chain (src/serial/main.cpp:119-185):
  * Sobel gradients with the zero "valid border" (gradients forced to 0
    outside global [1, dim-2] — reproducing convolveSequential's untouched
    border, src/serial/main.cpp:96-116);
  * gradient products, separable 5x5 sigma=1 Gaussian (border handled the
    same way: products outside the valid gradient region are zero, matching
    the reference's zero-border first conv);
  * response det - k*tr^2; NMS strictly-greater over the 3x3 neighborhood
    with the [halfLen, dim-halfLen) border clip (src/serial/main.cpp:159-180).

Output: 2x2 BLOCK-FOLDED score map (Hp/2, Wp/2) f32 — slot (r, c) holds
the max of scores over pixel block {2r, 2r+1} x {2c, 2c+1} — padded to
tile multiples, -inf outside peaks/image. NMS peaks are pairwise
non-adjacent, so each 2x2 block holds at most one peak and the in-kernel
fold is lossless; it quarters the score plane's HBM writes and feeds
harris_detect's top-K directly (no XLA reduce_window pass remains). The
row half of the fold is a free vreg-aligned reshape; the lane half — which
strided slices and lane-splitting reshapes cannot lower on Mosaic, see git
history — runs as per-vreg dynamic_gather deinterleaves (see the kernel
epilogue). Each peak's two mantissa LSBs carry its in-2x2-block offset
((row&1)<<1 | (col&1), a <= 2 ulp perturbation) so harris_detect's decode
after top-K needs no gathers back into the plane. Only
nms_neighborhood == 3 is supported (the reference never uses any other
value); callers must guard.
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

TH, TW = 128, 512          # score tile per grid step. Tile-width A/B on
#                            the 4K mountain pair (round 5, same session):
#                            TW=256 halves the last-tile column waste
#                            (4608 -> 4352 columns for the 4156-px image)
#                            but measured SLOWER end-to-end — device
#                            compute 7.82 -> 7.90 ms — the doubled per-tile
#                            fixed costs (DMA issues, scalar bounds, chunk
#                            prologues) outweigh the ~5% compute saving.
PAD_R, PAD_C = 8, 128      # gray image offset inside the padded array
WIN_R, WIN_C = TH + 16, TW + 256   # DMA window (halo 4 within the offsets)

_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float64)
_SOBEL_Y = _SOBEL_X.T
_G1D = None  # filled below


def _gauss1d():
    global _G1D
    if _G1D is None:
        xs = np.arange(5) - 2
        g = np.exp(-(xs**2) / 2.0)
        _G1D = g / g.sum()
    return _G1D


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_bgr(imgs_u8: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) u8 -> (B, 3, Hp, Wp) u8 planes, image at offset
    (PAD_R, PAD_C), zero elsewhere. The transpose is a layout bitcast on
    TPU (u8 HWC is stored channel-planar, {1,0,2})."""
    h, w = imgs_u8.shape[1:3]
    nti = -(-h // TH)
    ntj = -(-w // TW)
    hp = nti * TH + 2 * PAD_R
    wp = ntj * TW + 2 * PAD_C
    chw = jnp.transpose(imgs_u8, (0, 3, 1, 2))
    return jnp.pad(
        chw,
        ((0, 0), (0, 0), (PAD_R, hp - h - PAD_R), (PAD_C, wp - w - PAD_C)),
    )


def _make_kernel(
    h: int, w: int, k: float, nms_thresh: float, nti: int, ntj: int,
    nb: int, pack_mode: "str | None" = None,
):
    """Kernel closure over static image dims and Harris constants.

    With pack_mode set, a second output carries the b|g<<8|r<<16 packed
    i32 pixel plane — the descriptor-gather source (ops/match.py
    extract_patch_descriptors). The BGR tile is already in VMEM for the
    gray conversion, so this replaces a separate XLA u8->i32 convert +
    pack pass over the full image (~0.5 ms per 13 MP image on v5e) with
    one extra VMEM shift-or and the tile write. Modes:

      * "plain": plane slot (y, x) = image pixel (y, x), no alpha byte.
      * "warp_const" / "warp_ramp": the plane doubles as the warp
        kernel's packed source (ops/pallas_warp.warp_packed), replacing
        the separate pack_bgra dispatch over the full image: slot
        (y, x) = pixel (y-1, x-1) — the 1-px black border convention —
        with pack_bgra's alpha byte OR'd in (127 inside the image for
        "warp_const"; the feather edge ramp, bit-identical to
        warp._edge_ramp -> pack_bgra quantization, for "warp_ramp").
        The descriptor gather compensates via its plane_origin=1 offset.
    """
    emit_packed = pack_mode is not None

    def kernel(bgr_ref, out_ref, *rest):
        if emit_packed:
            pk_ref, wbuf, sem = rest
        else:
            (wbuf, sem) = rest
        bb = pl.program_id(0)
        ti = pl.program_id(1)
        tj = pl.program_id(2)

        # Double-buffered window DMA (same pattern as ops/pallas_warp): at
        # step t wait on the window prefetched at step t-1 and immediately
        # start step t+1's copy, hiding the per-tile DMA latency behind the
        # stencil compute. The window is the 3 u8 channel planes; gray
        # conversion happens in VMEM (saves the XLA gray chain, its f32
        # HBM round trip, AND 25% of the DMA bytes vs an f32 gray window).
        # The leading grid axis is the image batch (1 for the single-image
        # path; >1 under the custom_vmap rule) — prefetch runs straight
        # across the batch boundary.
        step = (bb * nti + ti) * ntj + tj
        slot = lax.rem(step, 2)
        next_slot = lax.rem(step + 1, 2)

        def start_dma(bbb, tii, tjj, into_slot):
            pltpu.make_async_copy(
                bgr_ref.at[
                    bbb, :, pl.ds(tii * TH, WIN_R), pl.ds(tjj * TW, WIN_C)
                ],
                wbuf.at[into_slot],
                sem.at[into_slot],
            ).start()

        @pl.when(step == 0)
        def _():
            start_dma(bb, ti, tj, slot)

        @pl.when(step + 1 < nb * nti * ntj)
        def _():
            s1 = step + 1
            bb1 = s1 // (nti * ntj)
            r1 = s1 - bb1 * (nti * ntj)
            start_dma(bb1, r1 // ntj, lax.rem(r1, ntj), next_slot)

        pltpu.make_async_copy(
            bgr_ref.at[0, :, pl.ds(0, WIN_R), pl.ds(0, WIN_C)],  # shape
            wbuf.at[slot],
            sem.at[slot],
        ).wait()
        wu8 = wbuf[slot]
        # cv::cvtColor(BGR2GRAY) emulation — same formula as
        # ops/harris.py bgr_to_gray_f32 (BT.601 weights, round-half-even),
        # but the kernel's contraction order can round half-boundary pixels
        # +-1 differently (see test_pallas_harris' tolerance). Mosaic has
        # no u8 -> f32 cast; hop through i32.
        bi = wu8[0].astype(jnp.int32)
        gi = wu8[1].astype(jnp.int32)
        ri = wu8[2].astype(jnp.int32)
        win = jnp.round(
            0.114 * bi.astype(jnp.float32)
            + 0.587 * gi.astype(jnp.float32)
            + 0.299 * ri.astype(jnp.float32)
        )
        # Tile-local pixel q lives at window index (q + PAD_R - 0, ...):
        # window origin is padded (ti*TH, tj*TW) == pixel (ti*TH - PAD_R,
        # tj*TW - PAD_C), so pixel q -> window (q_r + 8, q_c + 128).
        row0 = ti * TH  # global pixel row of tile-local 0
        col0 = tj * TW

        if emit_packed:
            # Packed descriptor-gather plane for the tile's pixels (the
            # window carries pixel q at (q_r + PAD_R, q_c + PAD_C)). Warp
            # modes write the slot-(y,x)=pixel-(y-1,x-1) shifted view —
            # the u8 padding supplies the 1-px black border — and OR in
            # pack_bgra's alpha byte so the plane IS a valid warp source.
            sr = PAD_R if pack_mode == "plain" else PAD_R - 1
            sc = PAD_C if pack_mode == "plain" else PAD_C - 1
            pkv = (
                bi[sr : sr + TH, sc : sc + TW]
                | (gi[sr : sr + TH, sc : sc + TW] << 8)
                | (ri[sr : sr + TH, sc : sc + TW] << 16)
            )
            if pack_mode != "plain":
                gy = (
                    lax.broadcasted_iota(jnp.int32, (TH, TW), 0)
                    + (row0 - 1)
                )
                gx = (
                    lax.broadcasted_iota(jnp.int32, (TH, TW), 1)
                    + (col0 - 1)
                )
                inside = (gy >= 0) & (gy < h) & (gx >= 0) & (gx < w)
                if pack_mode == "warp_const":
                    alpha = jnp.where(inside, 127, 0)
                else:  # warp_ramp: pack_bgra(img, _edge_ramp) bit-compat
                    gyf = gy.astype(jnp.float32)
                    gxf = gx.astype(jnp.float32)
                    d = jnp.minimum(
                        jnp.minimum(gxf + 1.0, w - gxf),
                        jnp.minimum(gyf + 1.0, h - gyf),
                    )
                    a = jnp.clip(
                        jnp.round(d / float(min(h, w) / 2.0) * 127.0),
                        1.0,
                        127.0,
                    ).astype(jnp.int32)
                    alpha = jnp.where(inside, a, 0)
                pkv = pkv | (alpha << 24)
            pk_ref[0] = pkv

        # Separable Sobel over pixels q in [-3, TH+3) x [-3, TW+3): the
        # [1,2,1] smooth is shared by construction (Sx = smooth_v * diff_h,
        # Sy = smooth_h * diff_v) — 8 vector ops instead of the 12 direct
        # tap sums. f32 sums associate differently from the XLA chain's
        # tap order; both are within the parity tests' stated tolerance.
        # Window coordinate of pixel q is (q + PAD_R, q + PAD_C).
        rs = (
            (
                win[4 : 4 + TH + 6, 124 : 124 + TW + 8]
                + win[6 : 6 + TH + 6, 124 : 124 + TW + 8]
            )
            + 2.0 * win[5 : 5 + TH + 6, 124 : 124 + TW + 8]
        )  # vertical [1,2,1], origin (-3, -4)
        gx = rs[:, 2:] - rs[:, : TW + 6]
        cs = (
            (
                win[4 : 4 + TH + 8, 124 : 124 + TW + 6]
                + win[4 : 4 + TH + 8, 126 : 126 + TW + 6]
            )
            + 2.0 * win[4 : 4 + TH + 8, 125 : 125 + TW + 6]
        )  # horizontal [1,2,1], origin (-4, -3)
        gy = cs[2:, :] - cs[: TH + 6, :]

        # Zero gradients outside the reference's valid region [1, dim-2]
        # (convolveSequential leaves the 1-px border untouched-zero).
        gr = (
            lax.broadcasted_iota(jnp.int32, (TH + 6, TW + 6), 0)
            - 3 + row0
        )
        gc = (
            lax.broadcasted_iota(jnp.int32, (TH + 6, TW + 6), 1)
            - 3 + col0
        )
        gvalid = (gr >= 1) & (gr <= h - 2) & (gc >= 1) & (gc <= w - 2)
        gx = jnp.where(gvalid, gx, 0.0)
        gy = jnp.where(gvalid, gy, 0.0)

        g1 = _gauss1d()
        g0f, g1f, g2f = float(g1[0]), float(g1[1]), float(g1[2])
        planes = []
        for prod in (gx * gx, gy * gy, gx * gy):
            # Separable Gaussian with the symmetric taps folded
            # (g[0]==g[4], g[1]==g[3]): 7 vector ops per axis, not 9.
            # Vertical: rows [-1, TH+1), cols [-3, TW+6) domain.
            v = (
                (prod[0 : TH + 2, :] + prod[4 : 4 + TH + 2, :]) * g0f
                + (prod[1 : 1 + TH + 2, :] + prod[3 : 3 + TH + 2, :]) * g1f
                + prod[2 : 2 + TH + 2, :] * g2f
            )
            # Horizontal: cols [-1, TW+1).
            s = (
                (v[:, 0 : TW + 2] + v[:, 4 : 4 + TW + 2]) * g0f
                + (v[:, 1 : 1 + TW + 2] + v[:, 3 : 3 + TW + 2]) * g1f
                + v[:, 2 : 2 + TW + 2] * g2f
            )
            planes.append(s)  # (TH+2, TW+2), indexed from pixel (-1, -1)
        sxx, syy, sxy = planes

        resp = sxx * syy - sxy * sxy - k * (sxx + syy) * (sxx + syy)

        # The reference's SECOND convolution also leaves its 2-px border
        # untouched-zero (convolveSequential valid region), so the response
        # is exactly 0 outside global [2, dim-3] — NMS neighbors must see
        # those zeros (src/serial/main.cpp:141-155).
        rr2 = (
            lax.broadcasted_iota(jnp.int32, (TH + 2, TW + 2), 0)
            - 1 + row0
        )
        cc2 = (
            lax.broadcasted_iota(jnp.int32, (TH + 2, TW + 2), 1)
            - 1 + col0
        )
        rvalid = (rr2 >= 2) & (rr2 <= h - 3) & (cc2 >= 2) & (cc2 <= w - 3)
        resp = jnp.where(rvalid, resp, 0.0)

        # Strict NMS over the 3x3 neighborhood.
        nmax = None
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                t = resp[1 + dy : 1 + dy + TH, 1 + dx : 1 + dx + TW]
                nmax = t if nmax is None else jnp.maximum(nmax, t)
        center = resp[1 : 1 + TH, 1 : 1 + TW]

        rr = lax.broadcasted_iota(jnp.int32, (TH, TW), 0) + row0
        cc = lax.broadcasted_iota(jnp.int32, (TH, TW), 1) + col0
        border_ok = (rr >= 1) & (rr < h - 1) & (cc >= 1) & (cc < w - 1)
        is_peak = (center > nms_thresh) & (center > nmax) & border_ok
        # Pack the in-2x2-block offset ((rr&1)<<1 | (cc&1)) into the two
        # mantissa LSBs of each peak score (<= 2 ulp perturbation).  NMS
        # peaks are pairwise non-adjacent, so every 2x2 block holds at most
        # one peak: after harris_detect's lossless 2x2 block-max reduction
        # the surviving value carries its own sub-block position, killing
        # the four scalar-gather-bound candidate fetches per image that the
        # decode otherwise needs (~0.45 ms/image on v5e).  Non-peaks stay
        # -inf (never bit-packed, so masking semantics are unchanged).
        # TH/TW and the tile origins are even, so tile-local parity is
        # global parity.
        off = ((rr & 1) << 1) | (cc & 1)
        cbits = lax.bitcast_convert_type(center, jnp.int32)
        packed_score = lax.bitcast_convert_type(
            (cbits & ~3) | off, jnp.float32
        )
        sc = jnp.where(is_peak, packed_score, -jnp.inf)
        # Row-pair fold (lossless, see module docstring). The row-major
        # (TH/2, 2*TW) reshape puts row 2i in lanes [0, TW) and row 2i+1
        # in [TW, 2TW) of the same sublane, so the fold is a vreg-aligned
        # static-slice max — measured ~free on v5e, where the seemingly
        # natural (TH/2, 2, TW) reshape costs ~0.06 ms/4K-grid in relayout
        # (its minor (2, TW) dims occupy quarter-full vregs).
        f2 = sc.reshape(TH // 2, 2 * TW)
        rf = jnp.maximum(f2[:, :TW], f2[:, TW:])  # (TH/2, TW)

        # Lane-pair fold — completes the (lossless) 2x2 block-max reduction
        # IN the kernel, killing the XLA (1, 2) reduce_window pass that
        # previously finished it (~0.07 ms + a 28 MB plane round-trip per
        # 13 MP image on v5e). Strided slices and lane-splitting reshapes
        # don't lower on Mosaic, but per-vreg dynamic_gather does (the warp
        # kernel's workhorse): output block column c pairs input lanes
        # (2c, 2c+1), so each output 128-lane group g deinterleaves its two
        # source groups (2g, 2g+1) with the constant index vector
        # (2*lane) & 127 — lanes [0, 64) of the pair-max of group 2g,
        # lanes [64, 128) of group 2g+1's (where (2*lane) mod 128 lands on
        # exactly the right source lanes). ~7 vector ops per output vreg.
        lane = lax.broadcasted_iota(jnp.int32, (TH // 2, 128), 1)
        idx_e = (2 * lane) & 127
        idx_o = idx_e + 1
        first_half = lane < 64
        groups = []
        for g in range(TW // 256):
            s0 = rf[:, 256 * g : 256 * g + 128]
            s1 = rf[:, 256 * g + 128 : 256 * g + 256]
            p0 = jnp.maximum(
                jnp.take_along_axis(s0, idx_e, axis=1),
                jnp.take_along_axis(s0, idx_o, axis=1),
            )
            p1 = jnp.maximum(
                jnp.take_along_axis(s1, idx_e, axis=1),
                jnp.take_along_axis(s1, idx_o, axis=1),
            )
            groups.append(jnp.where(first_half, p0, p1))
        out_ref[0] = jnp.concatenate(groups, axis=1)  # (TH/2, TW/2)

    return kernel


def _scores_batched(
    imgs_u8: jnp.ndarray, h: int, w: int, k: float, nms_thresh: float,
    pack_mode: "str | None",
):
    """(B, H, W, 3) u8 -> batched score map(s) via one (B, nti, ntj)-grid
    kernel launch (the batch rides the leading grid axis; DMA prefetch
    streams straight across image boundaries)."""
    emit_packed = pack_mode is not None
    nb = imgs_u8.shape[0]
    padded = pad_bgr(imgs_u8)
    nti = -(-h // TH)
    ntj = -(-w // TW)
    out_specs = pl.BlockSpec(
        (1, TH // 2, TW // 2), lambda b, i, j: (b, i, j),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct(
        (nb, nti * TH // 2, ntj * TW // 2), jnp.float32
    )
    if emit_packed:
        out_specs = [
            out_specs,
            pl.BlockSpec(
                (1, TH, TW), lambda b, i, j: (b, i, j),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((nb, nti * TH, ntj * TW), jnp.int32),
        ]
    return pl.pallas_call(
        _make_kernel(
            h, w, float(k), float(nms_thresh), nti, ntj, nb,
            pack_mode=pack_mode,
        ),
        grid=(nb, nti, ntj),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, 3, WIN_R, WIN_C), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(padded)


@functools.lru_cache(maxsize=None)
def _scores_fn(h: int, w: int, k: float, nms_thresh: float, pack_mode):
    """Single-image scores function with a custom vmap rule: batching maps
    to the natively-batched kernel launch instead of jax's generic
    pallas_call batching (which cannot lower ANY-memory-space inputs on
    Mosaic — the sharded entry points vmap this via harris_detect)."""
    emit_packed = pack_mode is not None

    @jax.custom_batching.custom_vmap
    def f(img):
        out = _scores_batched(img[None], h, w, k, nms_thresh, pack_mode)
        if emit_packed:
            return out[0][0], out[1][0]
        return out[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, img):  # noqa: ARG001
        assert in_batched[0], "harris_scores vmap: image must be batched"
        out = _scores_batched(img, h, w, k, nms_thresh, pack_mode)
        return (tuple(out), (True, True)) if emit_packed else (out, True)

    return f


@functools.partial(
    jax.jit, static_argnames=("h", "w", "k", "nms_thresh", "pack_mode")
)
def harris_scores(
    img_u8: jnp.ndarray, h: int, w: int, k: float, nms_thresh: float,
    pack_mode: "str | None" = None,
):
    """Fused NMS'd Harris score map from the raw BGR u8 image (gray
    conversion happens inside the kernel).

    `img_u8` is the (H, W, 3) u8 image (un-padded); returns the 2x2
    BLOCK-FOLDED (round_up(H, TH) / 2, round_up(W, TW) / 2) score map —
    slot (r, c) is the (lossless, see module docstring) max over pixel
    block {2r, 2r+1} x {2c, 2c+1} — with -inf at non-peaks and everywhere
    outside the image. With pack_mode set ("plain" /
    "warp_const" / "warp_ramp", see _make_kernel), returns
    (scores, packed) where packed is the full-resolution (round_up(H, TH),
    round_up(W, TW)) i32 b|g<<8|r<<16 plane
    (zeros outside the image) — the descriptor-gather source, emitted here
    because the BGR tile is already in VMEM (kills a separate XLA
    convert+pack pass over the full image). The warp modes additionally
    make the plane a drop-in pallas_warp source (shifted + alpha byte).

    vmap-safe: batching lowers to ONE (B, nti, ntj)-grid kernel (see
    _scores_fn), so the sharded batch paths run the real Mosaic kernel.
    """
    return _scores_fn(h, w, float(k), float(nms_thresh), pack_mode)(img_u8)
