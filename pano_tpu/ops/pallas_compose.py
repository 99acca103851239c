"""Pallas canvas-composition kernel: the whole composite epilogue in one pass.

The reference composites on the host with two loops — copy the left image
onto the canvas (src/serial/main.cpp:375-377) and overlay-blend the warped
right (src/serial/main.cpp:380-386). The XLA port of that epilogue
(ops/warp.py blend_window_outputs) is three canvas-sized passes —
zero-broadcast, dynamic-update-slice of the left, dynamic-update-slice of
the blended window — and because the placement offsets are runtime values,
XLA's dynamic-update-slice emits its general unaligned read-modify-write
path: ~3.3 ms of the 4K pair stitch for what is ~260 MB of HBM traffic
(~0.35 ms at speed of light on v5e).

This kernel replaces all of it with ONE grid pass over the padded canvas.
The enabler is the tile-aligned frame layout established by
pipeline._fused_compose_impl: the left placement (ty, tx) and the warp
window origin (wy0, wx0) are multiples of the kernel's (BTY, BTX) =
(128, 256) block tiling, so every input block maps onto an output block
through a pure block-index shift (scalar-prefetch index_maps) — no halos,
no manual DMA, and Pallas's automatic pipelining double-buffers
everything. Per (BTY, BTX) canvas tile:

  * base = the left image's pixels if the tile overlaps the translated
    left rectangle (pixel mask for the ragged edge), else zeros;
  * if the tile lies in the warp window, blend the Pallas-warped packed
    RGB (and weight map) with the base — overlay (reference semantics,
    src/serial/main.cpp:380-386) or feather (the left feather weight is
    computed analytically from the edge-distance ramp, bit-matching
    ops/warp._edge_ramp); tiles outside the window are a pure u8 copy.

Channel layout: the canvas is produced as (3, H, W) — exactly the
physical {1,0,2} layout XLA uses for u8 HWC images on TPU — and
transposed back to (H, W, 3) by a layout-only bitcast.

Multiband blending and gain compensation also land here: the pipeline
computes their window-local context (pyramid blend / gain scalar over the
warp window only, pipeline._fused_compose_impl) and pastes the result
through this kernel with overlay semantics — no canvas-sized XLA epilogue
remains on any blend mode.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BT = 128  # canvas tile (must match the alignment in pipeline._fused_compose_impl)
# Rectangular kernel tiles: the y-axis block stays at the 128-px placement
# alignment (window heights / ty / wy0 are 128-multiples), while the x-axis
# block is wider — canvas widths, window widths, tx and wx0 are all already
# 256-multiples on the kernel paths (pipeline pads widths to
# lcm(canvas_bucket, pallas_warp.TW) and rounds x placements to BTX), and a
# (128, 256) block halves the grid-step/DMA-issue count of the mostly-copy
# pass. Measured on the 4864x8448 mountain canvas (v5e, same-session A/B,
# bit-identical outputs): 3.47 -> 2.9 ms standalone wall.
BTY = BT
BTX = 256


def _blend_tile(base, w_l, rgb, w_r, blend):
    """Blend one (3, BTY, BTX) u8 base tile with a packed warped tile —
    the in-kernel twin of ops/warp.blend_window_outputs' per-pixel math,
    shared by the pair and chain kernels so the semantics cannot drift.

    Returns the blended (3, BT, BT) u8 stack."""
    if blend == "overlay":
        # Any non-(0,0,0) warped pixel overwrites the canvas
        # (src/serial/main.cpp:380-386).
        nb = rgb != 0
        chans = []
        for shift in (0, 8, 16):
            wc = ((rgb >> shift) & 0xFF).astype(jnp.uint8)
            chans.append(jnp.where(nb, wc, base[shift // 8]))
        return jnp.stack(chans)
    # feather — mirrors ops/warp.blend_window_outputs exactly.
    # Mosaic has no u8 <-> f32 casts; hop through i32 both ways.
    l_f = base.astype(jnp.int32).astype(jnp.float32)
    total = jnp.maximum(w_l + w_r, 1e-6)
    only_left = w_r <= 0.0
    only_right = (w_l <= 0.0) & (w_r > 0.0)
    chans = []
    for shift in (0, 8, 16):
        r_f = ((rgb >> shift) & 0xFF).astype(jnp.float32)
        b_f = (l_f[shift // 8] * w_l + r_f * w_r) / total
        b_f = jnp.where(only_left, l_f[shift // 8], b_f)
        b_f = jnp.where(only_right, r_f, b_f)
        chans.append(
            jnp.clip(jnp.round(b_f), 0.0, 255.0)
            .astype(jnp.int32).astype(jnp.uint8)
        )
    return jnp.stack(chans)


def _compose_kernel(
    sref,          # (4,) i32: [ty_blk, tx_blk, wy_blk, wx_blk]
    left_ref,      # (3, BTY, BTX) u8 block of the left image (clamped index)
    rgb_ref,       # (BTY, BTX) s32 block of the packed warped window
    *w_and_out,    # feather: (w_ref, out_ref); overlay: (out_ref,) — the
    #                weight input is omitted entirely for overlay (it never
    #                reads it; streaming a zeros window would be dead HBM
    #                traffic on the hot fused path)
    blend: str,
    hl: int,
    wl: int,
    nlb_y: int,    # ceil(hl / BTY) — left block extents
    nlb_x: int,    # ceil(wl / BTX)
    nwb_y: int,    # win_h // BTY — window block extents
    nwb_x: int,    # win_w // BTX
):
    if blend == "overlay":
        w_ref, (out_ref,) = None, w_and_out
    else:
        w_ref, out_ref = w_and_out
    gi = pl.program_id(0)
    gj = pl.program_id(1)
    ty_b, tx_b = sref[0], sref[1]
    wy_b, wx_b = sref[2], sref[3]

    in_left = (
        (gi >= ty_b) & (gi < ty_b + nlb_y)
        & (gj >= tx_b) & (gj < tx_b + nlb_x)
    )
    in_win = (
        (gi >= wy_b) & (gi < wy_b + nwb_y)
        & (gj >= wx_b) & (gj < wx_b + nwb_x)
    )

    # Left-space pixel coords of this tile (valid only when in_left).
    ly = (
        lax.broadcasted_iota(jnp.int32, (BTY, BTX), 0)
        + (gi - ty_b) * BTY
    )
    lx = (
        lax.broadcasted_iota(jnp.int32, (BTY, BTX), 1)
        + (gj - tx_b) * BTX
    )
    left_px = in_left & (ly < hl) & (lx < wl)  # ragged right/bottom edge

    lb = left_ref[...]  # (3, BT, BT) u8; garbage when not in_left (masked)
    base = jnp.where(left_px[None, :, :], lb, jnp.uint8(0))

    @pl.when(jnp.logical_not(in_win))
    def _outside():
        out_ref[...] = base

    @pl.when(in_win)
    def _inside():
        rgb = rgb_ref[...]
        if blend == "overlay":
            w_l = w_r = None
        else:
            # Analytic left feather weight: the edge-distance ramp
            # (ops/warp._edge_ramp) masked by coverage and nonblack pixels.
            nb_l = (base[0] | base[1] | base[2]) != 0
            lyf = ly.astype(jnp.float32)
            lxf = lx.astype(jnp.float32)
            # Same division as _edge_ramp (not a reciprocal multiply) so
            # the ramp is bit-identical to the XLA path's.
            ramp = jnp.minimum(
                jnp.minimum(lxf + 1.0, wl - lxf),
                jnp.minimum(lyf + 1.0, hl - lyf),
            ) / (min(hl, wl) / 2.0)
            w_l = jnp.where(left_px & nb_l, ramp, 0.0)
            w_r = w_ref[...]
        out_ref[...] = _blend_tile(base, w_l, rgb, w_r, blend)


def _compose_chain_kernel(
    sref,          # (2,) i32: [wy_blk, wx_blk]
    canvas_ref,    # (3, BTY, BTX) u8 block of the accumulated canvas
    wcan_ref,      # (BTY, BTX) f32 block of the accumulated weight canvas
    rgb_ref,       # (BTY, BTX) s32 block of the packed warped window
    w_ref,         # (BTY, BTX) f32 block of the warped weight
    out_ref,       # (3, BTY, BTX) u8
    wout_ref,      # (BTY, BTX) f32
    *,
    blend: str,
    nwb_y: int,
    nwb_x: int,
):
    gi = pl.program_id(0)
    gj = pl.program_id(1)
    wy_b, wx_b = sref[0], sref[1]
    in_win = (
        (gi >= wy_b) & (gi < wy_b + nwb_y)
        & (gj >= wx_b) & (gj < wx_b + nwb_x)
    )

    cb = canvas_ref[...]
    wb = wcan_ref[...]

    @pl.when(jnp.logical_not(in_win))
    def _outside():
        out_ref[...] = cb
        wout_ref[...] = wb

    @pl.when(in_win)
    def _inside():
        w_r = w_ref[...]
        # feather blends against the EXACT accumulated weight canvas (wb).
        out_ref[...] = _blend_tile(cb, wb, rgb_ref[...], w_r, blend)
        wout_ref[...] = jnp.maximum(wb, w_r)


@functools.partial(jax.jit, static_argnames=("blend",))
def compose_chain_canvas(
    canvas: jnp.ndarray,        # (pad_h, pad_w, 3) uint8 accumulated canvas
    weight_canvas: jnp.ndarray,  # (pad_h, pad_w) f32 accumulated coverage
    rgb_win: jnp.ndarray,       # (win_h, win_w) int32 packed warped RGB
    w_win: jnp.ndarray,         # (win_h, win_w) f32 warped weight
    wy0: jnp.ndarray,           # () int32 window origin — multiple of BTY
    wx0: jnp.ndarray,           # () int32 — multiple of BTX
    blend: str = "overlay",
) -> tuple:
    """Chain-mode composite step: blend one warped window into the
    accumulated canvas + weight canvas, one pass over both. Mirrors
    ops/warp.blend_window_outputs with an explicit w_left_win (the chain
    branch) — pad_h/pad_w come from the canvas shape.

    Returns (canvas, weight_canvas) updated."""
    pad_h, pad_w = weight_canvas.shape
    assert pad_h % BTY == 0 and pad_w % BTX == 0, (pad_h, pad_w)
    win_h, win_w = rgb_win.shape
    assert win_h % BTY == 0 and win_w % BTX == 0, (win_h, win_w)
    if blend not in ("overlay", "feather"):
        raise ValueError(f"unsupported pallas chain blend: {blend}")

    canvas_chw = jnp.transpose(canvas, (2, 0, 1))
    scalars = jnp.stack([wy0 // BTY, wx0 // BTX]).astype(jnp.int32)
    grid = (pad_h // BTY, pad_w // BTX)

    def win_map(gi, gj, s):
        return (
            jnp.clip(gi - s[0], 0, win_h // BTY - 1),
            jnp.clip(gj - s[1], 0, win_w // BTX - 1),
        )

    kernel = functools.partial(
        _compose_chain_kernel,
        blend=blend,
        nwb_y=win_h // BTY,
        nwb_x=win_w // BTX,
    )
    out, wout = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((3, BTY, BTX), lambda gi, gj, s: (0, gi, gj)),
                pl.BlockSpec((BTY, BTX), lambda gi, gj, s: (gi, gj)),
                pl.BlockSpec((BTY, BTX), win_map),
                pl.BlockSpec((BTY, BTX), win_map),
            ],
            out_specs=[
                pl.BlockSpec((3, BTY, BTX), lambda gi, gj, s: (0, gi, gj)),
                pl.BlockSpec((BTY, BTX), lambda gi, gj, s: (gi, gj)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((3, pad_h, pad_w), jnp.uint8),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
        ],
    )(scalars, canvas_chw, weight_canvas, rgb_win, w_win)
    return jnp.transpose(out, (1, 2, 0)), wout


@functools.partial(
    jax.jit, static_argnames=("pad_h", "pad_w", "blend")
)
def compose_canvas(
    left: jnp.ndarray,          # (hl, wl, 3) uint8
    rgb_win: jnp.ndarray,       # (win_h, win_w) int32 packed warped RGB
    w_win: Optional[jnp.ndarray],  # (win_h, win_w) f32 (feather), or None
    ty: jnp.ndarray,            # () int32 left placement — multiple of BTY
    tx: jnp.ndarray,            # () int32 — multiple of BTX
    wy0: jnp.ndarray,           # () int32 window origin — multiple of BTY
    wx0: jnp.ndarray,           # () int32 — multiple of BTX
    pad_h: int,                 # static canvas dims — pad_h % BTY == 0,
    pad_w: int,                 # pad_w % BTX == 0
    blend: str = "overlay",
) -> jnp.ndarray:
    """One-pass composite: returns the (pad_h, pad_w, 3) uint8 canvas."""
    assert pad_h % BTY == 0 and pad_w % BTX == 0, (pad_h, pad_w)
    hl, wl = left.shape[:2]
    win_h, win_w = rgb_win.shape
    assert win_h % BTY == 0 and win_w % BTX == 0, (win_h, win_w)
    if blend not in ("overlay", "feather"):
        raise ValueError(f"unsupported pallas blend: {blend}")
    if blend == "feather" and w_win is None:
        raise ValueError("feather blend needs w_win")

    # (hl, wl, 3) u8 lives as {1,0,2} (planar) on TPU, so this transpose to
    # the pallas-friendly (3, hl, wl) is a layout bitcast, not a copy.
    left_chw = jnp.transpose(left, (2, 0, 1))

    nlb_y = -(-hl // BTY)
    nlb_x = -(-wl // BTX)
    scalars = jnp.stack(
        [ty // BTY, tx // BTX, wy0 // BTY, wx0 // BTX]
    ).astype(jnp.int32)

    grid = (pad_h // BTY, pad_w // BTX)

    def left_map(gi, gj, s):
        return (
            0,
            jnp.clip(gi - s[0], 0, nlb_y - 1),
            jnp.clip(gj - s[1], 0, nlb_x - 1),
        )

    def win_map(gi, gj, s):
        return (
            jnp.clip(gi - s[2], 0, win_h // BTY - 1),
            jnp.clip(gj - s[3], 0, win_w // BTX - 1),
        )

    kernel = functools.partial(
        _compose_kernel,
        blend=blend,
        hl=hl,
        wl=wl,
        nlb_y=nlb_y,
        nlb_x=nlb_x,
        nwb_y=win_h // BTY,
        nwb_x=win_w // BTX,
    )
    in_specs = [
        pl.BlockSpec((3, BTY, BTX), left_map),
        pl.BlockSpec((BTY, BTX), win_map),
    ]
    operands = [scalars, left_chw, rgb_win]
    if blend != "overlay":  # overlay never reads the weight input
        in_specs.append(pl.BlockSpec((BTY, BTX), win_map))
        operands.append(w_win)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (3, BTY, BTX), lambda gi, gj, s: (0, gi, gj)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((3, pad_h, pad_w), jnp.uint8),
    )(*operands)
    # Back to HWC — again a layout bitcast on TPU.
    return jnp.transpose(out, (1, 2, 0))
