"""Parity tests for ops/pallas_compose vs the XLA blend epilogue
(ops/warp.blend_window_outputs), interpret mode on CPU.

The compose kernel is the single-pass replacement for the
broadcast + dynamic-update-slice epilogue; it must reproduce the XLA
path bit-for-bit (overlay) / within rounding (feather) for tile-aligned
placements — including ragged left edges and windows touching the canvas
border. The on-hardware twin lives in tests/test_tpu_kernels.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pano_tpu.ops import warp as warp_ops
from pano_tpu.ops.pallas_compose import compose_canvas


def _mk_case(seed, hl, wl, win_h, win_w, ty, tx, wy0, wx0):
    rng = np.random.default_rng(seed)
    left = rng.integers(0, 255, (hl, wl, 3), np.uint8)
    # Packed warped window: random u8 RGB with black (invalid) patches.
    rgb = rng.integers(0, 2**24, (win_h, win_w), np.int64).astype(np.int32)
    hole = rng.random((win_h, win_w)) < 0.3
    rgb = np.where(hole, 0, rgb)
    w = np.where(hole, 0.0, rng.random((win_h, win_w))).astype(np.float32)
    return (
        jnp.asarray(left),
        jnp.asarray(rgb),
        jnp.asarray(w),
        jnp.asarray(ty, jnp.int32),
        jnp.asarray(tx, jnp.int32),
        jnp.asarray(wy0, jnp.int32),
        jnp.asarray(wx0, jnp.int32),
    )


CASES = [
    # (hl, wl, win, ty, tx, wy0, wx0, pad) — ragged left sizes, window at
    # origin / interior / flush against the canvas edge, left offset both
    # zero and nonzero. Contract: y placements are BTY (128) multiples,
    # x placements and win_w/pad_w BTX (256) multiples.
    (100, 200, (128, 256), 0, 0, 0, 0, (256, 512)),
    (130, 140, (128, 256), 128, 256, 0, 256, (384, 512)),
    (128, 128, (256, 256), 0, 256, 128, 256, (384, 512)),
    (250, 120, (128, 256), 128, 0, 256, 0, (384, 512)),
]


@pytest.mark.parametrize("blend", ["overlay", "feather"])
@pytest.mark.parametrize("case", list(enumerate(CASES)))
def test_compose_matches_xla_epilogue(blend, case):
    idx, case = case
    hl, wl, (win_h, win_w), ty, tx, wy0, wx0, (pad_h, pad_w) = case
    left, rgb, w, tyj, txj, wyj, wxj = _mk_case(
        1000 * idx + (7 if blend == "feather" else 0),
        hl, wl, win_h, win_w, ty, tx, wy0, wx0
    )

    oracle, _ = jax.jit(
        warp_ops.blend_window_outputs,
        static_argnames=("out_h", "out_w", "win_h", "win_w", "blend", "gain"),
    )(
        left, rgb, w, txj, tyj, wxj, wyj,
        out_h=pad_h, out_w=pad_w, win_h=win_h, win_w=win_w, blend=blend,
    )
    oracle = np.asarray(oracle)

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            compose_canvas(
                left, rgb, w if blend == "feather" else None,
                tyj, txj, wyj, wxj, pad_h, pad_w, blend,
            )
        )

    assert got.shape == oracle.shape
    if blend == "overlay":
        np.testing.assert_array_equal(got, oracle)
    else:
        # Feather: same math, different fp contraction order -> +-1 u8.
        d = np.abs(got.astype(int) - oracle.astype(int))
        assert d.max() <= 1, d.max()
        assert (d > 0).mean() < 0.02


def test_compose_rejects_multiband():
    left, rgb, w, tyj, txj, wyj, wxj = _mk_case(0, 128, 128, 128, 256, 0, 0, 0, 0)
    with pytest.raises(ValueError):
        compose_canvas(left, rgb, w, tyj, txj, wyj, wxj, 256, 256, "multiband")


@pytest.mark.parametrize("blend", ["overlay", "feather"])
def test_compose_chain_matches_xla_epilogue(blend):
    """compose_chain_canvas vs blend_window_outputs' chain branch (left IS
    the canvas, explicit w_left_win, weight writeback)."""
    from pano_tpu.ops.pallas_compose import compose_chain_canvas

    rng = np.random.default_rng(17)
    pad_h, pad_w = 384, 512
    win_h, win_w = 256, 256
    wy0, wx0 = 128, 256
    canvas = jnp.asarray(
        rng.integers(0, 255, (pad_h, pad_w, 3), np.uint8)
    )
    wcan = jnp.asarray(
        np.where(rng.random((pad_h, pad_w)) < 0.5, 0.0,
                 rng.random((pad_h, pad_w))), jnp.float32
    )
    rgb = rng.integers(0, 2**24, (win_h, win_w)).astype(np.int32)
    hole = rng.random((win_h, win_w)) < 0.3
    rgb = jnp.asarray(np.where(hole, 0, rgb))
    w = jnp.asarray(
        np.where(hole, 0.0, rng.random((win_h, win_w))), jnp.float32
    )
    s = lambda v: jnp.asarray(v, jnp.int32)

    w_left_win = jax.lax.dynamic_slice(
        wcan, (s(wy0), s(wx0)), (win_h, win_w)
    )
    oracle, new_w = jax.jit(
        warp_ops.blend_window_outputs,
        static_argnames=("out_h", "out_w", "win_h", "win_w", "blend", "gain"),
    )(
        canvas, rgb, w, s(0), s(0), s(wx0), s(wy0),
        out_h=pad_h, out_w=pad_w, win_h=win_h, win_w=win_w, blend=blend,
        w_left_win=w_left_win,
    )
    oracle_wcan = jax.lax.dynamic_update_slice(wcan, new_w, (s(wy0), s(wx0)))

    with pltpu.force_tpu_interpret_mode():
        got, got_w = compose_chain_canvas(
            canvas, wcan, rgb, w, s(wy0), s(wx0), blend
        )

    got, got_w = np.asarray(got), np.asarray(got_w)
    np.testing.assert_allclose(got_w, np.asarray(oracle_wcan), rtol=1e-6)
    oracle = np.asarray(oracle)
    if blend == "overlay":
        np.testing.assert_array_equal(got, oracle)
    else:
        d = np.abs(got.astype(int) - oracle.astype(int))
        assert d.max() <= 1, d.max()
