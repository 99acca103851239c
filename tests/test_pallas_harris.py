"""Pallas fused Harris-scores kernel vs the XLA chain (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.pallas import tpu as pltpu

from pano_tpu.config import HarrisOptions
from pano_tpu.ops import harris as H
from pano_tpu.ops import pallas_harris as PH


def xla_scores(img, opts):
    h, w = img.shape[:2]
    gray = H.bgr_to_gray_f32(jnp.asarray(img))
    resp = H.harris_response(gray, opts.k)
    nmax = H._neighbor_max(resp, 3)
    ys = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = (ys >= 1) & (ys < h - 1) & (xs >= 1) & (xs < w - 1)
    return np.asarray(
        jnp.where(
            (resp > opts.nms_thresh) & (resp > nmax) & border, resp, -jnp.inf
        )
    )


def kernel_scores(img, opts):
    h, w = img.shape[:2]
    with pltpu.force_tpu_interpret_mode():
        s = PH.harris_scores(
            jnp.asarray(img), h, w, opts.k, opts.nms_thresh
        )
    return np.asarray(s)


def blockfold(scores):
    """The kernel epilogue's lossless 2x2 block max (see pallas_harris):
    fold the full-resolution oracle plane the same way for comparison."""
    pr, pc = scores.shape[0] % 2, scores.shape[1] % 2
    if pr or pc:
        scores = np.pad(
            scores, ((0, pr), (0, pc)), constant_values=-np.inf
        )
    rf = np.maximum(scores[0::2], scores[1::2])
    return np.maximum(rf[:, 0::2], rf[:, 1::2])


def test_kernel_matches_xla_scores(rng):
    img = rng.integers(0, 256, (150, 600, 3), dtype=np.uint8)  # 2x2 tiles
    opts = HarrisOptions()
    want = blockfold(xla_scores(img, opts))
    got = kernel_scores(img, opts)
    h, w = img.shape[:2]
    h2, w2 = (h + 1) // 2, (w + 1) // 2
    # Outside-image padding is -inf.
    assert np.all(np.isneginf(got[h2:, :]))
    assert np.all(np.isneginf(got[:, w2:]))
    got = got[:h2, :w2]
    same_peaks = np.isneginf(got) == np.isneginf(want)
    # f32 associativity differences may flip borderline peaks; demand near-
    # perfect agreement and close values on shared peaks.
    assert same_peaks.mean() > 0.9995, same_peaks.mean()
    both = ~np.isneginf(got) & ~np.isneginf(want)
    if both.any():
        # The kernel's in-VMEM gray conversion can round half-boundary
        # pixels ±1 differently than the XLA chain's contraction order
        # (both are valid cv2 emulations, see bgr_to_gray_f32) — a ±1 gray
        # step moves the response by up to ~1% locally on a small fraction
        # of peaks; everything else must agree to f32 accumulation noise.
        rel = np.abs(got[both] - want[both]) / np.maximum(
            np.abs(want[both]), 1.0
        )
        assert (rel > 2e-4).mean() < 0.005, (rel > 2e-4).mean()
        assert rel.max() < 0.02, rel.max()


def test_kernel_border_semantics(rng):
    """Gradients are zeroed outside [1, dim-2] exactly like the reference's
    zero-border convolution — peaks at x==2 must agree with the XLA chain."""
    img = rng.integers(0, 256, (130, 520, 3), dtype=np.uint8)
    opts = HarrisOptions()
    want = blockfold(xla_scores(img, opts))
    got = kernel_scores(img, opts)[:65, :260]
    # Border ring: identical peak classification.
    np.testing.assert_array_equal(
        np.isneginf(got[:, :4]), np.isneginf(want[:, :4])
    )
    np.testing.assert_array_equal(
        np.isneginf(got[:4, :]), np.isneginf(want[:4, :])
    )


def test_emit_packed_plane(img=None):
    """pack_mode="plain": the kernel's packed plane must equal the XLA
    b|g<<8|r<<16 packing on real pixels (zeros in tile padding), and the
    score map must be unchanged."""
    r = np.random.default_rng(3)
    im = r.integers(0, 256, (150, 300, 3)).astype(np.uint8)
    h, w = im.shape[:2]
    with pltpu.force_tpu_interpret_mode():
        scores, packed = PH.harris_scores(
            jnp.asarray(im), h, w, 0.04, 1e8, pack_mode="plain"
        )
        ref_scores = PH.harris_scores(jnp.asarray(im), h, w, 0.04, 1e8)
    scores, packed = np.asarray(scores), np.asarray(packed)
    np.testing.assert_array_equal(scores, np.asarray(ref_scores))

    p32 = im.astype(np.int64)
    ref_pk = p32[..., 0] | (p32[..., 1] << 8) | (p32[..., 2] << 16)
    np.testing.assert_array_equal(packed[:h, :w], ref_pk)
    assert (packed[h:] == 0).all() and (packed[:, w:] == 0).all()


def test_warp_pack_modes_match_pack_bgra():
    """pack_mode="warp_const"/"warp_ramp": the emitted plane must be
    bit-identical to ops/pallas_warp.pack_bgra (the warp kernel's packed
    source contract — 1-px border shift + alpha byte) over the region the
    two plane sizes share."""
    from pano_tpu.ops import pallas_warp as PW
    from pano_tpu.ops import warp as W

    r = np.random.default_rng(4)
    im = r.integers(0, 256, (150, 600, 3)).astype(np.uint8)
    h, w = im.shape[:2]
    for mode, alpha in (
        ("warp_const", None),
        ("warp_ramp", W._edge_ramp(h, w)),
    ):
        with pltpu.force_tpu_interpret_mode():
            _, plane = PH.harris_scores(
                jnp.asarray(im), h, w, 0.04, 1e8, pack_mode=mode
            )
        ref = np.asarray(PW.pack_bgra(jnp.asarray(im), alpha))
        plane = np.asarray(plane)
        hc = min(plane.shape[0], ref.shape[0])
        wc = min(plane.shape[1], ref.shape[1])
        # the kernel plane must cover the bordered image
        assert hc >= h + 2 and wc >= w + 2, (plane.shape, ref.shape)
        np.testing.assert_array_equal(plane[:hc, :wc], ref[:hc, :wc])
        assert (plane[hc:] == 0).all() and (plane[:, wc:] == 0).all()


def test_vmapped_scores_match_per_image():
    """jax.vmap(harris_scores) must hit the custom_vmap rule (one natively
    batched kernel launch) and agree bit-for-bit with per-image calls —
    the contract the vmapped sharded entry points depend on."""
    r = np.random.default_rng(7)
    imgs = r.integers(0, 256, (2, 150, 600, 3)).astype(np.uint8)
    h, w = imgs.shape[1:3]
    with pltpu.force_tpu_interpret_mode():
        sv, pv = jax.vmap(
            lambda im: PH.harris_scores(im, h, w, 0.04, 1e8,
                                        pack_mode="plain")
        )(jnp.asarray(imgs))
        for i in range(2):
            si, pi = PH.harris_scores(
                jnp.asarray(imgs[i]), h, w, 0.04, 1e8, pack_mode="plain"
            )
            np.testing.assert_array_equal(np.asarray(sv[i]), np.asarray(si))
            np.testing.assert_array_equal(np.asarray(pv[i]), np.asarray(pi))
