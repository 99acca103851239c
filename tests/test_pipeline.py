"""Integration tests: full pair stitch on synthetic pairs with known
ground-truth homography (stitchTwoImages/stitchAllImages semantics,
src/serial/main.cpp:311-414)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pano_tpu.config import DEFAULT_CONFIG, HarrisOptions, PanoConfig, RansacOptions
from pano_tpu import pipeline
from pano_tpu.pipeline import PairStitcher, stitch_all_images

SMALL = PanoConfig(
    harris=HarrisOptions(max_keypoints=512),
    ransac=RansacOptions(num_iterations=500),
)


def checkerboard_texture(h, w, seed=0):
    """Dense structured texture with strong corners on a noisy background.

    Density matters: re-detected panoramas are bilinear-resampled, and a
    sparse texture on a flat background leaves too few unambiguous patches
    for the second fold step (mirrors why the reference works best on
    feature-rich photographs)."""
    r = np.random.default_rng(seed)
    img = r.integers(0, 60, (h, w, 3)).astype(np.uint8)
    for _ in range(max(60, h * w // 150)):
        y, x = r.integers(2, h - 10), r.integers(2, w - 10)
        img[y : y + 6, x : x + 6] = r.integers(60, 255, 3)
    return img


def translated_pair(h=128, w=160, shift=48, seed=0):
    base = checkerboard_texture(h, w + shift, seed)
    return base[:, shift:].copy(), base[:, :w].copy()  # (left, right)


def test_estimate_homography_translation():
    # right image content appears `shift` px to the right in left frame:
    # H(right->left) should be x -> x + shift... construct carefully:
    # left = base[:, shift:], right = base[:, :w]. Pixel (x, y) in right
    # equals base(x, y); in left it is at x - shift. So H maps x -> x - shift.
    left, right = translated_pair()
    stitcher = PairStitcher(SMALL, print_timing=False)
    h = stitcher.estimate_homography(
        jnp.asarray(left), jnp.asarray(right)
    )
    assert h is not None
    h = h / h[2, 2]
    np.testing.assert_allclose(h[0, 2], -48.0, atol=1.0)
    np.testing.assert_allclose(
        h[:2, :2], np.eye(2), atol=0.02
    )
    np.testing.assert_allclose(h[1, 2], 0.0, atol=1.0)


def test_stitch_pair_produces_panorama():
    left, right = translated_pair()
    stitcher = PairStitcher(SMALL, print_timing=False)
    pano = stitcher.stitch_pair(jnp.asarray(left), jnp.asarray(right))
    assert pano is not None
    pano = np.asarray(pano)
    # Canvas must be wider than either input but no wider than the union
    # (+/- a pixel of estimation slack in the warped corner bounds).
    assert 128 <= pano.shape[0] <= 131
    assert 160 < pano.shape[1] <= 160 + 48 + 3
    # The panorama must reproduce the underlying base mosaic. The overlay
    # canvas has two differently-aligned regions (the reference-inherited 1px
    # truncation quirk: exact -minX in the warp translation vs int-truncated
    # ROI placement, src/serial/main.cpp:366-376), so check them separately.
    base = checkerboard_texture(128, 160 + 48, seed=0)  # == translated_pair base
    # 1) Warped-right-covered region (canvas x < ~155): aligned with base.
    bad_right = (
        np.abs(
            pano[:128, :150].astype(int) - base[:128, :150].astype(int)
        ).max(axis=-1)
        > 30
    ).mean()
    assert bad_right < 0.05, bad_right
    # 2) Left-only region (canvas x > 160): the left image verbatim at an
    # integer offset near (0, 48).
    best_left = min(
        (
            pano[ty : ty + 128, tx + 120 : tx + 160].astype(int)
            != left[:, 120:160].astype(int)
        ).any(axis=-1).mean()
        for ty in (0, 1)
        for tx in (46, 47, 48, 49)
        if pano.shape[0] >= ty + 128 and pano.shape[1] >= tx + 160
    )
    assert best_left < 0.05, best_left


def test_stitch_all_left_fold_three_images():
    # 50% overlaps: comfortably above the minimal-overlap regime where
    # borderline f32 Harris ties can flip the keypoint set (the acceptance
    # gate for real images is statistical; this is a structural test).
    base = checkerboard_texture(128, 280, seed=2)
    imgs = [
        base[:, 0:140].copy(),
        base[:, 70:210].copy(),
        base[:, 140:280].copy(),
    ]
    pano = stitch_all_images(imgs, SMALL, print_timing=False)
    assert pano is not None
    assert pano.shape[0] >= 128
    assert pano.shape[1] >= 270  # covers nearly the full mosaic width


def test_stitch_all_chain_mode():
    base = checkerboard_texture(128, 280, seed=2)
    imgs = [
        base[:, 0:140].copy(),
        base[:, 70:210].copy(),
        base[:, 140:280].copy(),
    ]
    pano = stitch_all_images(imgs, SMALL, print_timing=False, mode="chain")
    assert pano is not None
    assert pano.shape[0] >= 128
    assert pano.shape[1] >= 270
    # Chain composites against originals: the mosaic should closely match.
    hmin = min(pano.shape[0], 128)
    d = np.abs(
        pano[:hmin, :270].astype(int) - base[:hmin, :270].astype(int)
    ).max(-1)
    assert (d > 30).mean() < 0.08, (d > 30).mean()


def test_stitch_all_chain_skips_failed_image():
    base = checkerboard_texture(128, 220, seed=3)
    flat = np.zeros((128, 140, 3), np.uint8)
    imgs = [base[:, 0:140].copy(), flat, base[:, 80:220].copy()]
    pano = stitch_all_images(imgs, SMALL, print_timing=False, mode="chain")
    # Failed middle image is skipped; image 3 re-anchors against image 1.
    assert pano is not None
    assert pano.shape[1] >= 210


def test_stitch_all_auto_mode_unordered():
    """Auto mode must recover the mosaic from SHUFFLED input order."""
    base = checkerboard_texture(128, 280, seed=4)
    imgs = [
        base[:, 140:280].copy(),   # rightmost first
        base[:, 0:140].copy(),     # leftmost second
        base[:, 70:210].copy(),    # middle last
    ]
    pano = stitch_all_images(imgs, SMALL, print_timing=False, mode="auto")
    assert pano is not None
    assert pano.shape[1] >= 270
    hmin = min(pano.shape[0], 128)
    d = np.abs(
        pano[:hmin, :270].astype(int) - base[:hmin, :270].astype(int)
    ).max(-1)
    assert (d > 30).mean() < 0.08, (d > 30).mean()


def test_auto_mode_graphs_memoized_across_calls():
    """A second auto job with the same config must re-trace NOTHING: the
    detect/pair graphs are config-memoized at module level (VERDICT r3 weak
    #2 — they used to be rebuilt inside stitch_all_images_auto on every
    call, re-tracing everything per serve job)."""
    base = checkerboard_texture(128, 280, seed=4)
    imgs = [
        base[:, 140:280].copy(),
        base[:, 0:140].copy(),
        base[:, 70:210].copy(),
    ]
    p1 = stitch_all_images(imgs, SMALL, print_timing=False, mode="auto")
    assert p1 is not None
    detect_fn, pair_fn = pipeline.get_auto_graphs(
        pipeline._platform_config(SMALL, None)
    )
    sizes = (detect_fn._cache_size(), pair_fn._cache_size())
    assert sizes[0] >= 1 and sizes[1] >= 1  # first job populated the caches
    hits0 = pipeline.get_auto_graphs.cache_info().hits
    p2 = stitch_all_images(imgs, SMALL, print_timing=False, mode="auto")
    assert p2 is not None
    assert pipeline.get_auto_graphs.cache_info().hits > hits0
    assert (detect_fn._cache_size(), pair_fn._cache_size()) == sizes
    np.testing.assert_array_equal(p1, p2)


def test_stitch_all_auto_disconnected_image_excluded():
    base = checkerboard_texture(128, 220, seed=6)
    unrelated = checkerboard_texture(128, 140, seed=99)
    imgs = [base[:, 0:140].copy(), base[:, 80:220].copy(), unrelated]
    pano = stitch_all_images(imgs, SMALL, print_timing=False, mode="auto")
    assert pano is not None
    # The unrelated image must not blow up the canvas.
    assert pano.shape[1] <= 260


def test_stitch_all_skips_failed_pair():
    base = checkerboard_texture(128, 220, seed=3)
    flat = np.zeros((128, 140, 3), np.uint8)  # featureless -> no matches
    imgs = [base[:, 0:140].copy(), flat, base[:, 80:220].copy()]
    pano = stitch_all_images(imgs, SMALL, print_timing=False)
    # Fold must survive the bad middle image (src/serial/main.cpp:404-407).
    assert pano is not None


def test_fused_stitch_matches_staged():
    """The single-dispatch fused stitch (device-side canvas math + pallas
    warp, interpret mode on CPU) must reproduce the staged path."""
    from jax.experimental.pallas import tpu as pltpu

    left, right = translated_pair()
    stitcher = PairStitcher(SMALL, print_timing=False)
    staged = np.asarray(
        stitcher.stitch_pair(jnp.asarray(left), jnp.asarray(right))
    )
    with pltpu.force_tpu_interpret_mode():
        packed_out, canvas, _ = stitcher._fused_stitch(0)(
            jnp.asarray(left), jnp.asarray(right)
        )
    v = np.asarray(packed_out)
    assert v[11] > 0.5, "RANSAC ok flag"
    assert v[18] > 0.5, "kernel envelope flag"
    ch, cw = int(v[16]), int(v[17])
    cy0, cx0 = int(v[19]), int(v[20])
    fused = np.asarray(canvas[cy0:cy0 + ch, cx0:cx0 + cw])
    assert fused.shape == staged.shape, (fused.shape, staged.shape)
    d = np.abs(fused.astype(int) - staged.astype(int)).max(-1)
    # XLA warp vs pallas two-pass warp: tiny resample deltas only.
    assert (d > 10).mean() < 0.02, (d.max(), (d > 10).mean())


def test_fused_multiband_keeps_true_black_content():
    """Multiband output can legitimately be exact (0,0,0) inside covered
    area (genuinely dark content). The fused path pastes the blended window
    with overlay semantics, which used to DROP those pixels — the base
    (left) canvas showed through as pinholes (VERDICT r3 weak #1). Staged
    path is the oracle: where it renders black, fused must too."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    left, right = translated_pair()
    right = right.copy()
    # True-black content ONLY in the right image (a dark object / exposure
    # difference), placed where the right image is the deeper feather side
    # of the overlap (left-frame x = 8..32, near the left image's own edge)
    # so the multiband seam mask prefers it: the blend there is exactly
    # black while the left pixels underneath are bright.
    right[40:80, 56:80] = 0
    cfg_mb = dataclasses.replace(
        SMALL,
        stitch=dataclasses.replace(SMALL.stitch, blend="multiband"),
    )
    stitcher = PairStitcher(cfg_mb, print_timing=False)
    staged = np.asarray(
        stitcher.stitch_pair(jnp.asarray(left), jnp.asarray(right))
    )
    with pltpu.force_tpu_interpret_mode():
        packed_out, canvas, _ = stitcher._fused_stitch(0)(
            jnp.asarray(left), jnp.asarray(right)
        )
    v = np.asarray(packed_out)
    assert v[11] > 0.5 and v[18] > 0.5, v[[11, 18]]
    ch, cw = int(v[16]), int(v[17])
    cy0, cx0 = int(v[19]), int(v[20])
    fused = np.asarray(canvas[cy0:cy0 + ch, cx0:cx0 + cw])
    # The fused path's integer-aligned translation can ceil the canvas one
    # pixel differently from the staged float translation on this scene.
    hh = min(fused.shape[0], staged.shape[0])
    ww = min(fused.shape[1], staged.shape[1])
    fused, staged = fused[:hh, :ww], staged[:hh, :ww]

    # Where the staged oracle renders (near-)black inside the dark patch,
    # the fused output must stay dark too — the dropout bug pasted the
    # BRIGHT left base through (measured pre-fix: bright showthrough up to
    # 255 on hundreds of these pixels; post-fix max 1-2).
    mask = np.zeros(staged.shape[:2], bool)
    mask[42:78, 58:78] = True
    mask &= staged.max(-1) <= 1
    assert mask.sum() > 200, mask.sum()  # the scenario actually happened
    assert fused[mask].max() <= 10, (
        f"pinholes: {(fused[mask].max(-1) > 10).sum()} px show through, "
        f"max {fused[mask].max()}"
    )
    # And the blend as a whole still matches the staged oracle.
    d = np.abs(fused.astype(int) - staged.astype(int)).max(-1)
    assert (d > 10).mean() < 0.02, (d.max(), (d > 10).mean())


def test_fused_stitch_flags_envelope_violation():
    """A homography outside the warp kernel's envelope must clear the `safe`
    flag so stitch_pair_fast falls back to the staged path."""
    from jax.experimental.pallas import tpu as pltpu

    # 30-degree rotation between the views: far beyond the kernel's
    # row-tilt budget (supports_homography rejects it too).
    import cv2

    left, right = translated_pair()
    th = np.deg2rad(30)
    rot = cv2.getRotationMatrix2D((80, 64), 30, 1.0)
    right_rot = cv2.warpAffine(right, rot, (160, 128))

    stitcher = PairStitcher(SMALL, print_timing=False)
    with pltpu.force_tpu_interpret_mode():
        packed_out, _, _ = stitcher._fused_stitch(0)(
            jnp.asarray(left), jnp.asarray(right_rot)
        )
    v = np.asarray(packed_out)
    if v[11] > 0.5:  # only meaningful if RANSAC found the rotated model
        h = v[:9].reshape(3, 3)
        # Rotation magnitude recovered -> envelope must reject.
        if abs(h[1, 0]) > 0.2:
            assert v[18] < 0.5, "expected kernel_safe=0 for 30deg rotation"


def test_fused_stitch_flags_canvas_overflow():
    """A vertical placement whose true canvas exceeds the panorama-shaped
    static padding (pad_h = hl + hr/2) must clear `safe` so
    stitch_pair_fast falls back to the exact staged path instead of
    silently truncating the panorama (ADVICE round-1 medium finding)."""
    from jax.experimental.pallas import tpu as pltpu

    # Vertical pair: right image's content sits mostly BELOW the left image
    # -> canvas_h ~= 352 + 448 = 800 > pad_h = round_up(400 + 224 + 130,
    # 128) = 768.
    base = checkerboard_texture(800, 160, seed=8)
    top = base[:400].copy()
    bottom = base[352:800].copy()  # 48 px overlap

    stitcher = PairStitcher(SMALL, print_timing=False)
    with pltpu.force_tpu_interpret_mode():
        packed_out, _, _ = stitcher._fused_stitch(1)(
            jnp.asarray(top), jnp.asarray(bottom)
        )
    v = np.asarray(packed_out)
    assert v[11] > 0.5, "RANSAC should solve the vertical translation"
    h = v[:9].reshape(3, 3)
    assert h[1, 2] > 250, h  # right maps ~284 px down
    assert v[18] < 0.5, "expected safe=0 for canvas overflow"

    # And the public path must still produce the full (untruncated) result
    # via the staged fallback.
    pano = stitcher.stitch_pair(jnp.asarray(top), jnp.asarray(bottom))
    assert pano is not None
    assert np.asarray(pano).shape[0] >= 790


def test_timing_lines_contract(capsys):
    """The stdout stage lines are a machine-readable API (SURVEY §1)."""
    left, right = translated_pair()
    stitcher = PairStitcher(SMALL, print_timing=True)
    stitcher.stitch_pair(jnp.asarray(left), jnp.asarray(right))
    out = capsys.readouterr().out
    import re

    for label in (
        "Harris Corner Detection",
        "Harris Corner Matching",
        "RANSAC Homography Estimation",
        "Image Stitching",
    ):
        assert re.search(rf"^{label}: \d+\.\d{{3}} ms$", out, re.M), label


def test_composite_global_weight_canvas_tracks_xla_steps():
    """The XLA fallback branch of composite_global must still record the
    composited image's coverage in the accumulated weight canvas — a later
    Pallas step feathers against it, and stale weights mis-place seams
    (on CPU every step takes the XLA branch, exercising exactly that
    update)."""
    from pano_tpu import pipeline

    base = checkerboard_texture(128, 360, seed=11)
    imgs = [
        np.asarray(base[:, 0:160]),
        np.asarray(base[:, 120:280]),
        np.asarray(base[:, 200:360]),
    ]
    # Exact global translations: image i content starts at x = offset_i in
    # the anchor frame.
    offs = [0.0, 120.0, 200.0]
    globals_h = []
    for off in offs:
        h = np.eye(3)
        h[0, 2] = off
        globals_h.append(h)
    devs = [jnp.asarray(im, jnp.uint8) for im in imgs]
    cfg = SMALL.replace(
        stitch=__import__("dataclasses").replace(SMALL.stitch, blend="feather")
    )
    weights = []
    pano = pipeline.composite_global(
        imgs, devs, globals_h, cfg, anchor=0, _weights_out=weights
    )
    assert pano is not None and pano.shape[1] >= 355
    w = weights[0]
    # Coverage must extend through every image's region, including the
    # XLA-composited non-anchor ones (x in [280, 360) is image 3 only).
    assert w[64, 80] > 0.0       # anchor region
    assert w[64, 250] > 0.0      # image 2 region (XLA branch)
    assert w[64, 340] > 0.0      # image 3-only region (XLA branch)
    # And unreachable canvas must stay uncovered.
    assert w[64, : 160].min() > 0.0


def test_auto_mode_single_fetch_for_match_graph(monkeypatch):
    """The local auto mode must pay exactly ONE host fetch for the whole
    n(n-1)/2 pair-estimation graph (each fetch costs 30-85 ms through the
    axon tunnel), mirroring its sharded twin."""
    from pano_tpu import pipeline

    base = checkerboard_texture(128, 280, seed=4)
    imgs = [
        np.asarray(base[:, 120:280]),
        np.asarray(base[:, 0:160]),
        np.asarray(base[:, 60:220]),
    ]
    calls = []
    real_fetch = pipeline._host_fetch
    monkeypatch.setattr(
        pipeline, "_host_fetch", lambda x: (calls.append(1), real_fetch(x))[1]
    )
    pano = pipeline.stitch_all_images_auto(imgs, SMALL, print_timing=False)
    assert pano is not None
    assert len(calls) == 1, f"expected 1 packed fetch, saw {len(calls)}"


def test_tier_fallback_reuses_estimate():
    """A tier coverage miss must NOT re-run detection/matching/RANSAC:
    estimation is dispatched once, every tier attempt and the staged
    composite fallback reuse it (regression for the round-2 'tier
    escalation redoes the whole estimation' finding)."""
    from jax.experimental.pallas import tpu as pltpu

    # Vertical pair: overflows the panorama-shaped canvas at every tier,
    # so the fused path walks tier 0 -> tier 1 -> staged composite.
    base = checkerboard_texture(800, 160, seed=8)
    top = base[:400].copy()
    bottom = base[352:800].copy()

    stitcher = PairStitcher(SMALL, print_timing=False)
    est_calls, compose_tiers = [], []
    real_est = stitcher._fused_estimate_src
    stitcher._fused_estimate_src = (
        lambda *a: (est_calls.append(1), real_est(*a))[1]
    )
    real_compose = stitcher._fused_compose

    def counting_compose(tier, hr, wr):
        compose_tiers.append(tier)
        return real_compose(tier, hr, wr)

    stitcher._fused_compose = counting_compose

    with pltpu.force_tpu_interpret_mode():
        pano = stitcher.stitch_pair_fast(
            jnp.asarray(top), jnp.asarray(bottom), _assume_tpu=True
        )
    assert pano is not None
    assert np.asarray(pano).shape[0] >= 790  # untruncated staged result
    assert est_calls == [1], f"estimation ran {len(est_calls)} times"
    assert compose_tiers == [0, 1], compose_tiers


def _exact_est_row(h):
    """Fused-protocol estimate row with a KNOWN homography: keeps parity
    tests independent of RANSAC noise (an estimated H lands sub-pixel off
    an integer, so the staged path's truncated translation and the fused
    path's round-up-and-crop framing resample on different sub-pixel grids
    — both valid panoramas, not bit-comparable)."""
    import numpy as _np

    return jnp.asarray(
        list(_np.asarray(h, _np.float32).ravel())
        + [100.0, 100.0, 1.0, 100.0, 0.0],
        jnp.float32,
    )


def _run_fused_compose(stitcher, left, right, h, tier=0):
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        packed_src = stitcher._pack_src()(jnp.asarray(right))
        packed_out, canvas = stitcher._fused_compose(
            tier, right.shape[0], right.shape[1]
        )(jnp.asarray(left), packed_src, _exact_est_row(h))
    v = np.asarray(packed_out)
    assert v[18] > 0.5, "expected in-envelope, in-coverage homography"
    ch, cw = int(v[16]), int(v[17])
    cy0, cx0 = int(v[19]), int(v[20])
    return np.asarray(canvas[cy0:cy0 + ch, cx0:cx0 + cw])


def test_fused_stitch_multiband_matches_staged():
    """Multiband now runs through the one-pass pallas composite inside the
    fused graph; with an exact integer homography it must reproduce the
    staged multiband composite."""
    import dataclasses

    cfg = SMALL.replace(
        stitch=dataclasses.replace(SMALL.stitch, blend="multiband")
    )
    left, right = translated_pair()
    h = np.eye(3)
    h[0, 2] = -48.0
    stitcher = PairStitcher(cfg, print_timing=False)
    staged = np.asarray(
        stitcher.composite(jnp.asarray(left), jnp.asarray(right), h)
    )
    fused = _run_fused_compose(stitcher, left, right, h)
    assert fused.shape == staged.shape, (fused.shape, staged.shape)
    d = np.abs(fused.astype(int) - staged.astype(int)).max(-1)
    # u8-rounded pallas warp vs unrounded XLA warp feeding the pyramids.
    assert (d > 10).mean() < 0.02, (d.max(), (d > 10).mean())


def test_fused_stitch_gain_matches_staged():
    """Gain compensation no longer forces the XLA epilogue: the fused graph
    pre-scales the warped window and still composes via the pallas kernel.
    Must match the staged gain path for an exact homography."""
    import dataclasses

    cfg = SMALL.replace(
        stitch=dataclasses.replace(
            SMALL.stitch, blend="feather", gain_compensation=True
        )
    )
    left, right = translated_pair()
    # Real exposure offset so the gain actually engages.
    right = np.clip(right.astype(np.int32) * 1.25, 0, 255).astype(np.uint8)
    h = np.eye(3)
    h[0, 2] = -48.0
    stitcher = PairStitcher(cfg, print_timing=False)
    staged = np.asarray(
        stitcher.composite(jnp.asarray(left), jnp.asarray(right), h)
    )
    fused = _run_fused_compose(stitcher, left, right, h)
    assert fused.shape == staged.shape
    # The blended output must reflect the ~0.8 gain (right-only region
    # darker than the raw brightened input).
    assert fused[:, :40].mean() < right[:, :40].mean() - 5
    d = np.abs(fused.astype(int) - staged.astype(int)).max(-1)
    assert (d > 10).mean() < 0.02, (d.max(), (d > 10).mean())


def test_src_pack_mode_requires_two_border_rows(monkeypatch):
    """The Harris-plane-as-warp-source gate must reject shapes whose tile
    padding leaves fewer than 2 zero rows/cols past the shifted image
    (hp < h + 3): at hp == h + 2 the warp's coordinate clamp lands ON the
    last real row and off-image samples duplicate edge pixels instead of
    fading to zero (code-review r3 finding, empirically reproduced)."""
    import pano_tpu.pipeline as pl_mod
    from pano_tpu.ops import pallas_harris as PH

    stitcher = PairStitcher(SMALL, print_timing=False)
    monkeypatch.setattr(pl_mod.jax, "default_backend", lambda: "tpu")
    assert SMALL.harris.use_pallas_scores and SMALL.stitch.use_pallas_warp

    good_h = PH.TH * 3 - 8          # hp - h == 8: plenty of border
    bad_h = PH.TH * 3 - 2           # hp - h == 2: clamp hits real pixels
    w = PH.TW * 2 - 8
    assert stitcher._src_pack_mode((good_h, w, 3)) is not None
    assert stitcher._src_pack_mode((bad_h, w, 3)) is None
    assert stitcher._src_pack_mode((good_h, PH.TW * 2 - 2, 3)) is None


def test_fetch_image_band_path_matches_asarray():
    """fetch_image's pipelined band fetch must be bit-identical to a plain
    np.asarray for awkward heights (not divisible by the band count), and
    must pass small/numpy inputs straight through."""
    from pano_tpu.timer import fetch_image

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (307, 129, 3)).astype(np.uint8)
    dev = jnp.asarray(img)
    np.testing.assert_array_equal(
        fetch_image(dev, bands=32, _force=True), img
    )
    np.testing.assert_array_equal(fetch_image(dev), img)  # small: passthrough
    assert fetch_image(img) is img                        # numpy: identity
    # 2-D arrays (weight canvases) take the same band path.
    w = rng.standard_normal((307, 129)).astype(np.float32)
    np.testing.assert_array_equal(
        fetch_image(jnp.asarray(w), bands=7, _force=True), w
    )


def test_push_image_band_path_matches_device_put():
    """push_image's threaded band upload must reassemble the exact array,
    including awkward heights, and pass small inputs straight through."""
    from pano_tpu.timer import push_image

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (307, 129, 3)).astype(np.uint8)
    np.testing.assert_array_equal(
        np.asarray(push_image(img, bands=16, _force=True)), img
    )
    np.testing.assert_array_equal(np.asarray(push_image(img)), img)


def test_chain_mode_single_fetch_for_estimates(monkeypatch):
    """The local chain mode must pay exactly ONE host fetch for all n-1
    adjacent-pair estimates (mirroring the auto mode and the sharded
    twins), not one RPC per pair."""
    from pano_tpu import pipeline

    base = checkerboard_texture(128, 280, seed=5)
    imgs = [
        np.asarray(base[:, 0:160]),
        np.asarray(base[:, 60:220]),
        np.asarray(base[:, 120:280]),
    ]
    calls = []
    real_fetch = pipeline._host_fetch
    monkeypatch.setattr(
        pipeline, "_host_fetch", lambda x: (calls.append(1), real_fetch(x))[1]
    )
    pano = pipeline.stitch_all_images_chain(imgs, SMALL, print_timing=False)
    assert pano is not None
    assert len(calls) == 1, f"expected 1 packed fetch, saw {len(calls)}"
    assert pano.shape[1] >= 260  # all three images placed


def test_auto_mode_anchor_first_matches_chain_frame():
    """--anchor first roots the auto MST at the first connected image, so
    on ordered input the auto panorama renders in chain mode's projective
    frame (same canvas) instead of the best-connected image's frame —
    the knob for grading against a reference panorama (BASELINE.md
    round-3 seam-metric note)."""
    from pano_tpu import pipeline

    base = checkerboard_texture(128, 300, seed=6)
    imgs = [
        np.asarray(base[:, 0:160]),
        np.asarray(base[:, 70:230]),
        np.asarray(base[:, 140:300]),
    ]
    chain = pipeline.stitch_all_images_chain(imgs, SMALL, print_timing=False)
    auto_first = pipeline.stitch_all_images_auto(
        imgs, SMALL, print_timing=False, anchor="first"
    )
    assert chain is not None and auto_first is not None
    assert auto_first.shape == chain.shape
    # Same frame means near-identical pixels (estimates may differ in ulps).
    diff = np.abs(
        auto_first.astype(np.int32) - chain.astype(np.int32)
    ).mean()
    assert diff < 3.0, diff
    # Default anchor still roots at the best-connected (middle) image.
    auto_def = pipeline.stitch_all_images_auto(
        imgs, SMALL, print_timing=False
    )
    assert auto_def is not None
