"""Pallas warp kernel tests (interpret mode on CPU).

The kernel itself targets TPU; interpret mode checks the algorithm —
window math, two-pass gather logic, alpha/border semantics — against the
exact XLA warp oracle (ops/warp.py, itself validated against cv2).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from pano_tpu.ops import pallas_warp as PW
from pano_tpu.ops import warp as W


def run_kernel(img, m_inv, oh, ow, alpha_plane=None):
    packed = PW.pack_bgra(jnp.asarray(img), alpha_plane)
    params = PW.make_params(m_inv, 0.0, 0.0, img.shape[0], img.shape[1])
    with pltpu.force_tpu_interpret_mode():
        rgb, w = PW.warp_packed(packed, params, oh, ow)
    return np.asarray(PW.unpack_rgb(rgb)), np.asarray(w)


@pytest.fixture(scope="module")
def img(rng=None):
    r = np.random.default_rng(7)
    return r.integers(0, 256, (200, 300, 3)).astype(np.uint8)


def test_identity_exact(img):
    out, w = run_kernel(img, np.eye(3), 128, 256)
    np.testing.assert_array_equal(out[:128, :256], img[:128, :256])
    assert np.all(w[:128, :256] > 0.99)


def test_fractional_translation_matches_xla(img):
    m = np.eye(3)
    m[0, 2], m[1, 2] = 17.5, 6.25
    m_inv = np.linalg.inv(m)
    out, _ = run_kernel(img, m_inv, 256, 512)
    ref = np.asarray(
        W.warp_perspective_u8(
            jnp.asarray(img), jnp.asarray(m_inv, jnp.float32), 256, 512
        )
    )
    d = np.abs(out.astype(int) - ref.astype(int))
    # +-1 f32 rounding at .5 boundaries, +-1 more from the kernel's u8
    # intermediate requantization between the two resampling passes.
    assert d.max() <= 2


def test_projective_close_to_xla(img):
    m = np.array(
        [[0.97, 0.02, 12.0], [-0.015, 1.02, 4.0], [2e-5, -1e-5, 1.0]]
    )
    m_inv = np.linalg.inv(m)
    assert PW.supports_homography(m_inv, 256, 512)
    out, _ = run_kernel(img, m_inv, 256, 512)
    ref = np.asarray(
        W.warp_perspective_u8(
            jnp.asarray(img), jnp.asarray(m_inv, jnp.float32), 256, 512
        )
    )
    d = np.abs(out.astype(int) - ref.astype(int)).max(-1)
    # Two-pass approximation: tiny deviations allowed on a small fraction.
    assert (d > 3).mean() < 0.01, (d.max(), (d > 3).mean())


def test_alpha_outside_image_is_zero(img):
    m = np.eye(3)
    m[0, 2] = 250.0  # shifts image right; left part of canvas is off-image
    m_inv = np.linalg.inv(m)
    out, w = run_kernel(img, m_inv, 128, 512)
    assert np.all(w[:, :248] < 0.05)
    assert np.all(out[:, :248] == 0)
    assert np.all(w[10:100, 260:500] > 0.99)


def test_feather_alpha_plane_warps(img):
    ramp = W._edge_ramp(200, 300)
    m = np.eye(3)
    m_inv = np.linalg.inv(m)
    _, w = run_kernel(img, m_inv, 128, 256, alpha_plane=ramp)
    expect = np.asarray(ramp)[:128, :256]
    got = w[:128, :256]
    # Quantized to 7 bits and clamped to >=1/127 inside the image.
    assert np.abs(got - np.clip(expect, 1 / 127, 1)).max() < 0.02


def test_supports_homography_rejects_extreme():
    # 4x downscale blows the source window budget.
    m_inv = np.diag([4.0, 4.0, 1.0])
    assert not PW.supports_homography(m_inv, 256, 256)
    # Heavy rotation blows the row-tilt budget.
    th = np.deg2rad(30)
    rot = np.array(
        [
            [np.cos(th), -np.sin(th), 0.0],
            [np.sin(th), np.cos(th), 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    assert not PW.supports_homography(rot, 512, 512)


def test_no_alpha_overlay_path_matches_xla(img):
    """has_alpha=False — the production default (overlay blend) — must
    reproduce the XLA warp's pixels AND its exact analytic border weight
    (the summed in-bounds bilinear weight from _bilinear_sample_u8)."""
    m = np.eye(3)
    m[0, 2], m[1, 2] = 17.5, 6.25
    m_inv = np.linalg.inv(m)
    packed = PW.pack_bgra(jnp.asarray(img), None)
    params = PW.make_params(m_inv, 0.0, 0.0, img.shape[0], img.shape[1])
    with pltpu.force_tpu_interpret_mode():
        rgb, w = PW.warp_packed(packed, params, 256, 512, has_alpha=False)
    out = np.asarray(PW.unpack_rgb(rgb))
    w = np.asarray(w)

    import jax

    sx, sy = W._inverse_map(
        jnp.asarray(m_inv, jnp.float32), 256, 512,
        jnp.asarray(0.0), jnp.asarray(0.0),
    )
    ref_rgb, ref_w = jax.jit(W._bilinear_sample_u8)(jnp.asarray(img), sx, sy)
    ref = np.clip(np.round(np.asarray(ref_rgb)), 0, 255).astype(np.uint8)
    d = np.abs(out.astype(int) - ref.astype(int))
    assert d.max() <= 2  # rounding + inter-pass u8 requantization
    np.testing.assert_allclose(w, np.asarray(ref_w), atol=1e-5)


# --- mip (2x-prefilter) minification path -------------------------------

def test_downsample_pow2_box_filter_exact():
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = np.asarray(W.downsample_pow2(jnp.asarray(img), 1))
    assert out.shape == (2, 3, 3)
    # round-half-up integer mean of each 2x2 block
    ref = (
        img.astype(np.int32).reshape(2, 2, 3, 2, 3).sum(axis=(1, 3)) + 2
    ) >> 2
    np.testing.assert_array_equal(out, ref.astype(np.uint8))


def test_downsample_pow2_odd_dims_crop():
    img = np.random.default_rng(0).integers(
        0, 256, (101, 77, 3)
    ).astype(np.uint8)
    out = np.asarray(W.downsample_pow2(jnp.asarray(img), 2))
    assert out.shape == (25, 19, 3)


def test_pick_mip_level_escalates_with_minification():
    def scale_m_inv(s):
        # out -> src map that MINIFIES by s (src spans s x the output).
        return np.diag([s, s, 1.0])

    assert PW.pick_mip_level(scale_m_inv(1.0), 256, 256) == 0
    assert PW.pick_mip_level(scale_m_inv(2.0), 256, 256) == 1
    assert PW.pick_mip_level(scale_m_inv(4.0), 256, 256) == 2
    # Beyond SCALE_MAX * 2^MAX_MIP even the deepest mip fails.
    assert PW.pick_mip_level(scale_m_inv(8.0), 256, 256) is None


def test_mip_warp_matches_downsampled_oracle():
    """A 2x-minifying warp through the mip path (level-1 source + scaled
    m_inv) must match the XLA bilinear oracle SAMPLING THE SAME MIP — the
    kernel-parity bound, independent of prefilter quality."""
    r = np.random.default_rng(11)
    img = r.integers(0, 256, (256, 512, 3)).astype(np.uint8)
    m_inv = np.diag([2.0, 2.0, 1.0])   # out -> full-res src, 2x minify

    lvl = PW.pick_mip_level(m_inv, 128, 256)
    assert lvl == 1
    src = W.downsample_pow2(jnp.asarray(img), lvl)
    m_lvl = PW.mip_m_inv(m_inv, lvl)

    packed = PW.pack_bgra(src, None)
    params = PW.make_params(
        m_lvl, 0.0, 0.0, src.shape[0], src.shape[1]
    )
    with pltpu.force_tpu_interpret_mode():
        rgb, w = PW.warp_packed(packed, params, 128, 256)
    out = np.asarray(PW.unpack_rgb(rgb))

    sx, sy = W._inverse_map(
        jnp.asarray(m_lvl, jnp.float32), 128, 256,
        jnp.asarray(0.0), jnp.asarray(0.0),
    )
    ref_rgb, ref_w = jax.jit(W._bilinear_sample_u8)(src, sx, sy)
    ref = np.clip(np.round(np.asarray(ref_rgb)), 0, 255).astype(np.uint8)
    inb = np.asarray(ref_w) > 0.5
    d = np.abs(out.astype(int) - ref.astype(int))[inb]
    assert d.max() <= 2, d.max()


def test_emit_weight_false_same_rgb(img):
    """emit_weight=False must produce the identical packed RGB with the
    weight output dropped (returned as None)."""
    m = np.eye(3)
    m[0, 2], m[1, 2] = 11.5, 3.25
    m_inv = np.linalg.inv(m)
    packed = PW.pack_bgra(jnp.asarray(img), None)
    params = PW.make_params(m_inv, 0.0, 0.0, img.shape[0], img.shape[1])
    with pltpu.force_tpu_interpret_mode():
        rgb_w, w = PW.warp_packed(packed, params, 128, 256, has_alpha=False)
        rgb_nw, w_none = PW.warp_packed(
            packed, params, 128, 256, has_alpha=False, emit_weight=False
        )
    assert w_none is None
    np.testing.assert_array_equal(np.asarray(rgb_w), np.asarray(rgb_nw))
    assert np.asarray(w).max() > 0.99


def test_near_integer_translation_knife_edges(img):
    """Regression: near-integer source coordinates (every translation-like
    panorama warp) put floor/frac derivations on ULP knife edges, where
    the CPU interpreter's fusion used to recompute lx/vy per consumer with
    divergent rounding — full one-column sample shifts and isolated black
    pixels, dependent on --xla_force_host_platform_device_count. Fixed by
    the interpret-path scratch roundtrips in pallas_warp (see
    _interpreted_trace); this pins the bug class with a homography whose
    coordinates sit a few ULP below integers everywhere."""
    m = np.eye(3)
    m[0, 0] = 1.0 - 3e-7     # ~ULP-scale shear off exact integers
    m[1, 1] = 1.0 + 3e-7
    m[0, 2], m[1, 2] = 80.0, 6.0
    m_inv = np.linalg.inv(m)
    out, _ = run_kernel(img, m_inv, 256, 512)
    ref = np.asarray(
        W.warp_perspective_u8(
            jnp.asarray(img), jnp.asarray(m_inv, jnp.float32), 256, 512
        )
    )
    d = np.abs(out.astype(int) - ref.astype(int))
    # A knife-edge divergence shows up as a FULL column/row shift (diffs
    # of 100+), far above the SWAR requantization bound.
    assert d.max() <= 3, (d.max(), (d.max(-1) > 3).mean())


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_random_in_envelope_homography_sweep(img, seed):
    """Property sweep: random in-envelope homographies (rotation + scale +
    translation + projective terms) must match the XLA oracle within the
    two-pass SWAR requantization bound. Catches window/round-budget
    geometry errors anywhere in the envelope, not just at hand-picked
    maps."""
    r = np.random.default_rng(seed)
    ang = r.uniform(-0.05, 0.05)
    s = r.uniform(0.85, 1.15)
    c, si = np.cos(ang) * s, np.sin(ang) * s
    m = np.array(
        [
            [c, -si, r.uniform(-20, 60)],
            [si, c, r.uniform(-10, 20)],
            [r.uniform(-2e-5, 2e-5), r.uniform(-2e-5, 2e-5), 1.0],
        ]
    )
    m_inv = np.linalg.inv(m)
    if not PW.supports_homography(m_inv, 256, 512):
        pytest.skip("outside envelope for this draw")
    out, w = run_kernel(img, m_inv, 256, 512)
    ref = np.asarray(
        W.warp_perspective_u8(
            jnp.asarray(img), jnp.asarray(m_inv, jnp.float32), 256, 512
        )
    )
    d = np.abs(out.astype(int) - ref.astype(int))
    # Exclude the 1-px coverage boundary (weight < 1): the oracle blends
    # border black differently from the kernel's +-1-requantized alpha.
    interior = (w > 0.999)[..., None]
    di = np.where(interior, d, 0)
    # Both passes quantize weights to 7 bits and values to u8 between
    # them: the compounded tail measures <= 5 on noise images (cv2's own
    # INTER_LINEAR uses 5-bit weights and is coarser). An index/window
    # bug on this noise fixture would show diffs of ~85+ instead.
    assert di.max() <= 6, (di.max(), (di.max(-1) > 3).mean())
    assert (di.max(-1) > 3).mean() < 0.01


def test_rv_fast_variant_matches_full(img):
    """The 3-round kernel variant (RV_FAST, picked for low-tilt maps) must
    produce the same output as the full 5-round kernel when the tight
    chunk budget holds."""
    m = np.array(
        [[0.99, 0.004, 22.0], [-0.003, 1.01, 7.0], [1e-6, -1e-6, 1.0]]
    )
    m_inv = np.linalg.inv(m)
    assert PW.pick_rv(m_inv, 256, 512) == PW.RV_FAST
    packed = PW.pack_bgra(jnp.asarray(img), None)
    params = PW.make_params(m_inv, 0.0, 0.0, img.shape[0], img.shape[1])
    with pltpu.force_tpu_interpret_mode():
        rgb_f, w_f = PW.warp_packed(packed, params, 256, 512, rv=PW.RV_FAST)
        rgb_5, w_5 = PW.warp_packed(packed, params, 256, 512, rv=PW.RV)
    np.testing.assert_array_equal(np.asarray(rgb_f), np.asarray(rgb_5))
    np.testing.assert_allclose(np.asarray(w_f), np.asarray(w_5))
    # A strongly-tilted (rotated) map must NOT pick the fast variant.
    ang = 0.35
    rot = np.array(
        [
            [np.cos(ang), -np.sin(ang), 30.0],
            [np.sin(ang), np.cos(ang), 10.0],
            [0.0, 0.0, 1.0],
        ]
    )
    assert PW.pick_rv(np.linalg.inv(rot), 256, 512) == PW.RV


def test_vmapped_warp_matches_single_warps():
    """vmap over warp_packed must lower to ONE natively-batched kernel
    launch (custom_vmap -> (B, ty, tx) grid) and be bit-identical to the
    per-image single-warp loop — the enabler for the sharded/batched
    composite paths running the kernel."""
    r = np.random.default_rng(11)
    imgs = r.integers(0, 256, (3, 160, 220, 3)).astype(np.uint8)
    ms = []
    for k, (dx, dy) in enumerate([(3.5, 1.25), (-7.0, 4.5), (12.25, -2.0)]):
        m = np.eye(3)
        m[0, 2], m[1, 2] = dx, dy
        m[2, 0] = 1e-5 * (k - 1)
        ms.append(np.linalg.inv(m))
    packed = jnp.stack([PW.pack_bgra(jnp.asarray(im)) for im in imgs])
    params = jnp.stack(
        [PW.make_params(m, 0.0, 0.0, 160, 220) for m in ms]
    )

    with pltpu.force_tpu_interpret_mode():
        singles = [
            PW.warp_packed(packed[i], params[i], 128, 256) for i in range(3)
        ]
        rgb_b, w_b = jax.vmap(
            lambda s, p: PW.warp_packed(s, p, 128, 256)
        )(packed, params)

    for i in range(3):
        np.testing.assert_array_equal(np.asarray(rgb_b[i]),
                                      np.asarray(singles[i][0]))
        np.testing.assert_array_equal(np.asarray(w_b[i]),
                                      np.asarray(singles[i][1]))


def _fused_case(seed, hl, wl, hr, wr, m, ty, tx, wy0, wx0,
                win_h, win_w, pad_h, pad_w):
    """Run warp_compose_overlay AND the two-kernel pipeline it fuses
    (warp_packed emit_weight=False -> compose_canvas overlay); both in
    interpret mode. Returns (fused, pipeline) canvases."""
    from pano_tpu.ops import pallas_compose as PC

    r = np.random.default_rng(seed)
    left = r.integers(0, 256, (hl, wl, 3)).astype(np.uint8)
    right = r.integers(0, 256, (hr, wr, 3)).astype(np.uint8)
    m_inv = np.linalg.inv(m)
    packed = PW.pack_bgra(jnp.asarray(right))
    i32 = lambda v: jnp.asarray(v, jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        fused = np.asarray(
            PW.warp_compose_overlay(
                packed,
                PW.make_params(m_inv, 0.0, 0.0, hr, wr),
                jnp.asarray(left),
                i32(ty), i32(tx), i32(wy0), i32(wx0),
                win_h, win_w, pad_h, pad_w,
            )
        )
        rgb_win, _ = PW.warp_packed(
            packed, PW.make_params(m_inv, float(wx0), float(wy0), hr, wr),
            win_h, win_w, has_alpha=False, emit_weight=False,
        )
        pipe = np.asarray(
            PC.compose_canvas(
                jnp.asarray(left), rgb_win, None,
                i32(ty), i32(tx), i32(wy0), i32(wx0),
                pad_h, pad_w, "overlay",
            )
        )
    return fused, pipe


@pytest.mark.parametrize(
    "case",
    [
        # (m translate/projective, placements) — window at origin, interior,
        # and flush against the canvas edge; left ragged.
        dict(m=np.array([[1.0, 0.0, 40.5], [0.0, 1.0, 12.25],
                         [0.0, 0.0, 1.0]]),
             ty=0, tx=0, wy0=0, wx0=0, win=(256, 512), pad=(384, 768)),
        dict(m=np.array([[0.98, 0.015, 300.0], [-0.01, 1.01, 140.0],
                         [1.5e-5, -1e-5, 1.0]]),
             ty=128, tx=256, wy0=128, wx0=256, win=(256, 512),
             pad=(384, 768)),
        dict(m=np.array([[1.0, 0.0, 500.0], [0.0, 1.0, 250.0],
                         [0.0, 0.0, 1.0]]),
             ty=0, tx=0, wy0=128, wx0=256, win=(256, 512), pad=(384, 768)),
    ],
)
def test_warp_compose_overlay_matches_two_kernel_pipeline(case):
    """The fused warp+overlay canvas kernel must be BYTE-IDENTICAL to the
    warp_packed -> compose_canvas pipeline it replaces (same requantized
    ints, same overlay select) — including base-copy tiles outside the
    window and off-image tiles inside it."""
    hl, wl, hr, wr = 200, 520, 200, 300
    win_h, win_w = case["win"]
    pad_h, pad_w = case["pad"]
    fused, pipe = _fused_case(
        11, hl, wl, hr, wr, case["m"], case["ty"], case["tx"],
        case["wy0"], case["wx0"], win_h, win_w, pad_h, pad_w,
    )
    np.testing.assert_array_equal(fused, pipe)
