"""On-hardware Pallas regression tests: the REAL Mosaic lowering vs XLA
oracles (the interpret-mode tests in test_pallas_warp.py/test_pallas_harris.py
check the algorithm; these check the lowering).

Run in bench sessions: PANO_TPU_TESTS=1 python -m pytest -m tpu
(the default suite deselects the tpu marker and pins the CPU backend).

Covers: warp kernel identity/fractional/projective parity vs the XLA warp
(src/serial/main.cpp:371-386 semantics), an envelope-EDGE homography (just
inside the supports_homography budget — the regime where the two-pass
window math is tightest), the fused Harris-scores kernel vs the XLA chain
(harris_detector.cu semantics), and the single-dispatch fused stitch vs the
staged path end-to-end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module", autouse=True)
def require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("requires a real TPU (PANO_TPU_TESTS=1 pytest -m tpu)")


@pytest.fixture(scope="module")
def img():
    r = np.random.default_rng(7)
    return r.integers(0, 256, (200, 300, 3)).astype(np.uint8)


def run_warp_kernel(img, m_inv, oh, ow, alpha_plane=None):
    from pano_tpu.ops import pallas_warp as PW

    packed = PW.pack_bgra(jnp.asarray(img), alpha_plane)
    params = PW.make_params(m_inv, 0.0, 0.0, img.shape[0], img.shape[1])
    rgb, w = PW.warp_packed(packed, params, oh, ow)  # REAL lowering
    return np.asarray(PW.unpack_rgb(rgb)), np.asarray(w)


def test_warp_identity_exact_on_tpu(img):
    out, w = run_warp_kernel(img, np.eye(3), 128, 256)
    np.testing.assert_array_equal(out[:128, :256], img[:128, :256])
    assert np.all(w[:128, :256] > 0.99)


def test_warp_fractional_translation_vs_xla_on_tpu(img):
    from pano_tpu.ops import warp as W

    m = np.eye(3)
    m[0, 2], m[1, 2] = 17.5, 6.25
    m_inv = np.linalg.inv(m)
    out, _ = run_warp_kernel(img, m_inv, 256, 512)
    ref = np.asarray(
        W.warp_perspective_u8(
            jnp.asarray(img), jnp.asarray(m_inv, jnp.float32), 256, 512
        )
    )
    d = np.abs(out.astype(int) - ref.astype(int))
    # +-1 f32 rounding at .5 boundaries, +-1 more from the kernel's u8
    # intermediate requantization between the two resampling passes.
    assert d.max() <= 2


def test_warp_projective_vs_xla_on_tpu(img):
    from pano_tpu.ops import pallas_warp as PW
    from pano_tpu.ops import warp as W

    m = np.array(
        [[0.97, 0.02, 12.0], [-0.015, 1.02, 4.0], [2e-5, -1e-5, 1.0]]
    )
    m_inv = np.linalg.inv(m)
    assert PW.supports_homography(m_inv, 256, 512)
    out, _ = run_warp_kernel(img, m_inv, 256, 512)
    ref = np.asarray(
        W.warp_perspective_u8(
            jnp.asarray(img), jnp.asarray(m_inv, jnp.float32), 256, 512
        )
    )
    d = np.abs(out.astype(int) - ref.astype(int)).max(-1)
    assert (d > 3).mean() < 0.01, (d.max(), (d > 3).mean())


def test_warp_envelope_edge_homography_on_tpu():
    """A homography just INSIDE the kernel's quality envelope: ~1.28x
    downscale sits at the edge of the SCALE_MAX resampling bound (measured
    bit-exact through 1.3x; non-monotonic degradation beyond — the bound
    exists precisely because of that cliff). The real lowering's
    round-select gather loops are under the most pressure here. Also checks
    the guard REJECTS a 1.5x warp (which measured max-diff 42 on v5e)."""
    from pano_tpu.ops import pallas_warp as PW
    from pano_tpu.ops import warp as W

    r = np.random.default_rng(11)
    big = r.integers(0, 256, (800, 1100, 3)).astype(np.uint8)
    m_inv = np.array(
        [[1.28, 0.02, 5.0], [0.01, 1.28, 3.0], [0.0, 0.0, 1.0]]
    )
    assert PW.supports_homography(m_inv, 256, 512), "meant to be in-envelope"
    out, _ = run_warp_kernel(big, m_inv, 256, 512)
    ref = np.asarray(
        W.warp_perspective_u8(
            jnp.asarray(big), jnp.asarray(m_inv, jnp.float32), 256, 512
        )
    )
    d = np.abs(out.astype(int) - ref.astype(int))
    # rounding + inter-pass u8 requantization only, even at the edge
    assert d.max() <= 2, d.max()

    # Beyond the quality bound the guard must route to the exact XLA path.
    m_bad = np.array([[1.5, 0.02, 5.0], [0.01, 1.5, 3.0], [0.0, 0.0, 1.0]])
    assert not PW.supports_homography(m_bad, 256, 512)


def test_harris_scores_kernel_vs_xla_on_tpu():
    from pano_tpu.config import HarrisOptions
    from pano_tpu.ops import harris as H
    from pano_tpu.ops import pallas_harris as PH

    r = np.random.default_rng(3)
    img = r.integers(0, 256, (300, 512, 3)).astype(np.uint8)
    opts = HarrisOptions()
    h, w = img.shape[:2]
    gray = H.bgr_to_gray_f32(jnp.asarray(img))

    got = np.asarray(
        PH.harris_scores(jnp.asarray(img), h, w, opts.k, opts.nms_thresh)
    )[: h // 2, : w // 2]

    resp = H.harris_response(gray, opts.k)
    nmax = H._neighbor_max(resp, 3)
    ys = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = (ys >= 1) & (ys < h - 1) & (xs >= 1) & (xs < w - 1)
    want = np.asarray(
        jnp.where(
            (resp > opts.nms_thresh) & (resp > nmax) & border, resp, -jnp.inf
        )
    )
    # The kernel emits the 2x2 block-folded plane (pallas_harris docstring).
    want = np.maximum(want[0::2], want[1::2])
    want = np.maximum(want[:, 0::2], want[:, 1::2])
    same_peaks = np.isneginf(got) == np.isneginf(want)
    assert same_peaks.mean() > 0.9995, same_peaks.mean()
    both = ~np.isneginf(got) & ~np.isneginf(want)
    if both.any():
        np.testing.assert_allclose(got[both], want[both], rtol=2e-4, atol=10.0)


def test_fused_stitch_matches_staged_on_tpu():
    """stitch_pair_fast (single-dispatch, Pallas warp inside) must agree
    with the staged path (XLA warp fallback geometry) end-to-end."""
    from pano_tpu import pipeline
    from pano_tpu.config import HarrisOptions, PanoConfig, RansacOptions

    r = np.random.default_rng(5)
    base = np.full((256, 640, 3), 30, np.uint8)
    for _ in range(150):
        y, x = r.integers(5, 244), r.integers(5, 624)
        base[y : y + 8, x : x + 8] = r.integers(60, 255, 3)
    left = jnp.asarray(base[:, :384], jnp.uint8)
    right = jnp.asarray(base[:, 256:], jnp.uint8)

    cfg = PanoConfig(
        harris=HarrisOptions(max_keypoints=2048),
        ransac=RansacOptions(num_iterations=1024),
    )
    fast = pipeline.PairStitcher(cfg, print_timing=False)
    pano_fast = fast.stitch_pair_fast(left, right)
    assert pano_fast is not None
    pano_staged = fast.stitch_pair(left, right)
    assert pano_staged is not None

    a, b = np.asarray(pano_fast), np.asarray(pano_staged)
    assert a.shape == b.shape, (a.shape, b.shape)
    # Same H (deterministic RANSAC) -> same geometry; warp kernels may
    # differ by the two-pass sub-pixel approximation on a small fraction.
    d = np.abs(a.astype(int) - b.astype(int)).max(-1)
    assert (d > 3).mean() < 0.01, (d.max(), (d > 3).mean())


def test_compose_canvas_vs_xla_epilogue_on_tpu():
    """The one-pass pallas compose kernel (REAL Mosaic lowering) vs the XLA
    blend epilogue, overlay + feather, with a ragged left edge and a
    nonzero tile-aligned placement."""
    from pano_tpu.ops import warp as W
    from pano_tpu.ops.pallas_compose import compose_canvas

    r = np.random.default_rng(11)
    hl, wl = 200, 300
    win_h, win_w = 256, 512   # win_w/pad_w/x placements: BTX (256) multiples
    pad_h, pad_w = 512, 768
    ty, tx, wy0, wx0 = 128, 0, 128, 256
    left = jnp.asarray(r.integers(0, 255, (hl, wl, 3)), jnp.uint8)
    rgb = r.integers(0, 2**24, (win_h, win_w)).astype(np.int32)
    hole = r.random((win_h, win_w)) < 0.3
    rgb = jnp.asarray(np.where(hole, 0, rgb))
    w = jnp.asarray(np.where(hole, 0.0, r.random((win_h, win_w))), jnp.float32)
    s = lambda v: jnp.asarray(v, jnp.int32)

    for blend in ("overlay", "feather"):
        oracle, _ = jax.jit(
            W.blend_window_outputs,
            static_argnames=(
                "out_h", "out_w", "win_h", "win_w", "blend", "gain"
            ),
        )(
            left, rgb, w, s(tx), s(ty), s(wx0), s(wy0),
            out_h=pad_h, out_w=pad_w, win_h=win_h, win_w=win_w, blend=blend,
        )
        got = np.asarray(
            compose_canvas(
                left, rgb, w if blend == "feather" else None,
                s(ty), s(tx), s(wy0), s(wx0), pad_h, pad_w, blend,
            )
        )
        oracle = np.asarray(oracle)
        if blend == "overlay":
            np.testing.assert_array_equal(got, oracle)
        else:
            d = np.abs(got.astype(int) - oracle.astype(int))
            assert d.max() <= 1, d.max()


def test_warp_no_alpha_overlay_path_on_tpu(img):
    """has_alpha=False (production overlay default) under the REAL Mosaic
    lowering: pixels within requantization tolerance of the XLA warp and
    the EXACT analytic border weight."""
    from pano_tpu.ops import pallas_warp as PW
    from pano_tpu.ops import warp as W

    m = np.eye(3)
    m[0, 2], m[1, 2] = 17.5, 6.25
    m_inv = np.linalg.inv(m)
    packed = PW.pack_bgra(jnp.asarray(img), None)
    params = PW.make_params(m_inv, 0.0, 0.0, img.shape[0], img.shape[1])
    rgb, w = PW.warp_packed(packed, params, 256, 512, has_alpha=False)
    out = np.asarray(PW.unpack_rgb(rgb))
    w = np.asarray(w)

    sx, sy = W._inverse_map(
        jnp.asarray(m_inv, jnp.float32), 256, 512,
        jnp.asarray(0.0), jnp.asarray(0.0),
    )
    ref_rgb, ref_w = jax.jit(W._bilinear_sample_u8)(jnp.asarray(img), sx, sy)
    ref = np.clip(np.round(np.asarray(ref_rgb)), 0, 255).astype(np.uint8)
    d = np.abs(out.astype(int) - ref.astype(int))
    assert d.max() <= 2
    np.testing.assert_allclose(w, np.asarray(ref_w), atol=1e-4)


def test_sharded_paths_with_pallas_kernels_on_tpu():
    """The sharded entry points must run the REAL Mosaic kernels (Pallas
    Harris scores under vmap and under shard_map) on hardware — dryrun
    and the CPU-mesh suite can only cover the portable XLA fallback.

    Single real chip => a (1,1) mesh; what this exercises is the Mosaic
    lowering inside vmapped/shard_mapped graphs, which no CPU test can.
    """
    from pano_tpu.config import HarrisOptions, PanoConfig, RansacOptions
    from pano_tpu.parallel import shard

    cfg = PanoConfig(
        harris=HarrisOptions(max_keypoints=512, use_pallas_scores=True),
        ransac=RansacOptions(num_iterations=512),
    )
    assert cfg.harris.use_pallas_scores  # the point of the test

    r = np.random.default_rng(3)
    base = np.full((128, 384, 3), 30, np.uint8)
    for _ in range(80):
        y, x = r.integers(5, 116), r.integers(5, 372)
        base[y : y + 8, x : x + 8] = r.integers(60, 255, 3)

    mesh = shard.make_mesh(n_data=1, n_hyp=1)

    # shard_map path (all_gather over 'hyp' + Pallas Harris inside).
    lefts = jnp.asarray(base[None, :, 64:320], jnp.uint8)
    rights = jnp.asarray(base[None, :, 0:256], jnp.uint8)
    hs, counts = shard.batched_stitch_step(mesh, lefts, rights, cfg)
    hs = np.asarray(hs)
    assert int(np.asarray(counts)[0]) > 10
    np.testing.assert_allclose(hs[0, 0, 2], -64.0, atol=1.0)
    np.testing.assert_allclose(hs[0, 1, 2], 0.0, atol=1.0)

    # vmapped fused-estimate + sharded composite end-to-end (chain mode).
    imgs = [
        base[:, 0:160].copy(),
        base[:, 96:256].copy(),
        base[:, 192:352].copy(),
    ]
    pano = shard.stitch_all_images_chain_sharded(
        imgs, cfg, mesh=mesh, print_timing=False
    )
    assert pano is not None
    assert pano.shape[1] >= 340
    d = np.abs(
        pano[:120, :340].astype(int) - base[:120, :340].astype(int)
    ).max(-1)
    assert (d > 30).mean() < 0.08, (d > 30).mean()


def test_mip_warp_minification_on_tpu():
    """A 2x-minifying homography must run the mip (2x-prefilter) kernel
    path on hardware and land near the full-res XLA bilinear oracle —
    the minification cliff regression (the old gate fell back to the
    ~190 ms XLA gather warp beyond SCALE_MAX)."""
    from pano_tpu.ops import pallas_warp as PW
    from pano_tpu.ops import warp as W

    r = np.random.default_rng(5)
    # Smooth image: prefilter-vs-bilinear differences stay tiny, so the
    # comparison checks geometry/registration, not filter choice.
    base = r.integers(0, 256, (32, 48, 3)).astype(np.uint8)
    img = np.asarray(
        jax.image.resize(jnp.asarray(base, jnp.float32), (512, 768, 3),
                         "linear")
    ).astype(np.uint8)
    m_inv = np.diag([2.0, 2.0, 1.0])   # 2x zoom-out

    lvl = PW.pick_mip_level(m_inv, 256, 512)
    assert lvl == 1

    src = W.downsample_pow2(jnp.asarray(img), lvl)
    packed = PW.pack_bgra(src, None)
    params = PW.make_params(
        PW.mip_m_inv(m_inv, lvl), 0.0, 0.0,
        src.shape[0], src.shape[1],
    )
    rgb, w = PW.warp_packed(packed, params, 256, 512)  # REAL lowering
    out = np.asarray(PW.unpack_rgb(rgb))

    sx, sy = W._inverse_map(
        jnp.asarray(m_inv, jnp.float32), 256, 512,
        jnp.asarray(0.0), jnp.asarray(0.0),
    )
    ref_rgb, ref_w = jax.jit(W._bilinear_sample_u8)(jnp.asarray(img), sx, sy)
    ref = np.asarray(ref_rgb)
    inb = np.asarray(ref_w) > 0.5
    d = np.abs(out.astype(float) - ref)[inb]
    # Prefiltered vs raw bilinear differ by the box filter; on a smooth
    # image the mean error must stay in the low single digits (measured
    # 3.10 on v5e; the kernel is bit-exact vs the mip-sampled oracle).
    assert d.mean() < 4.0, d.mean()
    assert (d > 16).mean() < 0.01, (d > 16).mean()


def test_pallas_matcher_bit_identical_on_tpu():
    """The MXU streaming-matcher kernel (ops/pallas_match.py) must be
    bit-identical to the XLA streaming matcher at the pipeline's full
    K=8192 on real hardware (Mosaic lowering, not interpret mode)."""
    import functools

    from pano_tpu.ops import match as match_ops

    rng = np.random.default_rng(11)
    k = 8192
    dq = rng.integers(0, 256, (k, 128)).astype(np.float32)
    dt = rng.integers(0, 256, (k, 128)).astype(np.float32)
    dq[:, 75:] = 0.0
    dt[:, 75:] = 0.0
    dup = rng.integers(0, k, k // 4)
    dt[dup] = dt[(dup + 7) % k]          # tie pressure
    vq = jnp.asarray(rng.random(k) > 0.1)
    vt = jnp.asarray(rng.random(k) > 0.1)
    dq, dt = jnp.asarray(dq), jnp.asarray(dt)

    kw = dict(max_ssd_thresh=1.2e6, ratio_thresh=0.8, cross_check=True)
    ref = jax.jit(functools.partial(
        match_ops.match_descriptors, **kw, block_size=1024, use_pallas=False
    ))(dq, vq, dt, vt)
    got = jax.jit(functools.partial(
        match_ops.match_descriptors, **kw, use_pallas=True
    ))(dq, vq, dt, vt)
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
    np.testing.assert_array_equal(
        np.asarray(ref.train_idx), np.asarray(got.train_idx)
    )
    np.testing.assert_array_equal(np.asarray(ref.ssd), np.asarray(got.ssd))


def test_batched_warp_kernel_vmapped_on_tpu(img):
    """The natively-batched warp grid under vmap (custom_vmap -> one
    (B, ty, tx) Mosaic launch) must be bit-identical to the single-warp
    loop on hardware — the enabler for the sharded composite running the
    kernel (VERDICT r3 #1)."""
    from pano_tpu.ops import pallas_warp as PW

    ms = []
    for k, (dx, dy) in enumerate([(3.5, 1.25), (-7.0, 4.5), (12.25, -2.0)]):
        m = np.eye(3)
        m[0, 2], m[1, 2] = dx, dy
        m[2, 0] = 1e-5 * (k - 1)
        ms.append(np.linalg.inv(m))
    packed = jnp.stack([PW.pack_bgra(jnp.asarray(img))] * 3)
    params = jnp.stack(
        [PW.make_params(m, 0.0, 0.0, img.shape[0], img.shape[1]) for m in ms]
    )
    singles = [
        PW.warp_packed(packed[i], params[i], 128, 256) for i in range(3)
    ]
    rgb_b, w_b = jax.vmap(
        lambda s, p: PW.warp_packed(s, p, 128, 256)
    )(packed, params)
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(rgb_b[i]), np.asarray(singles[i][0])
        )
        np.testing.assert_array_equal(
            np.asarray(w_b[i]), np.asarray(singles[i][1])
        )


def test_sharded_composite_runs_warp_kernel_on_tpu():
    """warp_windows_batched must route to the Pallas kernel on hardware
    (shard_map over a 1-device mesh on this rig) and match the XLA route,
    and composite_global_sharded end-to-end must match the local composite.
    """
    from pano_tpu import pipeline
    from pano_tpu.config import HarrisOptions, PanoConfig, RansacOptions
    from pano_tpu.parallel import shard

    cfg = PanoConfig(harris=HarrisOptions(max_keypoints=512))
    r = np.random.default_rng(31)
    base = r.integers(0, 256, (256, 1024, 3)).astype(np.uint8)
    imgs = [base[:, i * 192 : i * 192 + 384].copy() for i in range(4)]
    globals_h = [np.eye(3)]
    for i in range(1, 4):
        h = np.eye(3)
        h[0, 2] = 192.0 * i
        h[2, 0] = 2e-6 * i
        globals_h.append(h)
    devs = [jnp.asarray(im, jnp.uint8) for im in imgs]

    mesh = shard.make_mesh(n_data=1, n_hyp=1)
    # Kernel route is the default on TPU; plan must accept this batch.
    m_invs = np.stack([np.linalg.inv(g) for g in globals_h[1:]])
    origins = np.zeros((3, 2))
    assert shard.pallas_warp_plan(m_invs, origins, 256, 1024) is not None

    p_sh = shard.composite_global_sharded(
        imgs, devs, globals_h, cfg, mesh=mesh, anchor=0
    )
    p_lo = pipeline.composite_global(imgs, devs, globals_h, cfg, anchor=0)
    assert p_sh is not None and p_lo is not None
    assert p_sh.shape == p_lo.shape
    d = np.abs(p_sh.astype(int) - p_lo.astype(int)).max(-1)
    assert (d > 3).mean() < 0.01, (d.max(), (d > 3).mean())

    # And the throughput path: batched pairs through the kernel route.
    lefts = jnp.stack([devs[0], devs[1]])
    rights = jnp.stack([devs[1], devs[2]])
    hs = np.stack([globals_h[1], globals_h[1]])  # right -> left: x + 192
    kern = shard.composite_pairs_batched(
        lefts, rights, hs, np.array([True, True]), cfg, mesh
    )
    xla = shard.composite_pairs_batched(
        lefts, rights, hs, np.array([True, True]), cfg, mesh,
        use_pallas=False,
    )
    for b in range(2):
        assert kern[b].shape == xla[b].shape
        db = np.abs(kern[b].astype(int) - xla[b].astype(int)).max(-1)
        assert (db > 3).mean() < 0.01, (b, db.max(), (db > 3).mean())


def test_warp_compose_overlay_fused_on_tpu():
    """The fused warp+overlay canvas kernel (Mosaic lowering) must be
    byte-identical to the warp_packed -> compose_canvas pipeline it
    replaces — the interpret-mode twin lives in test_pallas_warp.py."""
    from pano_tpu.ops import pallas_compose as PC
    from pano_tpu.ops import pallas_warp as PW

    r = np.random.default_rng(23)
    hl, wl, hr, wr = 200, 520, 200, 300
    win_h, win_w, pad_h, pad_w = 256, 512, 384, 768
    ty, tx, wy0, wx0 = 128, 256, 128, 256
    left = jnp.asarray(r.integers(0, 256, (hl, wl, 3)).astype(np.uint8))
    right = r.integers(0, 256, (hr, wr, 3)).astype(np.uint8)
    m = np.array(
        [[0.98, 0.015, 300.0], [-0.01, 1.01, 140.0], [1.5e-5, -1e-5, 1.0]]
    )
    m_inv = np.linalg.inv(m)
    packed = PW.pack_bgra(jnp.asarray(right))
    i32 = lambda v: jnp.asarray(v, jnp.int32)

    fused = np.asarray(
        PW.warp_compose_overlay(
            packed, PW.make_params(m_inv, 0.0, 0.0, hr, wr), left,
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
            left, rgb_win, None, i32(ty), i32(tx), i32(wy0), i32(wx0),
            pad_h, pad_w, "overlay",
        )
    )
    np.testing.assert_array_equal(fused, pipe)
