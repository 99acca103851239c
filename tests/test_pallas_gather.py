"""Pallas band-DMA descriptor-gather kernel vs the XLA flat gather
(interpret mode).

The kernel (ops/pallas_gather.py) replaces the flat 1-D `jnp.take` of
ops/match.extract_patch_descriptors on TPU; these tests pin its contract:
bit-identical packed patches for interior keypoints, and identical
descriptors after the border-validity mask for ALL keypoints (the kernel
clamps patch origins where the XLA path clamps individual taps — the two
differ only on border-invalid rows, which are zeroed downstream).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from pano_tpu.ops import pallas_gather as PG
from pano_tpu.ops import match as M
from pano_tpu.ops.harris import KeyPoints


def _xla_patches(pk, ys, xs, h, w, p):
    half = p // 2
    offs = jnp.arange(-half, half + 1)
    yy = jnp.clip(ys[:, None] + offs[None, :], 0, h - 1)
    xx = jnp.clip(xs[:, None] + offs[None, :], 0, w - 1)
    idx = (yy[:, :, None] * pk.shape[1] + xx[:, None, :]).reshape(
        ys.shape[0], -1
    )
    return np.asarray(jnp.take(pk.reshape(-1), idx, axis=0))


def test_gather_matches_xla_interior(rng):
    h, w = 150, 600
    hp, wp = 152, 640
    p = 5
    k = 64
    pk = jnp.asarray(
        rng.integers(0, 2 ** 24, (hp, wp), dtype=np.int64), jnp.int32
    )
    ys = jnp.asarray(rng.integers(2, h - 3, k), jnp.int32)
    xs = jnp.asarray(rng.integers(2, w - 3, k), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(PG.gather_patches(pk, ys, xs, h=h, w=w, p=p))
    want = _xla_patches(pk, ys, xs, h, w, p)
    np.testing.assert_array_equal(got, want)


def test_gather_clamps_border_origins(rng):
    """Keypoints at / beyond the patch border: origins clamp into the
    interior, so every gathered value is a real in-image pixel (the rows
    are zeroed downstream either way — this pins the no-OOB contract)."""
    h, w = 150, 600
    hp, wp = 152, 640
    p = 5
    pk = jnp.asarray(
        rng.integers(0, 2 ** 24, (hp, wp), dtype=np.int64), jnp.int32
    )
    ys = jnp.asarray([0, 1, h - 1, h - 2, 0, h - 1], jnp.int32)
    xs = jnp.asarray([0, w - 1, 0, w - 1, 5, w - 2], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(PG.gather_patches(pk, ys, xs, h=h, w=w, p=p))
    oy = np.clip(np.asarray(ys) - p // 2, 0, h - p)
    ox = np.clip(np.asarray(xs) - p // 2, 0, w - p)
    pk_np = np.asarray(pk)
    for i in range(len(ys)):
        want = pk_np[oy[i] : oy[i] + p, ox[i] : ox[i] + p].reshape(-1)
        np.testing.assert_array_equal(got[i], want)


def test_extract_descriptors_pallas_path_parity(rng):
    """extract_patch_descriptors(use_pallas=True) == (use_pallas=False)
    for every keypoint after the border mask — the integration contract
    the fused pipeline relies on."""
    h, w = 150, 600
    hp, wp = 152, 640
    k = 128
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    plane = np.zeros((hp, wp), np.int32)
    p32 = img.astype(np.int32)
    plane[:h, :w] = p32[..., 0] | (p32[..., 1] << 8) | (p32[..., 2] << 16)
    # alpha byte rides along in the top bits and must be masked out
    plane[:h, :w] |= 127 << 24
    ys = rng.integers(0, h, k).astype(np.int32)
    xs = rng.integers(0, w, k).astype(np.int32)
    kps = KeyPoints(
        xy=jnp.asarray(np.stack([xs, ys], -1)),
        response=jnp.ones((k,), jnp.float32),
        valid=jnp.ones((k,), bool),
    )
    img_d = jnp.asarray(img)
    plane_d = jnp.asarray(plane)
    with pltpu.force_tpu_interpret_mode():
        d_pal, bv_pal = M.extract_patch_descriptors(
            img_d, kps, 5, packed_plane=plane_d, use_pallas=True
        )
    d_xla, bv_xla = M.extract_patch_descriptors(
        img_d, kps, 5, packed_plane=plane_d, use_pallas=False
    )
    np.testing.assert_array_equal(np.asarray(bv_pal), np.asarray(bv_xla))
    np.testing.assert_array_equal(np.asarray(d_pal), np.asarray(d_xla))


def test_gather_vmap_rule_matches_kernel(rng):
    """jax.vmap(gather_patches) must route through the custom_vmap rule's
    XLA fallback and agree with the per-plane kernel exactly (same
    origin-clamp semantics) — the batched sharded det paths rely on it."""
    h, w = 150, 600
    hp, wp = 152, 640
    p, k = 5, 64
    pk = jnp.asarray(
        rng.integers(0, 2 ** 24, (2, hp, wp), dtype=np.int64), jnp.int32
    )
    ys = jnp.asarray(rng.integers(0, h, (2, k)), jnp.int32)
    xs = jnp.asarray(rng.integers(0, w, (2, k)), jnp.int32)
    gv = jax.vmap(
        lambda a, b, c: PG.gather_patches(a, b, c, h=h, w=w, p=p)
    )(pk, ys, xs)
    for i in range(2):
        with pltpu.force_tpu_interpret_mode():
            gi = PG.gather_patches(pk[i], ys[i], xs[i], h=h, w=w, p=p)
        np.testing.assert_array_equal(np.asarray(gv[i]), np.asarray(gi))
