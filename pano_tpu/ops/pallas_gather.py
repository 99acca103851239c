"""Pallas patch-gather kernel: keypoint descriptors without scalar gathers.

The descriptor stage gathers a P x P pixel patch around each of K keypoints
(reference: the per-keypoint loops of seqHarrisExtractDescriptors,
src/serial/main.cpp:196-226). XLA lowers the flat 1-D `jnp.take` to a
scalar gather running at ~140M elem/s on v5e — 1.46 ms per 13 MP image for
what is only 0.8 MB of output (ops/match.py extract_patch_descriptors).

This kernel restructures the gather around the memory system:

  * Keypoints are SORTED BY ROW BAND on device (argsort + searchsorted —
    both fast XLA ops), so each kernel step owns one 32-row band of the
    image and the keypoints whose patches start in it.
  * Per band, ONE double-buffered DMA pulls the (40, Wp) packed-i32 band
    HBM -> VMEM (40 = 32 + patch overhang, rounded to sublanes). Total
    HBM traffic is ~1.25x the image — sequential streaming instead of
    204800 scalar fetches.
  * Per keypoint, the patch is cut from the VMEM band with one aligned
    dynamic (16, 256) view, moved to the view's top-left corner by two
    `pltpu.roll` dynamic rotates (one per axis), and flattened to a single
    128-lane row by a strided roll + disjoint-lane sublane sum.
  * The output (K, 128) i32 buffer lives whole in VMEM across the grid
    (1:1 write per keypoint at its ORIGINAL index — the sort never has to
    be undone).

Patch origins are clamped to the image interior (origin clamp instead of
the XLA path's per-tap clamp); the two differ only for border-invalid
keypoints, whose descriptors are zeroed downstream either way.

Requires the packed plane from ops/pallas_harris.harris_scores
(emit_packed) — row/col counts already multiples of the band/lane sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAND = 32            # patch-origin rows per grid step
WIN_R = 48           # DMA rows per band: BAND + aligned-load overhang
LANES = 256          # per-keypoint column window (two 128-lane vregs)


def _make_kernel(
    n_bands: int, wp: int, k_cap: int, p: int,
    a_off: int, b_y: int, b_x: int,
):
    def kernel(ys, xs, order, starts, pk_ref, out_ref, wbuf, sem):
        b = pl.program_id(0)
        hp = pk_ref.shape[0]

        def row0_of(bb):
            # multiply by 8 LAST so Mosaic can prove sublane alignment
            return jnp.minimum(bb * (BAND // 8), hp // 8 - WIN_R // 8) * 8

        slot = lax.rem(b, 2)
        next_slot = lax.rem(b + 1, 2)

        def start_dma(bb, into_slot):
            pltpu.make_async_copy(
                pk_ref.at[pl.ds(row0_of(bb), WIN_R), :],
                wbuf.at[into_slot],
                sem.at[into_slot],
            ).start()

        @pl.when(b == 0)
        def _():
            start_dma(b, slot)

        @pl.when(b + 1 < n_bands)
        def _():
            start_dma(b + 1, next_slot)

        pltpu.make_async_copy(
            pk_ref.at[pl.ds(0, WIN_R), :],   # shape only, for the wait
            wbuf.at[slot],
            sem.at[slot],
        ).wait()

        row0 = row0_of(b)

        def one(k):
            # Decode on the scalar core, hidden in the 8-wide latency
            # shadow: the original keypoint index, then the clamped patch
            # origin from the RAW keypoint coords. Doing this here (instead
            # of passing permuted/clamped arrays) leaves XLA nothing but
            # plain VMEM->SMEM copies for the prefetch operands — the
            # permutation gathers it used to run as ~58 us scalar-space
            # loops per array (6 per pair on the 4K trace).
            ko = order[k]
            oy = jnp.minimum(jnp.maximum(ys[ko] + a_off, 0), b_y)
            ox = jnp.minimum(jnp.maximum(xs[ko] + a_off, 0), b_x)
            yl = oy - row0                     # [0, WIN_R - p]
            # Mosaic vector loads need provably-aligned dynamic starts:
            # multiples of 8 sublanes / 128 lanes (multiply LAST so the
            # compiler can see it). The sub-alignment remainders (dy,
            # xloc) are resolved with in-vreg dynamic_gather round-selects
            # below — the ops/pallas_warp pass-H trick, applied to both
            # axes.
            yl8 = jnp.minimum(yl // 8, (WIN_R - 16) // 8) * 8
            dy = yl - yl8                      # [0, 12)
            c0 = jnp.minimum(ox // 128, wp // 128 - 2) * 128
            xloc = ox - c0                     # [0, 256 - p]
            win16 = wbuf[
                slot, pl.ds(yl8, 16), pl.ds(c0, LANES)
            ]                                  # (16, LANES)

            # Two dynamic rotates move the patch to the top-left corner
            # (tpu.dynamic_rotate — ONE intrinsic per axis, vs the 2-round
            # dynamic_gather selects this replaces), then a strided roll +
            # sublane sum flattens the (p, p) patch into one 128-lane row:
            # row r is masked to lanes [0, p), shifted to [r*p, r*p + p),
            # and the rows' disjoint lane supports make OR == SUM.
            cols = pltpu.roll(
                win16, jnp.remainder(-xloc, LANES), axis=1
            )[:, :128]                         # (16, 128), patch cols at 0
            rows = pltpu.roll(
                cols, jnp.remainder(-dy, 16), axis=0
            )[:8]                              # (8, 128), patch rows at 0
            lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            masked = jnp.where((lane < p) & (sub < p), rows, 0)
            spread = pltpu.roll(
                masked, 0, axis=1, stride=p, stride_axis=0
            )
            flat = jnp.sum(spread, axis=0, keepdims=True)  # (1, 128)
            out_ref[pl.ds(ko, 1), :] = flat

        # Eight independent keypoints per iteration: the per-keypoint chain
        # (scalar address math -> dynamic VMEM view -> rolls -> sum) is
        # latency-bound, so interleaving chains hides most of it (measured
        # 1.35 -> 0.38 ms for 8192 keypoints on a 13 MP plane on v5e; 16-way
        # blows up Mosaic compile time). Tails clamp onto the band's last
        # keypoint — a bit-identical duplicate write, cheaper than
        # predicating the chain.
        s0 = starts[b]
        s1 = starts[b + 1]

        def body(i, _):
            k0 = s0 + 8 * i
            one(k0)
            for d in range(1, 8):
                one(jnp.minimum(k0 + d, s1 - 1))
            return 0

        lax.fori_loop(0, (s1 - s0 + 7) // 8, body, 0)

    return kernel


def _gather_kernel_call(pk, ys, xs, h: int, w: int, p: int, o: int):
    """The Pallas path proper (single plane)."""
    hp, wp = pk.shape
    k_cap = ys.shape[0]
    half = p // 2
    a_off = o - half           # raw coord -> plane patch origin
    b_y, b_x = h - p, w - p    # origin clamp bounds (h/w are PLANE extents)

    # Band sort for the DMA schedule. Only the band KEY is computed on the
    # VPU; the kernel re-derives each clamped origin from the raw coords
    # on the scalar core (see _make_kernel), so every prefetch operand
    # below is either a raw input or a sort/searchsorted output — XLA
    # stages them into SMEM with plain copies instead of scalar-space
    # permutation loops.
    n_bands = -(-hp // BAND)
    key = (
        jnp.clip(ys.astype(jnp.int32) + a_off, 0, b_y) // BAND
    ).astype(jnp.int32)
    _, order = lax.sort(
        (key, lax.iota(jnp.int32, k_cap)), dimension=0, num_keys=1,
        is_stable=True,
    )
    # starts[j] = first sorted position with key >= j = count of keys < j
    # (permutation-invariant, so the RAW key vector works). A searchsorted
    # here lowers to a log2(K)-iteration XLA while loop — measured 14 x
    # ~13 us of serial scalar-space fusions per image on v5e (~0.36 ms per
    # pair); this one (K, n_bands + 1) compare+reduce fusion is ~30 us.
    bins = jnp.arange(n_bands + 1, dtype=jnp.int32)
    starts = jnp.sum(
        key[:, None] < bins[None, :], axis=0, dtype=jnp.int32
    )

    out = pl.pallas_call(
        _make_kernel(n_bands, wp, k_cap, p, a_off, b_y, b_x),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_bands,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (k_cap, 128), lambda b, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, WIN_R, wp), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((k_cap, 128), jnp.int32),
    )(ys.astype(jnp.int32), xs.astype(jnp.int32), order, starts, pk)
    return out[:, : p * p]


def _gather_xla(pk, ys, xs, h: int, w: int, p: int, o: int):
    """Flat-take gather with the KERNEL's semantics (origin clamp, not
    per-tap clamp) — the custom_vmap batch rule (batched pallas_call with
    scalar prefetch cannot lower; the batch paths' planes are small)."""
    half = p // 2
    oy = jnp.clip(ys + (o - half), 0, h - p).astype(jnp.int32)
    ox = jnp.clip(xs + (o - half), 0, w - p).astype(jnp.int32)
    offs = jnp.arange(p, dtype=jnp.int32)
    yy = oy[:, None] + offs[None, :]
    xx = ox[:, None] + offs[None, :]
    idx = (yy[:, :, None] * pk.shape[1] + xx[:, None, :]).reshape(
        ys.shape[0], -1
    )
    return jnp.take(pk.reshape(-1), idx, axis=0)


@functools.lru_cache(maxsize=None)
def _gather_fn(h: int, w: int, p: int, o: int):
    @jax.custom_batching.custom_vmap
    def f(pk, ys, xs):
        return _gather_kernel_call(pk, ys, xs, h, w, p, o)

    @f.def_vmap
    def _rule(axis_size, in_batched, pk, ys, xs):  # noqa: ARG001
        assert all(in_batched), "gather_patches vmap: all args batched"
        out = jax.vmap(lambda a, b, c: _gather_xla(a, b, c, h, w, p, o))(
            pk, ys, xs
        )
        return out, True

    return f


@functools.partial(jax.jit, static_argnames=("h", "w", "p", "origin"))
def gather_patches(
    pk: jnp.ndarray,       # (Hp, Wp) i32 packed plane, Hp % 8 == 0,
    #                        Wp % 128 == 0 (pallas_harris emit_packed shape)
    ys: jnp.ndarray,       # (K,) i32 patch-center rows (IMAGE coords)
    xs: jnp.ndarray,       # (K,) i32 patch-center cols (IMAGE coords)
    h: int = None,         # plane logical rows (defaults to Hp)
    w: int = None,         # plane logical cols (defaults to Wp)
    p: int = 5,            # patch size (odd, <= 8)
    origin: int = 0,       # plane slot of image pixel (0, 0): coords are
    #                        shifted by this INSIDE the kernel so callers
    #                        pass raw keypoint coords (keeps the prefetch
    #                        operands pure copies, no scalar-space math)
) -> jnp.ndarray:
    """Gather (p, p) packed-i32 patches around (ys + origin, xs + origin).

    Returns (K, p*p) i32 in the XLA gather's row-major patch order.
    Origins are clamped to [0, dim - p]; callers zero border-invalid rows
    downstream (extract_patch_descriptors), so the clamp is unobservable.

    vmap-safe: batching falls back to the semantically-identical XLA
    flat-take path (_gather_xla) — the two tie on v5e, so the batched
    sharded paths lose nothing.
    """
    assert p % 2 == 1 and p <= 8, p
    hp, wp = pk.shape
    assert hp % 8 == 0 and wp % 128 == 0, (hp, wp)
    assert hp >= WIN_R, hp
    h = hp if h is None else h
    w = wp if w is None else w
    return _gather_fn(h, w, p, origin)(pk, ys, xs)
