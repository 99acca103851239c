"""Pallas streaming SSD-matcher kernel: the distance matrix never leaves VMEM.

The XLA streaming matcher (ops/match._match_descriptors_streaming) already
avoids materializing the full (Kq, Kt) SSD matrix, but XLA will not fuse a
matmul into the three reductions that consume each tile (row min, row
argmin/second, column argmin), so every (Kq, block) tile round-trips HBM:
at K=8192 that is ~256 MB of writes + ~512 MB of re-reads per pair,
~0.5 ms of pure tile traffic on v5e (measured per-op: 8 kOutput matmul
fusions + 16 iota_reduce fusions).

Reference analog: the CUDA matcher materializes the FULL K x K matrix in
GPU global memory (src/gpu/harris_matcher.cu:127) and re-reads it from a
second kernel (findBestMatchesKernel, :57-81) — the same
memory-system mistake, one level up.

This kernel is the flash-attention pattern applied to a distance matrix:

  * grid (q_tiles, t_tiles), t minor. Each step computes one
    (QT, TT) SSD tile as ONE MXU matmul (descriptors are u8-valued, exact
    in bf16; accumulation is f32, so the tile is bit-identical to the f32
    XLA matmul) plus the rank-1 norm terms — entirely in VMEM/registers.
  * per-query carries (running best / best index / second best) live in
    VMEM scratch across the t sweep and are written out once per q tile;
    the merge math is copied from the XLA streaming matcher so
    tie-breaking is bit-identical (strict <, earlier tiles win; in-tile
    argmin takes the lowest index).
  * the cross-check's per-train-column best query row accumulates in a
    (n_tt, TT) scratch across q tiles (strict < keeps the lowest query
    row, matching argmin-over-rows) and is flushed on the last q tile.

Outputs (best, idx, second, col_best) feed the same validity/ratio/
cross-check epilogue as the XLA paths (ops/match.py) — the kernel changes
the memory plan, not the semantics; tests assert bit-identical Matches.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QT = 512     # query rows per grid step ((QT, TT) f32 tile = 2 MB in VMEM)
TT = 1024    # train columns per tile
_BIG = 2**30  # plain int: a jnp constant here would be a captured tracer


def _kernel(
    q_ref,      # (QT, D) bf16 query descriptors
    t_ref,      # (TT, D) bf16 train descriptors
    qsq_ref,    # (QT, 1) f32 |q|^2
    tsq_ref,    # (1, TT) f32 |t|^2
    vq_ref,     # (QT, 1) f32 query validity (1.0 / 0.0)
    vt_ref,     # (1, TT) f32 train validity
    best_ref,   # (QT, 1) f32 out
    idx_ref,    # (QT, 1) i32 out
    sec_ref,    # (QT, 1) f32 out
    cb_ref,     # (1, TT) i32 out (per-train-column best query row)
    rb,         # (QT, 1) f32 scratch: running best
    ri,         # (QT, 1) i32 scratch: running best index
    rs,         # (QT, 1) f32 scratch: running second best
    cv,         # (n_tt, TT) f32 scratch: per-column running min
    ci,         # (n_tt, TT) i32 scratch: per-column best query row
    *,
    n_qt: int,
    n_tt: int,
):
    qi = pl.program_id(0)
    ti = pl.program_id(1)
    inf = jnp.float32(jnp.inf)

    @pl.when(ti == 0)
    def _reset_row_carry():
        rb[...] = jnp.full((QT, 1), inf, jnp.float32)
        ri[...] = jnp.zeros((QT, 1), jnp.int32)
        rs[...] = jnp.full((QT, 1), inf, jnp.float32)

    @pl.when(qi == 0)
    def _reset_col_carry():
        cv[pl.ds(ti, 1), :] = jnp.full((1, TT), inf, jnp.float32)
        ci[pl.ds(ti, 1), :] = jnp.zeros((1, TT), jnp.int32)

    # One MXU matmul per tile; bf16 x bf16 -> f32 accumulation is EXACT for
    # u8-valued descriptors (values <= 255 are representable in bf16 and
    # dot products stay < 2^24), bit-matching the XLA paths' DEFAULT
    # precision (ops/match.py match_descriptors).
    # precision must be DEFAULT explicitly: the package-level
    # jax_default_matmul_precision="highest" would stamp an fp32 contract
    # precision onto the bf16 operands, which Mosaic rejects ("Bad lhs
    # type"). DEFAULT is exact here anyway (u8 values, f32 accumulation).
    dots = jax.lax.dot_general(
        q_ref[...], t_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )                                                    # (QT, TT)
    ssd = qsq_ref[...] + tsq_ref[...] - 2.0 * dots
    ssd = jnp.where(vt_ref[...] > 0.0, ssd, inf)

    lanes = lax.broadcasted_iota(jnp.int32, (QT, TT), 1)
    rows = lax.broadcasted_iota(jnp.int32, (QT, TT), 0)

    # Tile-local row best / argmin (lowest column wins ties, like argmin)
    # and second best (best column masked out).
    tb = jnp.min(ssd, axis=1, keepdims=True)             # (QT, 1)
    tb_idx = jnp.min(
        jnp.where(ssd == tb, lanes, _BIG), axis=1, keepdims=True
    )
    ts = jnp.min(
        jnp.where(lanes == tb_idx, inf, ssd), axis=1, keepdims=True
    )

    # Merge into the running carries — the XLA streaming matcher's exact
    # formulas (match.py _match_descriptors_streaming.step).
    best = rb[...]
    rs[...] = jnp.minimum(jnp.maximum(best, tb), jnp.minimum(rs[...], ts))
    take = tb < best
    rb[...] = jnp.minimum(best, tb)
    ri[...] = jnp.where(take, ti * TT + tb_idx, ri[...])

    # Column best over valid query rows (cross-check), lowest row on ties.
    ssd_q = jnp.where(vq_ref[...] > 0.0, ssd, inf)
    cm = jnp.min(ssd_q, axis=0, keepdims=True)           # (1, TT)
    cm_idx = jnp.min(
        jnp.where(ssd_q == cm, rows, _BIG), axis=0, keepdims=True
    )
    prev = cv[pl.ds(ti, 1), :]
    ctake = cm < prev                                     # strict: lower
    cv[pl.ds(ti, 1), :] = jnp.minimum(prev, cm)           # q rows win ties
    ci[pl.ds(ti, 1), :] = jnp.where(
        ctake, qi * QT + cm_idx, ci[pl.ds(ti, 1), :]
    )

    @pl.when(ti == n_tt - 1)
    def _flush_rows():
        best_ref[...] = rb[...]
        idx_ref[...] = ri[...]
        sec_ref[...] = rs[...]

    @pl.when(qi == n_qt - 1)
    def _flush_cols():
        cb_ref[...] = ci[pl.ds(ti, 1), :]


def _cores_xla(desc_q, valid_q, desc_t, valid_t):
    """Dense XLA twin of the kernel's cores (the SMALL-problem custom_vmap
    batch rule — batched pallas_call with carries cannot lower on Mosaic).
    Same values and tie-breaking (argmin = lowest index)."""
    q_sq = jnp.sum(desc_q * desc_q, axis=1)
    t_sq = jnp.sum(desc_t * desc_t, axis=1)
    dots = jnp.dot(
        desc_q, desc_t.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    ssd = q_sq[:, None] + t_sq[None, :] - 2.0 * dots
    ssd = jnp.where(valid_t[None, :], ssd, jnp.inf)
    best_idx = jnp.argmin(ssd, axis=1).astype(jnp.int32)
    best = jnp.min(ssd, axis=1)
    cols = jnp.arange(ssd.shape[1], dtype=jnp.int32)
    second = jnp.min(
        jnp.where(cols[None, :] == best_idx[:, None], jnp.inf, ssd), axis=1
    )
    col_best = jnp.argmin(
        jnp.where(valid_q[:, None], ssd, jnp.inf), axis=0
    ).astype(jnp.int32)
    return best, best_idx, second, col_best


def _cores_pallas(
    desc_q: jnp.ndarray,   # (Kq, D) f32, D % 128 == 0
    valid_q: jnp.ndarray,  # (Kq,) bool
    desc_t: jnp.ndarray,   # (Kt, D) f32
    valid_t: jnp.ndarray,  # (Kt,) bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    kq, d = desc_q.shape
    kt = desc_t.shape[0]
    assert kq % QT == 0 and kt % TT == 0 and d % 128 == 0, (kq, kt, d)
    n_qt, n_tt = kq // QT, kt // TT

    q_sq = jnp.sum(desc_q * desc_q, axis=1, keepdims=True)     # (Kq, 1)
    t_sq = jnp.sum(desc_t * desc_t, axis=1)[None, :]           # (1, Kt)
    qb = desc_q.astype(jnp.bfloat16)
    tb_ = desc_t.astype(jnp.bfloat16)
    vq = valid_q.astype(jnp.float32)[:, None]
    vt = valid_t.astype(jnp.float32)[None, :]

    grid = (n_qt, n_tt)
    out = pl.pallas_call(
        functools.partial(_kernel, n_qt=n_qt, n_tt=n_tt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((QT, d), lambda qi, ti: (qi, 0)),
            pl.BlockSpec((TT, d), lambda qi, ti: (ti, 0)),
            pl.BlockSpec((QT, 1), lambda qi, ti: (qi, 0)),
            pl.BlockSpec((1, TT), lambda qi, ti: (0, ti)),
            pl.BlockSpec((QT, 1), lambda qi, ti: (qi, 0)),
            pl.BlockSpec((1, TT), lambda qi, ti: (0, ti)),
        ],
        out_specs=[
            pl.BlockSpec((QT, 1), lambda qi, ti: (qi, 0)),
            pl.BlockSpec((QT, 1), lambda qi, ti: (qi, 0)),
            pl.BlockSpec((QT, 1), lambda qi, ti: (qi, 0)),
            pl.BlockSpec((1, TT), lambda qi, ti: (0, ti)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((kq, 1), jnp.float32),
            jax.ShapeDtypeStruct((kq, 1), jnp.int32),
            jax.ShapeDtypeStruct((kq, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, kt), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((QT, 1), jnp.float32),
            pltpu.VMEM((QT, 1), jnp.int32),
            pltpu.VMEM((QT, 1), jnp.float32),
            pltpu.VMEM((n_tt, TT), jnp.float32),
            pltpu.VMEM((n_tt, TT), jnp.int32),
        ],
    )(qb, tb_, q_sq, t_sq, vq, vt)
    best, idx, second, col_best = out
    return best[:, 0], idx[:, 0], second[:, 0], col_best[0]


def _cores_stream_xla(desc_q, valid_q, desc_t, valid_t, block: int = 1024):
    """XLA STREAMING twin of the kernel's cores — the large-problem
    custom_vmap batch rule. Materializing the dense (Kq, Kt) matrix per
    batch element would cost 256 MB/pair at the default K=8192 (the exact
    memory plan both the streaming matcher and this kernel exist to
    avoid); a lax.scan over train tiles keeps it at Kq x block. Values and
    tie-breaking identical to the kernel and the dense twin (strict <,
    earlier tiles win; in-tile argmin takes the lowest index — the same
    merge formulas as match._match_descriptors_streaming)."""
    kq, kt = desc_q.shape[0], desc_t.shape[0]
    assert kt % block == 0, (kt, block)  # kernel callers pad to TT >= block
    n_tiles = kt // block
    q_sq = jnp.sum(desc_q * desc_q, axis=1)
    t_tiles = desc_t.reshape(n_tiles, block, desc_t.shape[1])
    v_tiles = valid_t.reshape(n_tiles, block)
    bases = jnp.arange(n_tiles, dtype=jnp.int32) * block
    cols = jnp.arange(block, dtype=jnp.int32)

    def step(carry, xs):
        best, best_idx, second = carry
        dt, vt, base = xs
        t_sq = jnp.sum(dt * dt, axis=1)
        dots = jnp.dot(
            desc_q, dt.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        ssd = q_sq[:, None] + t_sq[None, :] - 2.0 * dots
        ssd = jnp.where(vt[None, :], ssd, jnp.inf)
        tb_idx = jnp.argmin(ssd, axis=1).astype(jnp.int32)
        tb = jnp.min(ssd, axis=1)
        ts = jnp.min(
            jnp.where(cols[None, :] == tb_idx[:, None], jnp.inf, ssd), axis=1
        )
        cb = jnp.argmin(
            jnp.where(valid_q[:, None], ssd, jnp.inf), axis=0
        ).astype(jnp.int32)
        new_second = jnp.minimum(
            jnp.maximum(best, tb), jnp.minimum(second, ts)
        )
        take = tb < best
        return (
            jnp.minimum(best, tb),
            jnp.where(take, base + tb_idx, best_idx),
            new_second,
        ), cb

    init = (
        jnp.full((kq,), jnp.inf, jnp.float32),
        jnp.zeros((kq,), jnp.int32),
        jnp.full((kq,), jnp.inf, jnp.float32),
    )
    (best, idx, second), col_best = lax.scan(
        step, init, (t_tiles, v_tiles, bases)
    )
    return best, idx, second, col_best.reshape(kt)


@jax.custom_batching.custom_vmap
def _cores(desc_q, valid_q, desc_t, valid_t):
    return _cores_pallas(desc_q, valid_q, desc_t, valid_t)


@_cores.def_vmap
def _cores_rule(axis_size, in_batched, *args):
    # Broadcast any unbatched operand so mixed in_axes vmaps work.
    args = tuple(
        a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
        for a, b in zip(args, in_batched)
    )
    kq, kt = args[0].shape[1], args[2].shape[1]
    core = _cores_xla if kq * kt <= 2048 * 2048 else _cores_stream_xla
    return jax.vmap(core)(*args), (True, True, True, True)


@jax.jit
def match_streaming_pallas(
    desc_q: jnp.ndarray,   # (Kq, D) f32, D % 128 == 0, Kq % QT == 0
    valid_q: jnp.ndarray,  # (Kq,) bool
    desc_t: jnp.ndarray,   # (Kt, D) f32, Kt % TT == 0
    valid_t: jnp.ndarray,  # (Kt,) bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Streaming argmin-SSD cores on the MXU, tiles VMEM-resident.

    Returns (best_ssd (Kq,), best_idx (Kq,), second (Kq,), col_best (Kt,))
    with the same values/tie-breaking as the XLA matchers' pre-epilogue
    quantities (padded/invalid train columns carry row 0 in col_best,
    matching argmin over +inf columns). vmap-safe: batching falls back to
    the dense XLA cores (_cores_xla) — the batched sharded paths' problems
    are small."""
    return _cores(desc_q, valid_q, desc_t, valid_t)
