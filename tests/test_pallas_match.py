"""Pallas MXU streaming-matcher kernel vs the dense/XLA-streaming oracles
(interpret mode on CPU). The kernel must be BIT-identical: same best SSD,
same index tie-breaking (lowest column / earliest tile; lowest query row
for the cross-check column best), same validity decisions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from pano_tpu.ops import match as match_ops
from pano_tpu.ops import pallas_match


def _random_descs(rng, k, d_used=75, d_pad=128, dup_frac=0.3):
    """u8-valued descriptors with deliberate duplicates (tie pressure)."""
    desc = rng.integers(0, 256, (k, d_pad)).astype(np.float32)
    desc[:, d_used:] = 0.0
    n_dup = int(k * dup_frac)
    src = rng.integers(0, k, n_dup)
    dst = rng.integers(0, k, n_dup)
    desc[dst] = desc[src]   # exact ties in SSD
    valid = rng.random(k) > 0.15
    return jnp.asarray(desc), jnp.asarray(valid)


@pytest.mark.parametrize("ratio,cross", [(0.0, False), (0.8, True)])
def test_pallas_match_bit_identical_to_dense(ratio, cross):
    rng = np.random.default_rng(3)
    kq = pallas_match.QT          # one q tile
    kt = 2 * pallas_match.TT + 37  # forces train padding
    dq, vq = _random_descs(rng, kq)
    dt, vt = _random_descs(rng, kt)
    thresh = 1.2e6

    dense = match_ops.match_descriptors(
        dq, vq, dt, vt, thresh, ratio_thresh=ratio, cross_check=cross,
        block_size=0, use_pallas=False,
    )
    stream = match_ops.match_descriptors(
        dq, vq, dt, vt, thresh, ratio_thresh=ratio, cross_check=cross,
        block_size=1024, use_pallas=False,
    )
    with pltpu.force_tpu_interpret_mode():
        kern = match_ops.match_descriptors(
            dq, vq, dt, vt, thresh, ratio_thresh=ratio, cross_check=cross,
            use_pallas=True,
        )
    for name, a, b in (
        ("valid", dense.valid, kern.valid),
        ("idx", dense.train_idx, kern.train_idx),
        ("ssd", dense.ssd, kern.ssd),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), name)
    np.testing.assert_array_equal(
        np.asarray(stream.valid), np.asarray(kern.valid)
    )


def test_pallas_match_multi_q_tiles_and_all_invalid_train():
    rng = np.random.default_rng(5)
    kq = 2 * pallas_match.QT
    kt = pallas_match.TT
    dq, vq = _random_descs(rng, kq)
    dt, _ = _random_descs(rng, kt)
    vt = jnp.zeros(kt, bool)   # nothing to match against
    dense = match_ops.match_descriptors(
        dq, vq, dt, vt, 1e9, use_pallas=False, block_size=0
    )
    with pltpu.force_tpu_interpret_mode():
        kern = match_ops.match_descriptors(
            dq, vq, dt, vt, 1e9, use_pallas=True
        )
    assert int(kern.count()) == 0
    np.testing.assert_array_equal(
        np.asarray(dense.valid), np.asarray(kern.valid)
    )


def test_pallas_match_vmap_falls_back_to_xla_cores():
    rng = np.random.default_rng(7)
    kq = pallas_match.QT
    kt = pallas_match.TT
    dq, vq = _random_descs(rng, kq)
    dt, vt = _random_descs(rng, kt)
    b_dq = jnp.stack([dq, dq[::-1]])
    b_vq = jnp.stack([vq, vq[::-1]])
    b_dt = jnp.stack([dt, dt[::-1]])
    b_vt = jnp.stack([vt, vt[::-1]])
    outs = jax.vmap(pallas_match.match_streaming_pallas)(
        b_dq, b_vq, b_dt, b_vt
    )
    for el in range(2):  # BOTH batch elements against their own oracle
        ref = pallas_match._cores_xla(
            b_dq[el], b_vq[el], b_dt[el], b_vt[el]
        )
        for got, want in zip(outs, ref):
            np.testing.assert_array_equal(
                np.asarray(got[el]), np.asarray(want)
            )
    # Mixed in_axes (shared train side) must broadcast, not crash.
    outs2 = jax.vmap(
        pallas_match.match_streaming_pallas, in_axes=(0, 0, None, None)
    )(b_dq, b_vq, dt, vt)
    ref0 = pallas_match._cores_xla(dq, vq, dt, vt)
    for got, want in zip(outs2, ref0):
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want))


def test_pallas_match_vmap_large_k_uses_streaming_cores():
    """Above the dense-twin size cutoff the batch rule must stream train
    tiles (a dense fallback would be 256 MB/pair at the pipeline's real
    K=8192 — the exact memory plan the kernel exists to avoid), and the
    streaming twin must match the dense twin bit-for-bit."""
    rng = np.random.default_rng(9)
    kq, kt = 4096, 2 * pallas_match.TT   # kq * kt > the 2048^2 cutoff
    dq, vq = _random_descs(rng, kq)
    dt, vt = _random_descs(rng, kt)
    outs = jax.vmap(
        pallas_match.match_streaming_pallas, in_axes=(None, None, 0, 0)
    )(dq, vq, jnp.stack([dt, dt[::-1]]), jnp.stack([vt, vt[::-1]]))
    ref = pallas_match._cores_xla(dq, vq, dt, vt)
    for got, want in zip(outs, ref):
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want))
    # The streaming twin itself is bit-identical to the dense twin.
    stream = pallas_match._cores_stream_xla(dq, vq, dt, vt)
    for got, want in zip(stream, ref):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
