"""Stage timing with the reference's machine-readable stdout contract.

Every pipeline stage in the reference prints `"<Stage Name>: x.xxx ms"` to
stdout (src/serial/main.cpp:43-58 Timer class; printed at :182-183, :241-242,
:301-302, :388-389, :411-412, :448-449). The benchmark layer greps those exact
strings (benchmark_panorama.py:33-35, benchmark_serial_parallel.py:27,51-55),
so the format is an API, not logging. We keep it byte-compatible.

On TPU, honest timing requires jax.block_until_ready on the stage outputs —
the `stage` context manager takes an optional list of arrays to block on.
"""

from __future__ import annotations

import contextlib
import functools as _functools
import time
from typing import Iterable, Optional

import jax


def force_sync(x):
    """Truly wait for device values: block_until_ready + a 1-element fetch.

    Some remote-tunnel platforms (e.g. the axon TPU plugin) acknowledge
    block_until_ready before execution finishes; a tiny D2H read is the only
    reliable execution barrier. Returns x unchanged.
    """
    import numpy as np

    x = jax.block_until_ready(x)
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ndim") and leaf.size:
            np.asarray(leaf[(0,) * leaf.ndim])
            break
    return x


@_functools.lru_cache(maxsize=None)
def _band_split_fn(h: int, n: int):
    """One jitted row-band splitter per (height, bands): a single executable
    returning n contiguous band buffers (NOT n separate eager __getitem__
    slices, each of which would compile its own tiny executable — seconds of
    one-shot latency through the tunnel's compile path)."""
    from jax import lax

    edges = [round(i * h / n) for i in range(n + 1)]

    def f(a):
        return tuple(
            lax.slice_in_dim(a, edges[i], edges[i + 1], axis=0)
            for i in range(n)
        )

    return jax.jit(f)


def fetch_image(x, bands: int = 32, _force: bool = False):
    """Device -> host fetch for LARGE arrays, pipelining the D2H transfer.

    The axon tunnel's D2H path is latency-bound per transfer, not
    bandwidth-bound: one 60 MB fetch moves ~15 MB/s, while splitting into
    row bands and starting every copy before consuming any reaches
    ~45-50 MB/s (measured 2026-08-18, BASELINE.md) — the same panorama
    fetch drops ~3.9 s -> ~1.2 s. On a direct-attached device the bands
    ride parallel DMA and the overhead is one extra device slice pass over
    the array (~0.15 ms for a 60 MB canvas).

    Small arrays, numpy inputs, and CPU-backed arrays pass straight
    through np.asarray (splitting would only add dispatches).
    `_force` (tests) takes the band path regardless of platform/size.
    """
    import numpy as np

    if isinstance(x, np.ndarray):
        return x
    if not _force:
        try:
            plat = next(iter(x.devices())).platform
        except Exception:
            plat = jax.default_backend()
        if (
            plat == "cpu"
            or getattr(x, "nbytes", 0) < (8 << 20)
            or x.ndim < 1
            or x.shape[0] < bands
        ):
            return np.asarray(x)
    parts = _band_split_fn(int(x.shape[0]), int(bands))(x)
    for p in parts:
        p.copy_to_host_async()
    return np.concatenate([np.asarray(p) for p in parts], axis=0)


@_functools.lru_cache(maxsize=1)
def _h2d_pool():
    from concurrent.futures import ThreadPoolExecutor

    return ThreadPoolExecutor(8, thread_name_prefix="pano_h2d")


def push_image(img, device=None, bands: int = 16, _force: bool = False):
    """Host -> device upload for LARGE arrays, pipelining the H2D transfer.

    The tunnel's H2D path serializes per device_put (~20 MB/s for one 39 MB
    image); 16 row-band puts issued from a small thread pool overlap to
    ~40 MB/s (measured 2026-08-18, BASELINE.md) and one device concatenate
    reassembles the image. On a direct-attached device the overhead is the
    concat's extra pass over the array. Small arrays and non-TPU targets
    take the plain jax.device_put path. `_force` (tests) takes the band
    path regardless."""
    import numpy as np

    img = np.asarray(img)
    if not _force:
        plat = (
            device.platform if device is not None else jax.default_backend()
        )
        if (
            plat != "tpu"
            or img.nbytes < (8 << 20)
            or img.ndim < 1
            or img.shape[0] < bands
        ):
            return jax.device_put(img, device)
    edges = [round(i * img.shape[0] / bands) for i in range(bands + 1)]
    parts = list(
        _h2d_pool().map(
            lambda b: jax.device_put(b, device),
            [img[edges[i]:edges[i + 1]] for i in range(bands)],
        )
    )
    import jax.numpy as jnp

    out = jnp.concatenate(parts, axis=0)
    return jax.device_put(out, device) if device is not None else out


class Timer:
    """Wall-clock ms timer (reference Timer, src/serial/main.cpp:43-58)."""

    def __init__(self):
        self._start = time.perf_counter()

    def elapsed(self) -> float:
        return (time.perf_counter() - self._start) * 1e3

    def reset(self) -> None:
        self._start = time.perf_counter()


# Machine-readable stage record, populated by every print_stage call; the
# CLI's --json option dumps it (SURVEY §5 observability plan). Reset per run.
STAGE_RECORDS: list = []


def reset_stage_records() -> None:
    STAGE_RECORDS.clear()


def print_stage(name: str, ms: float) -> None:
    # Exact reference format: fixed, 3 decimals (src/serial/main.cpp:183).
    STAGE_RECORDS.append({"stage": name, "ms": round(ms, 3)})
    print(f"{name}: {ms:.3f} ms", flush=True)


@contextlib.contextmanager
def stage(name: str, block_on: Optional[list] = None, enabled: bool = True):
    """Time a stage; print the reference-format line on exit.

    `block_on` is a mutable list the body may append device arrays to; we
    block_until_ready on them before stopping the clock so device async
    dispatch doesn't make stages look free.
    """
    t = Timer()
    out = block_on if block_on is not None else []
    try:
        yield out
    finally:
        if out:
            jax.block_until_ready(out)
        if enabled:
            print_stage(name, t.elapsed())
