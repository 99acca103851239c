"""pano_tpu — TPU-native panoramic image stitching framework.

A ground-up JAX/XLA re-design of the pipeline in
Albus-Tan/UCB-CS267-Parallel-Panoramic-Image-Stitching (Harris corners ->
SSD patch matching -> RANSAC homography -> perspective warp -> blending),
built TPU-first: fixed-shape masked tensors, MXU matmuls for matching,
vmapped hypothesis batches for RANSAC, fused warp+blend, and shard_map
scaling over ICI meshes instead of OpenMP threads / CUDA blocks.
"""

import os

import jax

# Persistent XLA compilation cache: first-run compiles of the big warp /
# detection graphs cost minutes on TPU; cache them across processes.
# Opt out with PANO_TPU_NO_CACHE=1.
if not os.environ.get("PANO_TPU_NO_CACHE"):
    _cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/pano_tpu_jax"),
    )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

# Geometry math (3x3 homography chains, 8x8 DLT solves, 9x9 normal matrices)
# needs true float32: the TPU default bf16 matmul precision loses ~1e-2
# relative accuracy, which is fatal for homography estimation. Hot large
# matmuls that tolerate (or are exact under) bf16 opt back in locally with
# precision=DEFAULT (see ops/match.py — uint8-valued descriptors are exactly
# representable in bf16, so the MXU fast path is lossless there).
jax.config.update("jax_default_matmul_precision", "highest")

from pano_tpu.config import (
    DEFAULT_CONFIG,
    HarrisOptions,
    PanoConfig,
    RansacOptions,
    StitchOptions,
)
from pano_tpu.pipeline import PairStitcher, stitch_all_images

__version__ = "0.1.0"

__all__ = [
    "DEFAULT_CONFIG",
    "HarrisOptions",
    "PanoConfig",
    "RansacOptions",
    "StitchOptions",
    "PairStitcher",
    "stitch_all_images",
]
