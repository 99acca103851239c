"""2-D convolution primitives (Sobel / Gaussian) as XLA convs.

Reference equivalents:
  * kernel constructors: src/serial/main.cpp:61-91 (getSobelXKernel,
    getSobelYKernel, getGaussianKernel);
  * dense valid-interior convolution with a zero border of width k:
    src/serial/main.cpp:96-116 (convolveSequential), parallelized at
    src/openmp/main.cpp:105-126 and as a CUDA thread-per-pixel kernel at
    src/gpu/convolution.cu:6-54.

TPU-native design: one `lax.conv_general_dilated` in VALID mode followed by a
zero pad back to the input shape — this reproduces the reference's "border k
pixels left zero" semantics bit-for-shape, keeps the data HBM-resident (the
CUDA path round-trips host<->device per call, src/gpu/convolution.cu:25-54),
and lets XLA fuse neighboring elementwise work into the conv.

Convolution orientation: the reference computes a *correlation*
(sum input[y+i, x+j] * kernel[k+i][k+j], src/serial/main.cpp:107-110). All
kernels used are either symmetric (Gaussian) or we pass them as-is to an XLA
conv configured as correlation, so semantics match.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def sobel_x_kernel(dtype=jnp.float32) -> jnp.ndarray:
    """3x3 Sobel X (src/serial/main.cpp:61-65)."""
    return jnp.array(
        [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=dtype
    )


def sobel_y_kernel(dtype=jnp.float32) -> jnp.ndarray:
    """3x3 Sobel Y (src/serial/main.cpp:67-71)."""
    return jnp.array(
        [[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=dtype
    )


def gaussian_kernel(size: int, sigma: float, dtype=jnp.float32) -> jnp.ndarray:
    """Normalized size x size Gaussian (src/serial/main.cpp:73-91).

    Computed in float64 numpy at trace time (it is a compile-time constant)
    then cast, so normalization matches the reference's double math.
    """
    half = size // 2
    xs = np.arange(size) - half
    g = np.exp(-(xs[:, None] ** 2 + xs[None, :] ** 2) / (2.0 * sigma * sigma))
    g /= g.sum()
    return jnp.asarray(g, dtype=dtype)


def conv2d_valid_zero_border(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Correlate `img` (H, W) with `kernel` (k, k); border k//2 px set to 0.

    Matches convolveSequential (src/serial/main.cpp:96-116): output has the
    input shape; only the valid interior is written, the border stays zero.
    """
    ksize = kernel.shape[0]
    assert ksize % 2 == 1, "Kernel size has to be odd"
    k = ksize // 2

    lhs = img[None, None, :, :]                       # NCHW
    rhs = kernel[None, None, :, :].astype(img.dtype)  # OIHW
    out = lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=lax.Precision.HIGHEST,
    )[0, 0]
    # Reference correlation orientation: XLA conv_general_dilated computes
    # correlation (no kernel flip), identical to the reference's loop.
    return jnp.pad(out, ((k, k), (k, k)))


def conv2d_same(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """SAME-padded correlation; used by blending/eval (no reference analog)."""
    lhs = img[None, None, :, :]
    rhs = kernel[None, None, :, :].astype(img.dtype)
    out = lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=lax.Precision.HIGHEST,
    )[0, 0]
    return out
