"""A/B the 5-round vs 3-round (RV_FAST) warp kernel variants on the real chip.

Times warp_packed standalone on the 4K mountain-pair window with a
representative low-tilt homography (the RV_FAST-eligible common case).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import pano_tpu.ops.pallas_warp as pw
from pano_tpu.timer import force_sync
from pano_tpu import io as pio

res = pio.read_images_from_args(["--dir", "/root/reference/images/mountain"])
right = np.asarray(res.images[1])
print("right image:", right.shape)

# Representative panorama homography: mild rotation + translation, scale ~1.
H = np.array(
    [
        [0.995, 0.01, 900.0],
        [-0.006, 0.998, 40.0],
        [8e-7, -1.0e-6, 1.0],
    ],
    dtype=np.float64,
)
m_inv = np.linalg.inv(H)

out_h, out_w = 3456, 4608  # multiples of (128, 256), ~4K canvas window
off_x, off_y = -400, -100

for rv in (pw.RV, pw.RV_FAST):
    ok = pw.supports_homography(m_inv, out_h, out_w, off_x, off_y, rv=rv)
    print(f"rv={rv} supports={ok}")
    if not ok:
        continue
    packed = pw.pack_bgra(jnp.asarray(right))
    params = pw.make_params(m_inv, off_x, off_y, right.shape[0], right.shape[1])

    @jax.jit
    def run(p, s):
        rgb, w = pw.warp_packed(s, p, out_h, out_w, rv=rv)
        return rgb

    r = run(params, packed)
    force_sync(r)
    N = 100
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(N):
            r = run(params, packed)
        force_sync(r)
        dt = (time.perf_counter() - t0) * 1e3 / N
        best = dt if best is None else min(best, dt)
    print(f"rv={rv}: amortized {best:.3f} ms/warp over {N} dispatches")
