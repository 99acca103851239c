"""shard_map/pjit execution configs: the TPU replacement for OpenMP/CUDA.

Three first-class sharding strategies (see package docstring and SURVEY §2.6):

  * `estimate_homographies_batched` / `stitch_pairs_batched` — batch-of-pairs
    data parallelism over a 'data' mesh axis (throughput mode; no reference
    analog, demanded by the north-star configs).
  * `batched_stitch_step` — the full SPMD step: pairs sharded over 'data',
    RANSAC hypotheses sharded over 'hyp', per-pair winners combined with an
    `all_gather` + argmax over the 'hyp' axis. This is the TPU equivalent of
    the OpenMP per-thread best-H arrays + serial argmax reduction
    (src/openmp/main.cpp:379-442), with ICI collectives instead of shared
    memory.
  * `match_descriptors_sharded` — query rows of the SSD distance problem
    sharded over devices, train side replicated (the K x K matrix never
    materializes globally; cf. the CUDA full-matrix allocation at
    src/gpu/harris_matcher.cu:127).

All functions accept an explicit `jax.sharding.Mesh`; tests drive them on an
8-virtual-device CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count).
"""

from __future__ import annotations

import dataclasses
import sys
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pano_tpu.config import DEFAULT_CONFIG, PanoConfig
from pano_tpu.ops import harris as harris_ops
from pano_tpu.ops import match as match_ops
from pano_tpu.ops import ransac as ransac_ops
from pano_tpu.timer import Timer, print_stage


def make_mesh(
    n_data: Optional[int] = None, n_hyp: int = 1
) -> Mesh:
    """Build a ('data', 'hyp') mesh over the available devices."""
    n_total = len(jax.devices())
    if n_data is None:
        n_data = n_total // n_hyp
    # Auto axis types: we annotate boundaries (device_put / shard_map) and
    # let the partitioner propagate, rather than threading explicit
    # sharding-in-types through the whole pipeline.
    return jax.make_mesh(
        (n_data, n_hyp),
        ("data", "hyp"),
        axis_types=(jax.sharding.AxisType.Auto,) * 2,
    )


# --------------------------------------------------------------------------
# Pure per-pair homography core (shared by all sharded entry points)
# --------------------------------------------------------------------------

def _pair_points(left, right, harris_opts):
    """Detect + match one pair; returns compacted match points.

    Matching direction follows the pipeline: right image is the query, left
    the train, so H maps right->left (src/serial/main.cpp:319-328).
    """
    kps_l = harris_ops.harris_detect(left, harris_opts)
    kps_r = harris_ops.harris_detect(right, harris_opts)
    m = match_ops.match_keypoints(kps_r, kps_l, right, left, harris_opts)
    return match_ops.gather_match_points(kps_r, kps_l, m)


def estimate_homographies_batched(
    lefts: jnp.ndarray,          # (B, H, W, 3) uint8
    rights: jnp.ndarray,         # (B, H, W, 3) uint8
    config: PanoConfig = DEFAULT_CONFIG,
    mesh: Optional[Mesh] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batch of pairs -> (H (B,3,3), inlier_count (B,), ok (B,)).

    Pure data parallelism: the batch axis is sharded over the mesh's 'data'
    axis via sharding annotations; XLA partitions the whole
    detect->match->RANSAC graph with no collectives.
    """
    h_opts, r_opts = config.harris, config.ransac

    def one(left, right):
        pq, pt, v = _pair_points(left, right, h_opts)
        res = ransac_ops.ransac_homography(pq, pt, v, r_opts)
        return res.H, res.inlier_count, res.ok

    fn = jax.vmap(one)
    if mesh is not None:
        spec = NamedSharding(mesh, P("data"))
        lefts = jax.device_put(lefts, spec)
        rights = jax.device_put(rights, spec)
        fn = jax.jit(
            fn,
            in_shardings=(spec, spec),
            out_shardings=(
                NamedSharding(mesh, P("data")),
                NamedSharding(mesh, P("data")),
                NamedSharding(mesh, P("data")),
            ),
        )
    else:
        fn = jax.jit(fn)
    return fn(lefts, rights)


def batched_stitch_step(
    mesh: Mesh,
    lefts: jnp.ndarray,
    rights: jnp.ndarray,
    config: PanoConfig = DEFAULT_CONFIG,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full SPMD pipeline step under shard_map: ('data' x 'hyp') mesh.

    Each device processes B/n_data pairs and num_iterations/n_hyp RANSAC
    hypotheses; winners are combined with all_gather over 'hyp'. Returns
    (H (B,3,3), inlier_count (B,)) with the batch axis sharded over 'data'.
    """
    h_opts, r_opts = config.harris, config.ransac
    n_hyp = mesh.shape["hyp"]
    n_data = mesh.shape["data"]
    b = lefts.shape[0]
    if b % n_data != 0:
        raise ValueError(f"batch {b} not divisible by data axis {n_data}")
    if r_opts.num_iterations % n_hyp != 0:
        raise ValueError("num_iterations not divisible by hyp axis")
    iters_local = r_opts.num_iterations // n_hyp

    def per_pair(left, right, hyp_idx):
        pq, pt, v = _pair_points(left, right, h_opts)
        key = jax.random.fold_in(jax.random.PRNGKey(r_opts.seed), hyp_idx)
        best_h, best_count = ransac_ops.ransac_best_hypothesis(
            key, pq, pt, v,
            iters_local, r_opts.num_samples, r_opts.distance_threshold,
        )
        return best_h, best_count, pq, pt, v

    def spmd(lefts_l, rights_l):
        hyp_idx = lax.axis_index("hyp")
        best_h, best_count, pq, pt, v = jax.vmap(
            lambda l, r: per_pair(l, r, hyp_idx)
        )(lefts_l, rights_l)

        # Combine disjoint hypothesis streams: all_gather over 'hyp' + argmax
        # (ICI collective replacing the OpenMP serial argmax reduction).
        all_h = lax.all_gather(best_h, "hyp")        # (n_hyp, b_l, 3, 3)
        all_c = lax.all_gather(best_count, "hyp")    # (n_hyp, b_l)
        win = jnp.argmax(all_c, axis=0)              # (b_l,)
        h_best = jnp.take_along_axis(
            all_h, win[None, :, None, None], axis=0
        )[0]
        c_best = jnp.take_along_axis(all_c, win[None, :], axis=0)[0]

        # Finalize (guard + inlier mask + refine) — replicated over 'hyp'.
        res = jax.vmap(
            lambda hh, cc, a, bb, vv: ransac_ops.finalize_ransac(
                hh, cc, a, bb, vv, r_opts
            )
        )(h_best, c_best, pq, pt, v)
        return res.H, res.inlier_count

    fn = jax.shard_map(
        spmd,
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )
    return jax.jit(fn)(lefts, rights)


def stitch_pairs_batched(
    lefts: jnp.ndarray,          # (B, H, W, 3) uint8 — same-shape pairs
    rights: jnp.ndarray,         # (B, H, W, 3) uint8
    config: PanoConfig = DEFAULT_CONFIG,
    mesh: Optional[Mesh] = None,
) -> List[Optional[np.ndarray]]:
    """Throughput mode: stitch a batch of independent pairs.

    Homography estimation runs batched and sharded over the mesh's 'data'
    axis (estimate_homographies_batched); compositing runs per pair (canvas
    sizes are data-dependent). Returns a list of host uint8 panoramas (None
    for failed pairs).
    """
    from pano_tpu.pipeline import PairStitcher

    hs, counts, ok = estimate_homographies_batched(
        lefts, rights, config, mesh
    )
    hs = np.asarray(hs, np.float64)
    ok = np.asarray(ok)
    stitcher = PairStitcher(config, print_timing=False)
    out: List[Optional[np.ndarray]] = []
    for b in range(lefts.shape[0]):
        if not ok[b]:
            out.append(None)
            continue
        canvas = stitcher.composite(lefts[b], rights[b], hs[b])
        out.append(np.asarray(canvas))
    return out


# --------------------------------------------------------------------------
# Sharded matching (query rows over devices)
# --------------------------------------------------------------------------

def match_descriptors_sharded(
    desc_q: jnp.ndarray,
    valid_q: jnp.ndarray,
    desc_t: jnp.ndarray,
    valid_t: jnp.ndarray,
    max_ssd_thresh: float,
    mesh: Mesh,
    axis: str = "data",
) -> match_ops.Matches:
    """Row-sharded brute-force matching: each device owns K/n query rows and
    the full train set; results concatenate along the query axis with no
    cross-device traffic (argmin is row-local)."""
    n = mesh.shape[axis]
    if desc_q.shape[0] % n != 0:
        raise ValueError(f"query rows {desc_q.shape[0]} not divisible by {n}")

    def local(dq, vq, dt, vt):
        return match_ops.match_descriptors(dq, vq, dt, vt, max_ssd_thresh)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=match_ops.Matches(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(fn)(desc_q, valid_q, desc_t, valid_t)


# --------------------------------------------------------------------------
# Sharded fold (drop-in for pipeline.stitch_all_images)
# --------------------------------------------------------------------------

def stitch_all_images_sharded(
    images: List[np.ndarray],
    config: PanoConfig = DEFAULT_CONFIG,
    timing_tag: str = "Sharded",
    mesh: Optional[Mesh] = None,
) -> Optional[np.ndarray]:
    """Left-fold stitch with RANSAC hypotheses sharded over all devices.

    The fold itself is sequential (each stitch depends on the previous
    panorama — the reference has the same serialization point,
    src/serial/main.cpp:395-414); within each pair, the hypothesis search
    runs across the mesh.
    """
    from pano_tpu.pipeline import PairStitcher, stitch_all_images

    n_dev = len(jax.devices())
    if n_dev <= 1 or len(images) < 2:
        return stitch_all_images(
            images, config, timing_tag=timing_tag
        )

    if mesh is None:
        mesh = make_mesh(n_data=1, n_hyp=n_dev)

    t = Timer()
    stitcher = _ShardedPairStitcher(mesh, config, timing_tag=timing_tag)
    panorama = jnp.asarray(images[0], jnp.uint8)
    n = len(images)
    for i in range(1, n):
        print(f"Stitching image {i + 1} of {n}...", flush=True)
        temp = stitcher.stitch_pair(panorama, jnp.asarray(images[i], jnp.uint8))
        if temp is None:
            print(f"Failed to stitch image {i}!", file=sys.stderr)
            continue
        panorama = temp
    print_stage(f"Total Stitching Process ({timing_tag})", t.elapsed())
    return np.asarray(panorama)


class _ShardedPairStitcher:
    """PairStitcher variant whose RANSAC shards hypotheses over the mesh."""

    def __init__(self, mesh: Mesh, config: PanoConfig, timing_tag: str = ""):
        from pano_tpu.pipeline import PairStitcher

        self.mesh = mesh
        self.config = config
        self._inner = PairStitcher(config, timing_tag=timing_tag)
        n_hyp = mesh.shape["hyp"]
        r = config.ransac
        if r.num_iterations % n_hyp != 0:
            r = dataclasses.replace(
                r,
                num_iterations=((r.num_iterations + n_hyp - 1) // n_hyp)
                * n_hyp,
            )
        self._r_opts = r
        self._sharded_search = self._build_search()

    def _build_search(self):
        r = self._r_opts
        mesh = self.mesh
        iters_local = r.num_iterations // mesh.shape["hyp"]

        def spmd(pq, pt, v):
            hyp_idx = lax.axis_index("hyp")
            key = jax.random.fold_in(jax.random.PRNGKey(r.seed), hyp_idx)
            bh, bc = ransac_ops.ransac_best_hypothesis(
                key, pq, pt, v, iters_local, r.num_samples,
                r.distance_threshold,
            )
            all_h = lax.all_gather(bh, "hyp")
            all_c = lax.all_gather(bc, "hyp")
            win = jnp.argmax(all_c)
            return all_h[win], all_c[win]

        fn = jax.shard_map(
            spmd,
            mesh=mesh,
            in_specs=(P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )

        def search(pq, pt, v):
            bh, bc = fn(pq, pt, v)
            return ransac_ops.finalize_ransac(bh, bc, pq, pt, v, r)

        return jax.jit(search)

    def stitch_pair(self, left_dev, right_dev):
        t = Timer()
        s = self._inner
        kps_l = s.detect(left_dev)
        kps_r = s.detect(right_dev)
        matches = s.match(kps_r, kps_l, right_dev, left_dev)
        pq, pt, v = match_ops.gather_match_points(kps_r, kps_l, matches)
        if int(matches.count()) == 0:
            print("Not enough matched corners for stitching!", file=sys.stderr)
            return None

        t_r = Timer()
        res = jax.block_until_ready(self._sharded_search(pq, pt, v))
        if s.print_timing:
            tag = s.timing_tag
            label = (
                f"RANSAC Homography Estimation ({tag})"
                if tag
                else "RANSAC Homography Estimation"
            )
            print_stage(label, t_r.elapsed())

        if not bool(res.ok) and int(res.inlier_count) <= 0:
            print(
                "RANSAC failed to estimate a homography matrix!",
                file=sys.stderr,
            )
            return None
        canvas = s.composite(
            left_dev, right_dev, np.asarray(res.H, np.float64)
        )
        canvas = jax.block_until_ready(canvas)
        if s.print_timing:
            tag = s.timing_tag
            label = f"Image Stitching ({tag})" if tag else "Image Stitching"
            print_stage(label, t.elapsed())
        return canvas
