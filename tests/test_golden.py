"""Golden-quality integration gate: stitch the bundled reference scenes and
grade against the committed reference panoramas.

This is the project's acceptance test (SURVEY §4.1): the reference's own
de-facto test strategy is `pano.sh eval` against `images/*-ref.jpg`
(/root/reference/evaluate_panorama.py:68-119, README.md:120-134). Here it is
CI-enforced: every suite run stitches downscaled oilseed/snow/bridge on the
CPU backend in chain mode and asserts the eval metrics; a regression that
degrades real-scene quality fails the suite.

Thresholds are per-scene because downscaling interacts with the metrics
(seam smoothness is resolution-sensitive; multiband at small scales smooths
more than the reference panorama was smoothed). Measured values on
2026-08-16, asserted with a safety margin:
  oilseed 0.30x overlay    SSIM 0.959, overall Acceptable
  snow    0.35x multiband  SSIM 0.991, overall Good
  bridge  0.20x multiband  SSIM 0.980, overall Acceptable

The @pytest.mark.tpu variant runs the full-resolution scenes on the real
chip (bench sessions: PANO_TPU_TESTS=1 pytest -m tpu); BASELINE.md records
full-res SSIM 0.980-0.990 on all three scenes.
"""

from __future__ import annotations

import dataclasses
import glob
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax

from pano_tpu import eval as ev
from pano_tpu import pipeline
from pano_tpu.config import DEFAULT_CONFIG

IMAGES_DIR = "/root/reference/images"

needs_scenes = pytest.mark.skipif(
    not os.path.isdir(IMAGES_DIR), reason="bundled reference scenes absent"
)

# (scene, downscale factor, blend mode, min SSIM)
CPU_SCENES = [
    ("oilseed", 0.30, "overlay", 0.94),
    ("snow", 0.35, "multiband", 0.95),
    ("bridge", 0.20, "multiband", 0.95),
]


def _load_scene(scene: str, scale: float):
    paths = sorted(glob.glob(os.path.join(IMAGES_DIR, scene, "*.jpg")))
    assert paths, f"no images for scene {scene}"
    imgs = []
    for p in paths:
        im = cv2.imread(p)
        assert im is not None, p
        if scale != 1.0:
            imgs.append(
                cv2.resize(
                    im,
                    (int(im.shape[1] * scale), int(im.shape[0] * scale)),
                    interpolation=cv2.INTER_AREA,
                )
            )
        else:
            imgs.append(im)
    ref = cv2.imread(os.path.join(IMAGES_DIR, f"{scene}-ref.jpg"))
    assert ref is not None
    if scale != 1.0:
        ref = cv2.resize(
            ref,
            (int(ref.shape[1] * scale), int(ref.shape[0] * scale)),
            interpolation=cv2.INTER_AREA,
        )
    return imgs, ref


def _stitch_and_grade(scene: str, scale: float, blend: str):
    imgs, ref = _load_scene(scene, scale)
    cfg = DEFAULT_CONFIG.replace(
        stitch=dataclasses.replace(DEFAULT_CONFIG.stitch, blend=blend)
    )
    pano = pipeline.stitch_all_images(
        imgs, config=cfg, print_timing=False, mode="chain"
    )
    assert pano is not None, f"{scene}: stitch failed"
    cv2.setRNGSeed(0)  # evaluator's cv2.findHomography(RANSAC) determinism
    metrics = ev.compute_metrics(ref, pano)
    cats, overall = ev.grade(metrics)
    return metrics, overall


@needs_scenes
@pytest.mark.parametrize("scene,scale,blend,min_ssim", CPU_SCENES)
def test_golden_scene_quality(scene, scale, blend, min_ssim):
    metrics, overall = _stitch_and_grade(scene, scale, blend)
    assert metrics["SSIM"] >= min_ssim, (scene, metrics)
    assert overall != "Poor", (scene, metrics, overall)


@pytest.mark.tpu
@needs_scenes
@pytest.mark.parametrize("scene", ["oilseed", "snow", "bridge"])
def test_golden_scene_quality_tpu_fullres(scene):
    """Full-resolution golden gate on the real chip (BASELINE.md numbers)."""
    if jax.default_backend() != "tpu":
        pytest.skip("requires a real TPU (PANO_TPU_TESTS=1 pytest -m tpu)")
    blend = "multiband" if scene != "oilseed" else "overlay"
    metrics, overall = _stitch_and_grade(scene, 1.0, blend)
    assert metrics["SSIM"] >= 0.95, (scene, metrics)
    assert overall != "Poor", (scene, metrics, overall)


# ---------------------------------------------------------------------------
# Golden gates through the SHARDED product paths (VERDICT r4 weak #6: the
# SPMD twin was only square-parity-tested; real scenes never flowed through
# batched_stitch_step -> composite_pairs_batched or the sharded chain).
# Reference analog: pano.sh eval gates every implementation
# (/root/reference/pano.sh:246-278).
# ---------------------------------------------------------------------------


@needs_scenes
def test_golden_sharded_chain_oilseed():
    """The sharded chain product path (fused_estimate_batched ->
    composite_global_sharded) on a real scene, graded against the bundled
    reference panorama — same thresholds as the local chain gate."""
    from pano_tpu.parallel import shard

    imgs, ref = _load_scene("oilseed", 0.30)
    cfg = DEFAULT_CONFIG.replace(
        stitch=dataclasses.replace(DEFAULT_CONFIG.stitch, blend="overlay")
    )
    mesh = shard.make_mesh(n_data=8, n_hyp=1)
    pano = shard.stitch_all_images_chain_sharded(
        imgs, cfg, mesh=mesh, print_timing=False
    )
    assert pano is not None
    cv2.setRNGSeed(0)
    metrics = ev.compute_metrics(ref, np.asarray(pano))
    cats, overall = ev.grade(metrics)
    assert metrics["SSIM"] >= 0.94, metrics
    assert overall != "Poor", (metrics, overall)


@needs_scenes
def test_golden_throughput_pairs_match_local_pipeline():
    """The dryrun-certified throughput path (batched_stitch_step ->
    composite_pairs_batched) on REAL oilseed pairs over a (4 data x 2 hyp)
    mesh: each SPMD pair panorama must grade Good/Acceptable against the
    local single-device pipeline's panorama for the same pair (the two
    implementations share the algorithm, so any real drift — placement,
    sharding, kernel routing — shows up as a quality drop here)."""
    import jax

    from pano_tpu import pipeline as pl
    from pano_tpu.parallel import shard

    imgs, _ = _load_scene("oilseed", 0.30)
    # 4 same-shape pairs (the 3 adjacent pairs + one reversed) so the batch
    # divides the 4-wide data axis.
    pairs = [(0, 1), (1, 2), (2, 3), (1, 0)]
    lefts = np.stack([imgs[i] for i, _ in pairs]).astype(np.uint8)
    rights = np.stack([imgs[j] for _, j in pairs]).astype(np.uint8)

    cfg = DEFAULT_CONFIG
    mesh = shard.make_mesh(n_data=4, n_hyp=2)
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = NamedSharding(mesh, P("data"))
    lefts_d = jax.device_put(lefts, spec)
    rights_d = jax.device_put(rights, spec)
    hs_d, counts_d = shard.batched_stitch_step(mesh, lefts_d, rights_d, cfg)
    hs = np.asarray(hs_d, np.float64)
    counts = np.asarray(counts_d)
    assert (counts >= cfg.ransac.min_inliers).all(), counts
    panos = shard.composite_pairs_batched(
        lefts_d, rights_d, hs, np.ones(4, bool), cfg, mesh
    )

    stitcher = pl.get_pair_stitcher(cfg, False)
    for k, (i, j) in enumerate(pairs):
        assert panos[k] is not None
        local = stitcher.stitch_pair(imgs[i], imgs[j])
        assert local is not None
        cv2.setRNGSeed(0)
        metrics = ev.compute_metrics(np.asarray(local), panos[k])
        cats, overall = ev.grade(metrics)
        assert metrics["SSIM"] >= 0.95, (k, metrics)
        assert overall != "Poor", (k, metrics, overall)
