"""Test configuration: CPU backend with 8 virtual devices.

The reference has no test suite at all (SURVEY §4); our strategy is
(a) per-stage unit tests on synthetic images with known structure,
(b) oracle parity tests against plain-numpy re-implementations,
(c) golden quality gates against the bundled reference panoramas,
(d) multi-chip paths on a fake 8-device CPU mesh — the standard JAX answer
    to testing sharding without hardware.

Env vars must be set before jax initializes, hence this top-level block.
"""

import os
import sys

# PANO_TPU_TESTS=1 leaves the real backend in place so @pytest.mark.tpu
# tests can run on hardware (bench sessions: PANO_TPU_TESTS=1 pytest -m tpu).
_TPU_SESSION = bool(os.environ.get("PANO_TPU_TESTS"))

if not _TPU_SESSION:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# A sitecustomize hook on this machine may register an accelerator plugin and
# override jax_platforms at import time; force CPU at the config level too.
import jax

if not _TPU_SESSION:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def synthetic_pair(h=96, w=128, shift=32, seed=0):
    """A translated pair with rich texture: right = left shifted `shift` px.

    Ground-truth homography right->left is a pure translation by +shift in x.
    """
    r = np.random.default_rng(seed)
    base = r.integers(0, 256, (h, w + shift, 3), dtype=np.uint8)
    # Smooth a little so corners are sparse and matching is unambiguous.
    left = base[:, :w]
    right = base[:, shift:]
    return left.copy(), right.copy()


@pytest.fixture
def translated_pair():
    return synthetic_pair()
