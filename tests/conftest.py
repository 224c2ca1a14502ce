"""Test configuration.

Tests run on CPU with an 8-device virtual topology so multi-chip sharding paths are
exercised without TPU hardware (the moral equivalent of the fake-backend testing the
reference lacks — SURVEY.md section 4). Must be set before JAX import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the TPU tunnel ('axon') ahead of CPU
# and overrides JAX_PLATFORMS; force CPU explicitly before any backend init.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def pixel_mismatch_fraction(a: np.ndarray, b: np.ndarray, tol: int = 1) -> float:
    """Fraction of pixels whose packed RGB differs by more than ``tol`` in any
    channel. Comparator for golden-frame differential tests."""
    assert a.shape == b.shape

    def channels(p):
        p = p.astype(np.int64)
        return np.stack([(p >> 16) & 255, (p >> 8) & 255, p & 255], axis=-1)

    diff = np.abs(channels(a) - channels(b)).max(axis=-1)
    return float((diff > tol).mean())
