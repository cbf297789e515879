"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sharding tests need multiple devices; unit tests are indifferent. Setting the
flags here (before JAX initialises) keeps the suite hermetic — no TPU needed.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The env var alone is not enough on machines whose site config forces a
# different platform; the config update below always wins.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from gbp_poplar_tpu.utils import balio


@pytest.fixture(scope="session")
def synthetic():
    return balio.synthetic_problem(n_keyframes=6, n_points=60, seed=0,
                                   pixel_noise=0.5)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def has_sequences() -> bool:
    try:
        balio.find_sequence("fr2robot2")
        return True
    except FileNotFoundError:
        return False


requires_sequences = pytest.mark.skipif(
    not has_sequences(), reason="TUM sequences not available"
)
