"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; bench.py runs on the real chip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compile cache: the suite re-jits the same static shapes on
# every run; caching cuts wall-clock by an order of magnitude.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_leafgrasp_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize registers the 'axon' TPU backend and
# forces jax_platforms='axon,cpu'; override it after import so the suite
# runs on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def small_scene():
    """270x360 synthetic scene: fast enough for exact-EDT oracles."""
    from leafgrasp_tpu.io.scenes import make_leaf_scene
    mask, depth = make_leaf_scene(height=270, width=360, num_leaves=4,
                                  seed=3, margin=40)
    return mask, depth


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
