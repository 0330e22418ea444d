"""Test configuration: run everything on a simulated 8-device CPU mesh.

Multi-device (data-parallel) logic is tested without TPU hardware via XLA's
host-platform device splitting, per the framework's test strategy
(SURVEY.md §4). Environment must be set before the first ``import jax``.
"""
import os

# Force-assign: the deployment environment pre-sets JAX_PLATFORMS (e.g. to a
# tunneled TPU plugin) and may already have imported jax from sitecustomize
# with jax_platforms overridden in-config, so both the env var and the live
# config must be pinned to CPU. XLA_FLAGS still applies because backends
# initialize lazily on first use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="session")
def goldens():
    def load(name: str):
        return np.load(os.path.join(GOLDEN_DIR, name + ".npz"))

    return load


@pytest.fixture(scope="session")
def hand_model():
    from spherehand_tpu.hand.assets import load_hand_model

    return load_hand_model()
