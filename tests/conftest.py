import os

# Hermetic tests: run JAX on a virtual 8-device CPU mesh so data-parallel
# sharding paths are exercised without TPU hardware.  NOTE: this image's
# sitecustomize imports jax and registers the 'axon' TPU backend before
# conftest runs, so env vars alone are too late — force the platform via
# jax.config as well.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def fixture_root(tmp_path_factory):
    """Synthetic mini-KITTI tree shared across the test session."""
    from side_tpu.data.synthetic import build_fixture
    root = tmp_path_factory.mktemp("data")
    build_fixture(str(root), n_train=4, n_val=2, seed=0)
    return str(root)
