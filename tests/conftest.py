import os
import sys

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware.  XLA_FLAGS must be set before the backend initializes;
# the platform choice must go through jax.config because the environment's
# sitecustomize force-registers a TPU plugin and overrides JAX_PLATFORMS.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np
import pytest

DATA_CSV = os.path.join(REPO_ROOT, "data", "example_data.csv")


@pytest.fixture(scope="session")
def example_csv() -> str:
    return DATA_CSV


@pytest.fixture(scope="session")
def small_csv(tmp_path_factory) -> str:
    """First 8000 rows of the example data — fast end-to-end tests."""
    path = tmp_path_factory.mktemp("data") / "small.csv"
    with open(DATA_CSV) as src, open(path, "w") as dst:
        for i, line in enumerate(src):
            if i > 8000:
                break
            dst.write(line)
    return str(path)
