"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding is exercised without TPU hardware (the strategy the
reference lacks entirely — it has no tests; see SURVEY.md §4)."""

import os

# Force CPU with 8 virtual devices: the session environment may preset a
# TPU platform plugin; unit tests must be deterministic and fast, and the
# multi-chip tests need an 8-device mesh.  Set MHSPGEMM_TEST_TPU=1 to run
# the suite against real hardware instead.
if not os.environ.get("MHSPGEMM_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
