"""Test configuration: force a real CPU backend with 8 virtual devices so
sharding tests run without TPU hardware (SURVEY.md §4: jax.make_mesh on CPU).

The axon sitecustomize registers the TPU-tunnel backend at interpreter start
and force-sets jax_platforms="axon,cpu"; we override it back to plain CPU
*before* any backend is instantiated, otherwise every test compile goes
through the remote-compile tunnel.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402
import numpy as np  # noqa: E402


@pytest.fixture(scope="session")
def rt():
    import real_time_ray_tracing_engine_tpu as rt
    return rt


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
