"""Test configuration: force a real CPU backend with 8 virtual devices so
sharding tests run without TPU hardware (SURVEY.md §4: jax.make_mesh on CPU).

RUNNER NOTE: run the heavy interpret-mode files in SEPARATE pytest
processes (e.g. `pytest tests/ --ignore=tests/test_pallas.py
--ignore=tests/test_grad.py`, then `pytest tests/test_grad.py`, then
`pytest tests/test_pallas.py`). A single long process slows down
pathologically after ~40 min of accumulated interpret-mode executables
(measured round 5: the same tests pass in 7+3 min as separate processes
after timing out combined); the persistent compilation cache below makes
the split nearly free.

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
# Persistent compilation cache: the suite is XLA-compile-bound (big scan
# bodies, shard_map variants, grad graphs); caching across runs cuts repeat
# wall time from ~15 min to ~2 min.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_rtx_test_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402
import numpy as np  # noqa: E402


@pytest.fixture(scope="session")
def rt():
    import real_time_ray_tracing_engine_tpu as rt
    return rt


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
