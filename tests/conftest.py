"""Test harness: run everything on CPU with 8 emulated devices.

SURVEY.md §4: "multi-node without a cluster" via
``--xla_force_host_platform_device_count`` — JAX's standard trick for
validating Mesh/pjit sharding without real chips. Must be set before the
first jax import, hence here in conftest.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon TPU plugin's sitecustomize imports jax at interpreter start and
# force-sets jax_platforms="axon,cpu", overriding the env var — undo that so
# tests run on the emulated 8-device CPU backend, not over the TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

# Persistent compilation cache: the suite's wall time is dominated by CPU
# jit compiles; executables are keyed by HLO + jax version, so edited code
# recompiles automatically and repeat runs skip the rest. Gitignored.
_cache = os.path.join(os.path.dirname(__file__), ".xla_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
