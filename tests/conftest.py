"""Test harness configuration.

All tests run on CPU with 8 virtual XLA devices so multi-chip sharding logic
(`pjit` over a Mesh) is exercised without TPU hardware. Must set the flags before
JAX initializes its backends, hence the env mutation at import time.
"""

import os

# Force-override: the image pins JAX_PLATFORMS=axon (the real TPU tunnel) and a
# sitecustomize registers that backend at interpreter start; tests must run on the
# local CPU backend with 8 virtual devices. XLA_FLAGS must be set before the first
# backend initialization; jax_platforms can be overridden post-import.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)
