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
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# The in-process CPU collective rendezvous aborts the whole process if the 8
# virtual-device threads don't all arrive within 40 s — on this 1-core host a
# heavyweight step (or a competing process) serializes the device threads past
# that window and the abort is spurious. Raise both rungs well clear of it.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
               " --xla_cpu_collective_call_terminate_timeout_seconds=900")
os.environ["XLA_FLAGS"] = _flags

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
