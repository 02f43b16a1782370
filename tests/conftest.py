"""Test configuration: force an 8-virtual-device CPU mesh for the suite.

The environment's sitecustomize registers a remote-TPU ("axon") backend in
every Python process and forces jax_platforms="axon,cpu" via jax.config —
plain env vars cannot override it. Unit tests must run on local CPU (remote
TPU compiles take 20-40s each), so we override the config here, before any
backend is initialized. Multi-chip sharding paths are validated on the
virtual CPU devices; real-TPU behavior is exercised by bench.py.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on CPU; got " + repr(jax.devices()[:2])
    )
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
