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
# silence XLA's pseudo-feature mismatch warnings from cached CPU AOT loads
# (+prefer-no-scatter/gather are compile preferences, not host ISA bits)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's wall time is dominated by
# CPU compiles of the big fused/shard_map programs, repeated in every xdist
# worker and every run. Cache entries (compile time >= 2 s) are shared
# across workers and across runs. Opt out with MPN_NO_COMPILE_CACHE=1.
if not os.environ.get("MPN_NO_COMPILE_CACHE"):
    _cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on CPU; got " + repr(jax.devices()[:2])
    )
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (the multi-minute shard_map compile "
             "and training tests; also enabled by RUN_SLOW=1)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute test; excluded from the default "
        "lane, run with --runslow / RUN_SLOW=1")


def pytest_collection_modifyitems(config, items):
    import pytest

    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(
        reason="slow lane (run with --runslow or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
