import os

import pytest

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (driver benches separately on real TPU).
#
# NOTE: this environment pre-imports jax via PYTHONPATH sitecustomize, so
# JAX_PLATFORMS in os.environ is captured too late — use jax.config instead.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The suite is XLA-compile dominated (single CPU core); a persistent
# compilation cache cuts repeat runs from ~31 min toward the pure-execute
# floor. Keyed by jaxlib version internally, safe to share across runs.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute integration test; skipped unless ALO_FULL_SUITE=1 "
        "or -m slow (CI / pre-round gate runs the full suite)")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("ALO_FULL_SUITE") == "1" or "slow" in (
            config.getoption("-m") or ""):
        return
    skip = pytest.mark.skip(
        reason="slow integration test (set ALO_FULL_SUITE=1 to run)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
