import os

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
