"""Test harness config: run everything on a virtual 8-device CPU mesh so
sharding paths compile and execute without TPU hardware (the driver
separately dry-runs multi-chip via __graft_entry__.dryrun_multichip)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_drmlt")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

# the environment pins JAX_PLATFORMS to the TPU plugin before conftest runs;
# override after import so tests run on the virtual 8-device CPU mesh
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """XLA's CPU compiler segfaults deep into a full-suite run (reproduced
    twice at ~190 tests, always inside backend_compile) — apparently from
    accumulated compilation state in one process.  Dropping the in-memory
    executable caches between modules avoids it; the persistent
    compilation cache keeps recompiles cheap."""
    yield
    import jax

    jax.clear_caches()
