"""Test config: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run against a virtual 8-device CPU mesh — the
driver separately dry-run-compiles the multi-chip path via __graft_entry__.
Must run before jax is imported anywhere.  Note: the environment may preset
JAX_PLATFORMS (e.g. to a remote TPU plugin), so we override unconditionally;
set WAN2GP_TEST_PLATFORM to opt out.
"""
import os

os.environ["JAX_PLATFORMS"] = os.environ.get("WAN2GP_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# jax may already be imported (and JAX_PLATFORMS consumed) by an interpreter
# startup hook, so set the platform through the live config too.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", False)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound XLA:CPU compiler-state growth in long single-process runs
    (observed segfault inside backend_compile after ~300 tests; the
    sharded runner scripts/run_suite_sharded.sh isolates by process,
    this bounds accumulation within one)."""
    yield
    jax.clear_caches()
