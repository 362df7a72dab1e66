"""Test harness: force CPU with 8 virtual devices so sharding tests run
without a TPU (SURVEY.md §4 item 5).

The environment's TPU-relay site hook imports jax at interpreter start with
the ambient JAX_PLATFORMS (a remote TPU tunnel whose backend init stalls
~8 min per process), so mutating os.environ["JAX_PLATFORMS"] here is too
late — the override must go through jax.config.update.  XLA_FLAGS is still
read from the environment at (lazy) CPU-client init, so setting it here
works as long as no jax computation has run yet.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# tests drive cli.main()/viewer in-process; never let them bind the
# persistent compile cache to the developer's real ~/.cache
# (test_persistent_compile_cache re-enables it against a tmpdir)
os.environ.setdefault("RAYMARCH_NO_CACHE", "1")

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled-executable caches after each test module.

    The full 234-test suite in ONE process segfaults deterministically
    inside pjit execution around test ~165 (any half, and every
    file-pair prefix, passes — it is the CUMULATIVE compiled-program
    state that crosses an XLA:CPU threshold, not any test's own
    computation).  Releasing executables between modules keeps the
    per-process code footprint bounded; within-module jit reuse — where
    almost all cache hits happen — is untouched."""
    yield
    jax.clear_caches()
