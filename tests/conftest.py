"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment pins JAX_PLATFORMS=axon (the TPU tunnel) and the plugin
wins over the env var, so we must force the CPU platform through
jax.config after import. XLA_FLAGS must still be set before jax
initializes its backends.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# tests exercise the CLI in-process, which would otherwise turn on the
# persistent XLA compilation cache for the whole pytest process; disk
# cache writes have aborted the interpreter under concurrent jax
# processes (zstd write abort), and CPU-mesh compiles are cheap anyway
os.environ.setdefault("OPENSPLAT_TPU_CACHE", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Full-suite runs accumulate hundreds of compiled CPU-mesh
    executables in one process and have crashed the XLA CPU compiler
    (SIGSEGV/SIGABRT) near the end of the run — position-dependent, not
    test-dependent (every crashing test passes in isolation). Dropping
    the executable caches at module boundaries keeps the process small;
    cross-module cache reuse is negligible."""
    yield
    jax.clear_caches()
