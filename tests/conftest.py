"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Correctness tests run on CPU in f64 (the reference's native precision) so
the 1e-9 KKT-residual oracle applies; multi-device sharding tests use the
8-device virtual CPU mesh. TPU execution is exercised by bench.py.

Suite-stability hardening (round 5): full-suite runs on this host
intermittently SIGSEGV inside XLA:CPU's backend_compile_and_load after
~60-90 tests -- never in any single file or prefix run in isolation.
Mitigations layered below: big thread stacks (LLVM recursion), serial
codegen (compile-thread races), persistent cache off (the executable
(de)serializer also crashed), and per-module jax.clear_caches() (bounds
resident JIT executables + heap so late compiles don't allocate in a
degraded address space).
"""
import gc
import os
import sys

# Large FINITE stack limit BEFORE jax loads: XLA compile threads inherit
# RLIMIT_STACK (glibc sizes pthread stacks from the finite soft limit;
# RLIM_INFINITY would fall back to the small arch default).
try:
    import resource

    resource.setrlimit(resource.RLIMIT_STACK,
                       (512 << 20, resource.RLIM_INFINITY))
except Exception:  # pragma: no cover - platform without resource
    pass

# NOTE: this environment force-sets JAX_PLATFORMS=axon at import time (env
# prefixes are overridden), so the only reliable CPU pin is
# jax.config.update("jax_platforms", "cpu") below, before first backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # Serial LLVM codegen: parallel codegen splits big modules across
    # threads; crash sites matched compile-time races on large programs.
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: DISABLED by default for the CPU suite.
# XLA:CPU executable (de)serialization segfaults on this host (see
# proxsuite_tpu/utils/compile_cache.py for the crash sites); a mid-suite
# segfault is strictly worse than paying the compiles. Re-enable with
# PROXSUITE_TPU_COMPILE_CACHE=1 on hosts where the serializer is sound.
if os.environ.get("PROXSUITE_TPU_COMPILE_CACHE", "") == "1":
    from proxsuite_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_compile_cache"),
        per_machine=True)
else:
    jax.config.update("jax_enable_compilation_cache", False)


@pytest.fixture(autouse=True, scope="module")
def _bound_resident_executables():
    """Release compiled executables after each test module.

    A full-suite run compiles hundreds of distinct solver programs (MBs
    of JIT code each) that jax's in-process caches pin for the whole
    session; the late-suite compile crashes correlate with that
    accumulation. Programs are rarely shared across files (different
    settings/shapes), so per-module clearing costs little and keeps the
    JIT footprint bounded.
    """
    yield
    jax.clear_caches()
    gc.collect()
