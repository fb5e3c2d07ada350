"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Correctness tests run on CPU in f64 (the reference's native precision) so
the 1e-9 KKT-residual oracle applies; multi-device sharding tests use the
8-device virtual CPU mesh. TPU execution is exercised by bench.py.
"""
import os
import sys

# Unlimited stack BEFORE jax loads: XLA:CPU's compiler recurses deeply on
# the biggest solver programs and its worker threads inherit RLIMIT_STACK
# (glibc default pthread stack = the soft limit, 8 MB here). The rare
# mid-suite SIGSEGVs all landed inside backend_compile_and_load /
# executable (de)serialization -- the classic stack-overflow signature of
# LLVM recursion on large functions. The hard limit is RLIM_INFINITY on
# this host, so raising is always permitted.
# A large FINITE limit, not RLIM_INFINITY: glibc sizes new pthread stacks
# from the soft limit only when it is finite (infinite falls back to the
# small arch default, the opposite of what we want).
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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

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
