"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Correctness tests run on CPU in f64 (the reference's native precision) so
the 1e-9 KKT-residual oracle applies; multi-device sharding tests use the
8-device virtual CPU mesh. TPU execution is exercised by bench.py.
"""
import os
import sys

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
