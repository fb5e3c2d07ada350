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
# Persistent compilation cache: the solver compiles one executable per
# (shape, settings) pair (~20s each); cache makes re-runs instant.
# The directory is keyed by the host CPU feature set: XLA:CPU AOT
# executables compiled on a different machine type load with mismatched
# feature warnings and produce WRONG NUMERICS (observed: a cached
# avx512-host executable made a solved LP report MAX_ITER on this host).
import hashlib


def _machine_key():
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return platform.machine()


_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", ".jax_compile_cache", _machine_key())
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
