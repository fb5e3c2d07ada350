"""Persistent-compile-cache setup shared by tests, bench, and scripts.

Host-specific hazards handled here:

* XLA:CPU AOT executables are machine-specific: a cache entry written on
  a host with a different CPU feature set loads with mismatched-feature
  warnings and produces WRONG NUMERICS (observed: a cached avx512-host
  executable made a solved LP report MAX_ITER). CPU cache dirs are
  therefore keyed by a hash of /proc/cpuinfo flags.
* **XLA:CPU executable (de)serialization segfaults on this host.** The
  round-4 zlib pin assumed the crash was in the zstandard compressor; it
  was not — crash sites are ``executable.serialize()``
  (jax/_src/compilation_cache.py put path) and
  ``backend.deserialize_executable(...)`` (get path), i.e. inside XLA's
  own CPU AOT serializer, reproduced on both multi-device and
  single-device executables. A write-path crash can additionally leave a
  truncated entry that then crashes every later read of that key. There
  is no in-process mitigation for a C++ segfault, so the **CPU test
  suite runs with the persistent cache DISABLED by default**
  (tests/conftest.py); opt back in with PROXSUITE_TPU_COMPILE_CACHE=1.
  The TPU (axon) path is unaffected — serialization happens on the
  worker — and bench/scripts keep the cache on.

Set JAX_ENABLE_COMPILATION_CACHE=0/false to disable caching entirely.
"""
import hashlib
import os

import jax


def machine_key() -> str:
    """Stable id of this host's CPU feature set (for CPU AOT caches)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return platform.machine()


def enable_compile_cache(base_dir: str, *, per_machine: bool = False) -> None:
    """Enable the persistent compile cache rooted at ``base_dir``.

    per_machine=True appends machine_key() — required for CPU caches,
    unnecessary for TPU caches (no cross-host AOT hazard).
    Honors JAX_ENABLE_COMPILATION_CACHE=0/false as a global opt-out.
    """
    if os.environ.get("JAX_ENABLE_COMPILATION_CACHE", "").lower() in (
            "0", "false"):
        jax.config.update("jax_enable_compilation_cache", False)
        return
    if per_machine:
        # CPU-only: the zstandard pin must NOT be applied under the axon
        # TPU tunnel — with PALLAS_AXON_REMOTE_COMPILE=1 the compressor
        # patch makes solver-sized programs hang indefinitely after
        # compile (reproduced 2x pinned-hang / 2x unpinned-ok on
        # identical programs; the remote-compile transport appears to
        # share jax's compression helpers asymmetrically).
        from jax._src import compilation_cache as _cc

        _cc.zstandard = None
        if getattr(_cc, "zstd", None) is not None:
            _cc.zstd = None
    path = os.path.join(base_dir, machine_key()) if per_machine else base_dir
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # never let a cache IO/compression error abort the caller
    jax.config.update("jax_raise_persistent_cache_errors", False)
