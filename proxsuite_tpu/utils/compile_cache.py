"""Persistent-compile-cache setup shared by tests, bench, and scripts.

Two host-specific hazards are handled here:

* XLA:CPU AOT executables are machine-specific: a cache entry written on
  a host with a different CPU feature set loads with mismatched-feature
  warnings and produces WRONG NUMERICS (observed: a cached avx512-host
  executable made a solved LP report MAX_ITER). CPU cache dirs are
  therefore keyed by a hash of /proc/cpuinfo flags.
* The optional ``zstandard`` C extension segfaults on this host inside
  JAX's persistent-cache write (jax/_src/compilation_cache.py
  compress_executable, reproduced twice mid-suite). JAX falls back to
  zlib when zstandard is unavailable, so we pin the zlib path. The cache
  key includes the compressor name, so stale zstd entries are ignored,
  never misread.

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
