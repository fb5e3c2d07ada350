"""Native CPU backend bindings (ctypes over native/libproxqp_cpu.so).

The native solver (native/proxqp_cpu.cpp) runs the same algorithm as the
JAX path with an OpenMP batch loop — the counterpart of the reference's
header-only C++ solver + parallel layer. Two roles:
  * low-latency solves for single/small QPs where XLA dispatch overhead
    dominates;
  * the measured CPU baseline for bench.py (1 core and N cores).

The library auto-builds on first use (make -C native).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import NamedTuple, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libproxqp_cpu.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.proxqp_cpu_solve_batch.restype = ctypes.c_int
    lib.proxqp_cpu_solve_batch.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        dp, dp, dp, dp, dp, dp, dp,
        ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        dp, dp, dp, ip, ip,
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


class CpuBatchResults(NamedTuple):
    x: np.ndarray
    y: np.ndarray
    z: np.ndarray
    status: np.ndarray
    iter: np.ndarray


def solve_batch_cpu(
    H, g, A=None, b=None, C=None, u=None, l=None,
    *,
    eps_abs: float = 1e-5,
    max_iter: int = 0,
    max_iter_in: int = 0,
    rho: float = 0.0,
    mu_eq: float = 0.0,
    mu_in: float = 0.0,
    n_threads: int = 0,
) -> CpuBatchResults:
    """Solve a batch of dense QPs on the CPU (native OpenMP path).

    Arrays have a leading batch axis; missing blocks are size-0.
    n_threads=1 gives the single-core baseline configuration.
    """
    lib = _load()
    H = np.ascontiguousarray(H, np.float64)
    g = np.ascontiguousarray(g, np.float64)
    B, n = g.shape
    A = (np.zeros((B, 0, n)) if A is None
         else np.ascontiguousarray(A, np.float64))
    b = np.zeros((B, 0)) if b is None else np.ascontiguousarray(b, np.float64)
    C = (np.zeros((B, 0, n)) if C is None
         else np.ascontiguousarray(C, np.float64))
    u = np.zeros((B, 0)) if u is None else np.ascontiguousarray(u, np.float64)
    l = np.zeros((B, 0)) if l is None else np.ascontiguousarray(l, np.float64)
    n_eq = A.shape[1]
    n_in = C.shape[1]

    x = np.zeros((B, n))
    y = np.zeros((B, n_eq))
    z = np.zeros((B, n_in))
    status = np.zeros(B, np.int32)
    iters = np.zeros(B, np.int32)

    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    as_dp = lambda a: a.ctypes.data_as(dp)
    lib.proxqp_cpu_solve_batch(
        B, n, n_eq, n_in,
        as_dp(H), as_dp(g), as_dp(A), as_dp(b), as_dp(C), as_dp(u), as_dp(l),
        eps_abs, max_iter, max_iter_in, rho, mu_eq, mu_in, n_threads,
        as_dp(x), as_dp(y), as_dp(z),
        status.ctypes.data_as(ip), iters.ctypes.data_as(ip))
    return CpuBatchResults(x=x, y=y, z=z, status=status, iter=iters)
