"""Shape bucketing with neutral padding for heterogeneous QP batches.

XLA compiles one executable per problem shape, so solving a batch of QPs
with arbitrary per-QP dims (the reference's `solve_in_parallel` takes a
vector of independently-sized QPs, parallel/qp_solve.hpp:17-60) is done by
padding every QP to the next shape bucket and vmapping each bucket:

- extra variables get an identity Hessian block and zero gradient (their
  optimum is 0, decoupled from the real variables);
- extra equality rows are all-zero with b=0 (satisfied identically,
  regularized by mu_eq);
- extra inequality rows are all-zero with bounds [-1, 1] (never active);
- extra box bounds are [-1, 1] around the padded variables' optimum 0
  (never active).

The padded QP's restriction to the original coordinates has exactly the
original solution set, so slicing the padded solution back to the
original dims recovers the original solution (same trick the in-tree
Maros-Meszaros harness uses, utils/maros_meszaros.py).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

BUCKETS = (16, 32, 64, 128, 192, 256, 384, 512, 768, 1024)


def bucket(x: int, buckets: Sequence[int] = BUCKETS) -> int:
    """Smallest bucket >= x (past the largest bucket: round up to 128)."""
    for b in buckets:
        if x <= b:
            return b
    return -(-x // 128) * 128


def pad_dense_qp(H, g, A, b, C, u, l, u_box=None, l_box=None,
                 n_pad: Optional[int] = None,
                 n_eq_pad: Optional[int] = None,
                 n_in_pad: Optional[int] = None):
    """Neutrally pad one dense QP to (n_pad, n_eq_pad, n_in_pad).

    Returns a dict of padded f64 arrays (u_box/l_box only when given).
    """
    g = np.asarray(g, np.float64)
    n = g.shape[0]
    n_eq = 0 if A is None else np.shape(A)[0]
    n_in = 0 if C is None else np.shape(C)[0]
    n_p = bucket(n) if n_pad is None else n_pad
    ne_p = bucket(n_eq) if n_eq_pad is None else n_eq_pad
    ni_p = bucket(n_in) if n_in_pad is None else n_in_pad

    Hp = np.zeros((n_p, n_p))
    if H is not None:
        Hp[:n, :n] = np.asarray(H, np.float64)
    Hp[n:, n:] = np.eye(n_p - n)
    gp = np.zeros(n_p)
    gp[:n] = g
    Ap = np.zeros((ne_p, n_p))
    bp = np.zeros(ne_p)
    if n_eq:
        Ap[:n_eq, :n] = np.asarray(A, np.float64)
        bp[:n_eq] = np.asarray(b, np.float64)
    Cp = np.zeros((ni_p, n_p))
    up = np.ones(ni_p)
    lp = -np.ones(ni_p)
    if n_in:
        Cp[:n_in, :n] = np.asarray(C, np.float64)
        up[:n_in] = np.asarray(u, np.float64)
        lp[:n_in] = np.asarray(l, np.float64)
    out = dict(H=Hp, g=gp, A=Ap, b=bp, C=Cp, u=up, l=lp)
    if u_box is not None or l_box is not None:
        ubp = np.ones(n_p)
        lbp = -np.ones(n_p)
        ubp[:n] = np.inf if u_box is None else np.asarray(u_box, np.float64)
        lbp[:n] = -np.inf if l_box is None else np.asarray(l_box, np.float64)
        out["u_box"] = ubp
        out["l_box"] = lbp
    return out
