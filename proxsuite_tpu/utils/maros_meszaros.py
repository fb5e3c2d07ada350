"""Maros-Meszaros corpus loading, preprocessing, and shape bucketing.

Counterpart of the reference test harness
(/root/reference/test/include/maros_meszaros.hpp:1-200 and
test/src/dense_maros_meszaros.cpp:60-168): problems come as
min 0.5 x'Px + q'x s.t. l <= Ax <= u; rows with l==u split into
equalities. The .mat files are read with scipy (the reference uses matio).

TPU addition: **shape bucketing with neutral padding**. XLA compiles one
executable per problem shape, so each problem is padded to the next bucket
(extra variables get an identity Hessian block and zero gradient -> their
optimum is 0; extra constraint rows are all-zero with wide bounds -> never
active). The padded QP's restriction to the original coordinates has
exactly the original solution set, and a handful of buckets covers the
whole corpus with a handful of compiles.
"""
from __future__ import annotations

import glob
import os
from typing import List, NamedTuple, Optional, Sequence

import numpy as np

from .random_qp import DenseQPData

MAROS_MESZAROS_DIR = "/root/reference/test/data/maros_meszaros_data"


class MarosMeszarosQP(NamedTuple):
    name: str
    P: np.ndarray
    q: np.ndarray
    A: np.ndarray
    l: np.ndarray
    u: np.ndarray


def available_problems(data_dir: str = MAROS_MESZAROS_DIR) -> List[str]:
    return sorted(
        os.path.splitext(os.path.basename(p))[0]
        for p in glob.glob(os.path.join(data_dir, "*.mat")))


def load_qp(name: str, data_dir: str = MAROS_MESZAROS_DIR) -> MarosMeszarosQP:
    import scipy.io as sio
    d = sio.loadmat(os.path.join(data_dir, name + ".mat"))
    return MarosMeszarosQP(
        name=name,
        P=np.asarray(d["P"].todense(), np.float64),
        q=np.asarray(d["q"], np.float64).ravel(),
        A=np.asarray(d["A"].todense(), np.float64),
        l=np.asarray(d["l"], np.float64).ravel(),
        u=np.asarray(d["u"], np.float64).ravel(),
    )


def preprocess(qp: MarosMeszarosQP) -> DenseQPData:
    """Split l==u rows into equalities (maros_meszaros.hpp:123-161)."""
    eq = qp.l == qp.u
    return DenseQPData(
        H=0.5 * (qp.P + qp.P.T), g=qp.q,
        A=qp.A[eq], b=qp.l[eq],
        C=qp.A[~eq], u=qp.u[~eq], l=qp.l[~eq])


_BUCKETS = (16, 64, 128, 192, 256, 384, 512, 768, 1024)


def _bucket(x: int, buckets: Sequence[int] = _BUCKETS) -> int:
    for b in buckets:
        if x <= b:
            return b
    return x


def pad_qp(qp: DenseQPData, n_pad: Optional[int] = None,
           n_eq_pad: Optional[int] = None,
           n_in_pad: Optional[int] = None,
           buckets: Sequence[int] = _BUCKETS) -> DenseQPData:
    """Pad to bucketed dims with a neutral extension (see module docstring).

    `buckets` trades padded-solve FLOPs against XLA compile count: the
    62-problem <=1000-dim corpus has 33 unique shapes under the default
    fine buckets but only 8 under (128, 512, 1024) -- on TPU, where each
    shape costs a multi-minute jit, coarse buckets are the right call.
    """
    n = qp.H.shape[0]
    n_eq = qp.A.shape[0]
    n_in = qp.C.shape[0]
    n_p = _bucket(n, buckets) if n_pad is None else n_pad
    ne_p = _bucket(n_eq, buckets) if n_eq_pad is None else n_eq_pad
    ni_p = _bucket(n_in, buckets) if n_in_pad is None else n_in_pad

    H = np.zeros((n_p, n_p))
    H[:n, :n] = qp.H
    H[n:, n:] = np.eye(n_p - n)  # padded vars: convex, optimum at 0
    g = np.zeros(n_p)
    g[:n] = qp.g
    A = np.zeros((ne_p, n_p))
    A[:n_eq, :n] = qp.A
    b = np.zeros(ne_p)           # 0 = 0 rows, regularized by mu_eq
    b[:n_eq] = qp.b
    C = np.zeros((ni_p, n_p))
    C[:n_in, :n] = qp.C
    u = np.ones(ni_p)            # 0 <= 1 rows, never active
    u[:n_in] = qp.u
    l = -np.ones(ni_p)
    l[:n_in] = qp.l
    return DenseQPData(H=H, g=g, A=A, b=b, C=C, u=u, l=l)


def load_preprocessed(name: str, pad: bool = True,
                      data_dir: str = MAROS_MESZAROS_DIR,
                      buckets: Sequence[int] = _BUCKETS):
    """Returns (original DenseQPData, padded DenseQPData, (n, n_eq, n_in))."""
    qp = preprocess(load_qp(name, data_dir))
    dims = (qp.H.shape[0], qp.A.shape[0], qp.C.shape[0])
    return qp, (pad_qp(qp, buckets=buckets) if pad else qp), dims


def load_sparse(name: str, data_dir: str = MAROS_MESZAROS_DIR):
    """Load a problem keeping scipy.sparse CSC operands (no densify).

    Counterpart of the reference sparse corpus harness
    (test/src/sparse_maros_meszaros.cpp:1-217): same l==u equality split
    as `preprocess`, matrices stay sparse for the sparse.QP API.
    Returns (H, g, A, b, C, u, l) with H/A/C scipy CSC.
    """
    import scipy.io as sio
    import scipy.sparse as spa

    d = sio.loadmat(os.path.join(data_dir, name + ".mat"))
    P = d["P"].tocsc()
    q = np.asarray(d["q"], np.float64).ravel()
    Am = d["A"].tocsc()
    lo = np.asarray(d["l"], np.float64).ravel()
    up = np.asarray(d["u"], np.float64).ravel()
    eq = lo == up
    H = ((P + P.T) * 0.5).tocsc()
    A = Am[eq].tocsc()
    C = Am[~eq].tocsc()
    return H, q, A, lo[eq], C, up[~eq], lo[~eq]


def pad_sparse_qp(H, g, A, b, C, u, l, nse_buckets=(256, 1024, 4096,
                                                    16384, 65536)):
    """Neutral sparse padding: dims to _BUCKETS, nse to nse_buckets.

    Same neutral extension as pad_qp (padded vars get identity H entries
    and zero gradient; padded A rows are empty with b=0; padded C rows
    empty with bounds +-1, never active), then each matrix's entry count
    is padded with explicit zeros at (0, 0) so a handful of (dims, nse)
    buckets covers the corpus with a handful of compiles.
    Returns (H_bcoo_pair_free) as scipy COO triples converted by the
    caller; here: (H', g', A', b', C', u', l') with scipy COO matrices.
    """
    import scipy.sparse as spa

    n = H.shape[0]
    n_eq = A.shape[0]
    n_in = C.shape[0]
    n_p, ne_p, ni_p = _bucket(n), _bucket(n_eq), _bucket(n_in)

    def pad_entries(M, rows, cols, extra_r=(), extra_c=(), extra_v=()):
        coo = M.tocoo()
        r = np.concatenate([coo.row, extra_r]).astype(np.int64)
        c = np.concatenate([coo.col, extra_c]).astype(np.int64)
        v = np.concatenate([coo.data, extra_v]).astype(np.float64)
        nse = len(v)
        for bkt in nse_buckets:
            if nse <= bkt:
                pad = bkt - nse
                break
        else:
            pad = 0
        r = np.concatenate([r, np.zeros(pad, np.int64)])
        c = np.concatenate([c, np.zeros(pad, np.int64)])
        v = np.concatenate([v, np.zeros(pad)])
        return spa.coo_matrix((v, (r, c)), shape=(rows, cols))

    pad_idx = np.arange(n, n_p)
    H_p = pad_entries(H, n_p, n_p, pad_idx, pad_idx, np.ones(n_p - n))
    A_p = pad_entries(A, ne_p, n_p)
    C_p = pad_entries(C, ni_p, n_p)
    g_p = np.zeros(n_p); g_p[:n] = g
    b_p = np.zeros(ne_p); b_p[:n_eq] = b
    u_p = np.ones(ni_p); u_p[:n_in] = u
    l_p = -np.ones(ni_p); l_p[:n_in] = l
    return H_p, g_p, A_p, b_p, C_p, u_p, l_p


def problems_within(n_max: int, m_max: int,
                    data_dir: str = MAROS_MESZAROS_DIR) -> List[str]:
    """Names of problems with n <= n_max and n_eq+n_in <= m_max (the
    reference's subset rule, dense_maros_meszaros.cpp:76)."""
    import scipy.io as sio
    out = []
    for name in available_problems(data_dir):
        d = sio.loadmat(os.path.join(data_dir, name + ".mat"))
        n = int(d["n"][0, 0])
        m = int(d["m"][0, 0])
        if n <= n_max and m <= m_max:
            out.append(name)
    return out
