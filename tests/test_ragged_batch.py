"""Heterogeneous (ragged) batch solving + per-QP state in the parallel
APIs. Reference: solve_in_parallel over a vector of independently-sized,
independently-configured QPs (parallel/qp_solve.hpp:17-82)."""
import numpy as np
import pytest

import proxsuite_tpu as pt
from proxsuite_tpu.parallel.batch import solve_in_parallel_ragged
from proxsuite_tpu.utils.random_qp import (dense_box_constrained_qp,
                                           dense_strongly_convex_qp,
                                           kkt_residuals)

EPS = 1e-9


def test_ragged_matches_per_qp_solves():
    """Mixed-dims batch == per-QP solves (bucketed neutral padding)."""
    dims = [(10, 3, 5), (14, 4, 6), (30, 10, 15), (50, 20, 20), (12, 0, 8)]
    st = pt.Settings(eps_abs=EPS, eps_rel=0.0)
    probs, qs = [], []
    for i, (n, ne, ni) in enumerate(dims):
        q = dense_strongly_convex_qp(n, ne, ni, seed=i)
        qs.append(q)
        probs.append(dict(H=q.H, g=q.g, A=q.A if ne else None,
                          b=q.b if ne else None, C=q.C, u=q.u, l=q.l))
    rs = solve_in_parallel_ragged(probs, settings=st)
    for i, (q, r) in enumerate(zip(qs, rs)):
        assert int(r.info.status) == 0
        pri, dua = kkt_residuals(q, np.asarray(r.x), np.asarray(r.y),
                                 np.asarray(r.z))
        assert max(pri, dua) < 2 * EPS
        r1 = pt.solve(H=q.H, g=q.g, A=q.A if dims[i][1] else None,
                      b=q.b if dims[i][1] else None, C=q.C, u=q.u, l=q.l,
                      eps_abs=EPS, eps_rel=0.0)
        assert np.abs(np.asarray(r.x) - np.asarray(r1.x)).max() < 1e-12


def test_ragged_with_box():
    """Ragged batch with mixed box/non-box lanes keeps the [ineq; box]
    multiplier layout of each original problem."""
    st = pt.Settings(eps_abs=EPS, eps_rel=0.0)
    qb = dense_box_constrained_qp(20, 5, 8, seed=1)
    qn = dense_strongly_convex_qp(12, 4, 6, seed=2)
    rs = solve_in_parallel_ragged(
        [dict(H=qb.H, g=qb.g, A=qb.A, b=qb.b, C=qb.C, u=qb.u, l=qb.l,
              u_box=qb.u_box, l_box=qb.l_box),
         dict(H=qn.H, g=qn.g, A=qn.A, b=qn.b, C=qn.C, u=qn.u, l=qn.l)],
        settings=st)
    rb, rn = rs
    assert int(rb.info.status) == 0 and int(rn.info.status) == 0
    x = np.asarray(rb.x)
    z = np.asarray(rb.z)
    assert z.shape == (8 + 20,)
    Ce = np.vstack([qb.C, np.eye(20)])
    ue = np.concatenate([qb.u, qb.u_box])
    le = np.concatenate([qb.l, qb.l_box])
    pri = max(np.abs(qb.A @ x - qb.b).max(),
              np.maximum(Ce @ x - ue, 0).max(),
              np.maximum(le - Ce @ x, 0).max())
    dua = np.abs(qb.H @ x + qb.g + qb.A.T @ np.asarray(rb.y)
                 + Ce.T @ z).max()
    assert max(pri, dua) < 2 * EPS
    pri, dua = kkt_residuals(qn, np.asarray(rn.x), np.asarray(rn.y),
                             np.asarray(rn.z))
    assert max(pri, dua) < 2 * EPS


def test_compat_parallel_per_qp_state():
    """proxqp.dense.solve_in_parallel threads per-QP rho/mu overrides and
    warm starts; mixed dims solve via bucketing."""
    from proxsuite_tpu import proxqp

    qs_data = [dense_strongly_convex_qp(16, 5, 7, seed=3),
               dense_strongly_convex_qp(24, 8, 9, seed=4)]
    batch = proxqp.dense.BatchQP()
    qp0 = batch.init_qp_in_place(16, 5, 7)
    d = qs_data[0]
    qp0.init(d.H, d.g, d.A, d.b, d.C, d.l, d.u, rho=1e-5)
    qp1 = batch.init_qp_in_place(24, 8, 9)
    d = qs_data[1]
    qp1.init(d.H, d.g, d.A, d.b, d.C, d.l, d.u, mu_eq=1e-4)
    proxqp.dense.solve_in_parallel(batch)
    for qp, d in zip([qp0, qp1], qs_data):
        pri, dua = kkt_residuals(d, np.asarray(qp.results.x),
                                 np.asarray(qp.results.y),
                                 np.asarray(qp.results.z))
        assert max(pri, dua) < 2 * qp.settings.eps_abs
    # per-QP rho/mu overrides actually reached the solver: rho is
    # invariant across the solve; mu_eq only changes when the BCL loop
    # performs a mu update, so with zero updates the reported value must
    # be exactly the per-QP override (1e-4), not the 1e-3 default.
    assert float(qp0.results.info.rho) == pytest.approx(1e-5)
    if int(qp1.results.info.mu_updates) == 0:
        assert float(qp1.results.info.mu_eq) == pytest.approx(1e-4)
    else:
        assert float(qp1.results.info.mu_eq) < 1e-3

    # warm re-solve: previous results give 0 iterations, per lane
    from proxsuite_tpu.types import InitialGuess
    for qp in (qp0, qp1):
        qp.settings.initial_guess = \
            InitialGuess.WARM_START_WITH_PREVIOUS_RESULT
    proxqp.dense.solve_in_parallel(batch)
    assert int(qp0.results.info.iter) == 0
    assert int(qp1.results.info.iter) == 0


def test_compat_parallel_rejects_mixed_settings():
    from proxsuite_tpu import proxqp

    d = dense_strongly_convex_qp(10, 3, 4, seed=5)
    q1 = proxqp.dense.QP(10, 3, 4)
    q1.init(d.H, d.g, d.A, d.b, d.C, d.l, d.u)
    q2 = proxqp.dense.QP(10, 3, 4)
    q2.init(d.H, d.g, d.A, d.b, d.C, d.l, d.u)
    q2.settings.eps_abs = 1e-3
    with pytest.raises(ValueError, match="identical settings"):
        proxqp.dense.solve_in_parallel([q1, q2])
