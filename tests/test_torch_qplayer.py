"""Torch bridge QPLayer: feasible and infeasible (closest-feasible) paths.

Mirrors the reference torch layer semantics
(bindings/python/proxsuite/torch/qplayer.py: QPFunctionFn returns
(x, y, z); QPFunctionFn_infeas returns (x, y, z, s_e, s_i)) with
finite-difference gradient checks in the style of test/src/dense_backward.cpp.
"""
import importlib.util

import numpy as np
import pytest

# torch must NOT load at collection time: pytest imports every test
# module up front, and torch's OpenMP runtime resident next to XLA's
# compiler threads for the whole session is a suspected contributor to
# the rare in-process compile-time SIGSEGVs. find_spec checks
# availability without importing; each test imports torch lazily.
pytestmark = pytest.mark.skipif(
    importlib.util.find_spec("torch") is None, reason="torch not installed")

from proxsuite_tpu.torch.qplayer import QPFunction  # noqa: E402
from proxsuite_tpu.utils.random_qp import dense_strongly_convex_qp  # noqa: E402


def _torch_batch(d, B=3, jitter=0.01):
    import torch

    def t(a):
        return torch.stack([
            torch.from_numpy(np.asarray(a) * (1.0 + jitter * i))
            for i in range(B)])
    return (t(d.H), t(d.g), t(d.A), t(d.b), t(d.C), t(d.l), t(d.u))


def test_feasible_forward_backward():
    import torch

    d = dense_strongly_convex_qp(8, 2, 4, seed=21)
    layer = QPFunction(eps=1e-9, maxIter=200)
    Q, p, A, b, G, l, u = _torch_batch(d)
    p = p.clone().requires_grad_(True)
    x, y, z = layer(Q, p, A, b, G, l, u)
    assert x.shape == (3, 8)
    loss = (x ** 2).sum()
    loss.backward()
    assert p.grad is not None and torch.isfinite(p.grad).all()

    # finite-difference check on item 0, coordinate 0
    eps = 1e-6
    def f(p0):
        pp = p.detach().clone()
        pp[0, 0] = p0
        x2, _, _ = layer(Q, pp, A, b, G, l, u)
        return float((x2 ** 2).sum())
    p00 = float(p[0, 0])
    fd = (f(p00 + eps) - f(p00 - eps)) / (2 * eps)
    assert abs(fd - float(p.grad[0, 0])) < 1e-3 * max(1.0, abs(fd))


def test_infeasible_variant_outputs_shifts():
    import torch

    d = dense_strongly_convex_qp(6, 2, 3, seed=5)
    # make the problem primal infeasible: contradictory equality rows
    A = np.vstack([d.A[:1], d.A[:1]])
    b = np.array([1.0, -1.0])
    layer = QPFunction(eps=1e-7, maxIter=500, structural_feasibility=False)
    t = lambda a: torch.from_numpy(np.asarray(a)).unsqueeze(0)
    Q, p = t(d.H), t(d.g).clone().requires_grad_(True)
    x, y, z, se, si = layer(Q, p, t(A), t(b), t(d.C), t(d.l), t(d.u))
    assert se.shape == (1, 2)
    assert si.shape == (1, 3)
    # infeasible rows need a nonzero equality shift
    assert float(se.abs().max()) > 1e-3
    loss = (x ** 2).sum() + (se ** 2).sum()
    loss.backward()
    assert torch.isfinite(p.grad).all()


def test_infeas_backward_unbatched_inputs():
    """Unbatched (2-D/1-D) inputs through the infeasible path must not
    crash in backward (ADVICE r1: ctx.data held unbatched arrays)."""
    import torch

    d = dense_strongly_convex_qp(6, 2, 3, seed=5)
    A = np.vstack([d.A[:1], d.A[:1]])
    b = np.array([1.0, -1.0])
    layer = QPFunction(eps=1e-7, maxIter=500, structural_feasibility=False)
    t = lambda a: torch.from_numpy(np.asarray(a))
    p = t(d.g).clone().requires_grad_(True)
    x, y, z, se, si = layer(t(d.H), p, t(A), t(b), t(d.C), t(d.l), t(d.u))
    assert x.dim() == 1 and se.dim() == 1
    loss = (x ** 2).sum() + (se ** 2).sum()
    loss.backward()
    assert torch.isfinite(p.grad).all()


def test_infeas_variant_feasible_problem_fd():
    """On a FEASIBLE problem the infeasible variant's extended adjoint must
    reduce to the classical Jacobian: FD check of dL/dA, dL/dG, dL/dp."""
    import torch

    d = dense_strongly_convex_qp(6, 2, 3, seed=9)
    layer = QPFunction(eps=1e-10, maxIter=500, structural_feasibility=False)
    t = lambda a: torch.from_numpy(np.asarray(a)).unsqueeze(0)

    def run(Av, Gv, pv):
        x, y, z, se, si = layer(t(d.H), pv, Av, t(d.b), Gv, t(d.l), t(d.u))
        assert float(se.abs().max()) < 1e-6  # really feasible
        return (x ** 2).sum()

    At = t(d.A).clone().requires_grad_(True)
    Gt = t(d.C).clone().requires_grad_(True)
    pt_ = t(d.g).clone().requires_grad_(True)
    loss = run(At, Gt, pt_)
    loss.backward()
    eps = 1e-6
    checks = [("A", At, (0, 0, 1)), ("G", Gt, (0, 0, 1)), ("p", pt_, (0, 1))]
    for name, tens, ij in checks:
        v0 = float(tens[ij])
        pert = tens.detach().clone()
        pert[ij] = v0 + eps
        args = {"A": (pert, Gt.detach(), pt_.detach()),
                "G": (At.detach(), pert, pt_.detach()),
                "p": (At.detach(), Gt.detach(), pert)}[name]
        fp = float(run(*args))
        pert = tens.detach().clone()
        pert[ij] = v0 - eps
        args = {"A": (pert, Gt.detach(), pt_.detach()),
                "G": (At.detach(), pert, pt_.detach()),
                "p": (At.detach(), Gt.detach(), pert)}[name]
        fm = float(run(*args))
        fd = (fp - fm) / (2 * eps)
        an = float(tens.grad[ij])
        assert abs(fd - an) < 1e-3 * max(1.0, abs(fd)), \
            f"dL/d{name}{ij}: fd={fd:.6e} analytic={an:.6e}"


def test_infeas_backward_is_descent_direction():
    """On a primal-infeasible problem the extended conservative Jacobian
    (reference qplayer.py:371-610 semantics) need not equal the classical
    derivative at the degenerate closest-feasible active set, but it must
    be a DESCENT direction for shift-dependent losses -- the property the
    learn-with-infeasibility-penalty use case needs (ADVICE r1 high: with
    the missing A/G terms, descent failed for constraint learning)."""
    import torch

    H = np.eye(2)
    g = np.array([0.0, 0.3])
    A = np.array([[1.0, 0.2]])
    b = np.array([1.0])
    C = np.array([[1.0, 0.0], [0.0, 1.0]])
    u = np.array([-1.0, 5.0])
    l = np.array([-9.0, -5.0])
    layer = QPFunction(eps=1e-10, maxIter=1000, structural_feasibility=False)
    t = lambda a: torch.from_numpy(np.asarray(a)).unsqueeze(0)

    def run(Av, Gv):
        x, y, z, se, si = layer(t(H), t(g), Av, t(b), Gv, t(l), t(u))
        return (se ** 2).sum() + (si ** 2).sum()

    At = t(A).clone().requires_grad_(True)
    Gt = t(C).clone().requires_grad_(True)
    loss0 = run(At, Gt)
    assert float(loss0) > 1e-2  # infeasible: shifts are real
    loss0.backward()
    gA, gG = At.grad, Gt.grad
    assert torch.isfinite(gA).all() and torch.isfinite(gG).all()
    # multipliers diverge at infeasible problems; the projected-multiplier
    # adjoint must stay O(1), not O(kappa)
    assert float(gA.abs().max()) < 1e3 and float(gG.abs().max()) < 1e3
    step = 1e-4
    loss1 = float(run(At.detach() - step * gA, Gt.detach() - step * gG))
    assert loss1 < float(loss0), f"not a descent direction: {loss1} vs {loss0}"
