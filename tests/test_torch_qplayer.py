"""Torch bridge QPLayer: feasible and infeasible (closest-feasible) paths.

Mirrors the reference torch layer semantics
(bindings/python/proxsuite/torch/qplayer.py: QPFunctionFn returns
(x, y, z); QPFunctionFn_infeas returns (x, y, z, s_e, s_i)) with
finite-difference gradient checks in the style of test/src/dense_backward.cpp.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from proxsuite_tpu.torch.qplayer import QPFunction  # noqa: E402
from proxsuite_tpu.utils.random_qp import dense_strongly_convex_qp  # noqa: E402


def _torch_batch(d, B=3, jitter=0.01):
    def t(a):
        return torch.stack([
            torch.from_numpy(np.asarray(a) * (1.0 + jitter * i))
            for i in range(B)])
    return (t(d.H), t(d.g), t(d.A), t(d.b), t(d.C), t(d.l), t(d.u))


def test_feasible_forward_backward():
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
