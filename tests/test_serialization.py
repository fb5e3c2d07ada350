"""Whole-QP serialization round-trips (reference serialization/*.hpp,
test/src/serialization.cpp:1-157)."""



def test_whole_qp_roundtrip_warm_resolve():
    """Reference serialization contract (serialization/wrapper.hpp:24,
    test/src/serialization.cpp): the WHOLE stateful QP round-trips --
    model, settings, equilibration, proximal parameters, results -- and a
    reloaded QP warm-resolves in 0 iterations."""
    import numpy as np

    import proxsuite_tpu as pt
    from proxsuite_tpu import serialization as ser
    from proxsuite_tpu.types import InitialGuess
    from proxsuite_tpu.utils.random_qp import (dense_strongly_convex_qp,
                                               kkt_residuals)

    d = dense_strongly_convex_qp(20, 6, 8, seed=11)
    qp = pt.QP(20, 6, 8, settings=pt.Settings(eps_abs=1e-9))
    qp.init(H=d.H, g=d.g, A=d.A, b=d.b, C=d.C, l=d.l, u=d.u)
    res = qp.solve()
    assert int(res.info.status) == 0

    blob = ser.save_qp_to_bytes(qp)
    qp2 = ser.load_qp_from_bytes(blob)

    # state equality
    assert qp2.settings == qp.settings
    np.testing.assert_array_equal(np.asarray(qp2.results.x),
                                  np.asarray(res.x))
    np.testing.assert_array_equal(np.asarray(qp2._scaled.delta_x),
                                  np.asarray(qp._scaled.delta_x))

    # warm resolve from the restored state takes 0 iterations
    qp2.settings = qp2.settings.replace(
        initial_guess=InitialGuess.WARM_START_WITH_PREVIOUS_RESULT)
    res2 = qp2.solve()
    assert int(res2.info.iter) == 0
    pri, dua = kkt_residuals(d, np.asarray(res2.x), np.asarray(res2.y),
                             np.asarray(res2.z))
    assert max(pri, dua) < 2e-9
