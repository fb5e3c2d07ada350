"""Saving/loading solver objects (reference serialization examples,
include/proxsuite/serialization/archive.hpp loadFromString/saveToString)."""
import _common  # noqa: F401
import numpy as np

import proxsuite_tpu as proxsuite
from proxsuite_tpu import serialization as ser
from proxsuite_tpu.types import Settings
from proxsuite_tpu.utils.random_qp import dense_strongly_convex_qp

d = dense_strongly_convex_qp(10, 2, 4, seed=6)
res = proxsuite.solve(H=d.H, g=d.g, A=d.A, b=d.b, C=d.C, l=d.l, u=d.u,
                      eps_abs=1e-9)

# settings round-trip through JSON
s = Settings(eps_abs=1e-9, max_iter=123)
s2 = ser.load_settings_from_string(ser.save_settings_to_string(s))
assert s2 == s

# results round-trip through JSON
r2 = ser.load_results_from_string(ser.save_results_to_string(res))
assert np.allclose(r2.x, np.asarray(res.x))

# model round-trip through binary npz
blob = ser.save_model_to_bytes(H=d.H, g=d.g, A=d.A, b=d.b, C=d.C,
                               u=d.u, l=d.l)
model = ser.load_model_from_bytes(blob)
assert np.allclose(model["H"], d.H)
print("serialization round-trips OK; saved model keys:", sorted(model))
