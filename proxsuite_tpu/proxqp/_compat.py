"""Shared machinery for the reference-compatible QP objects.

The reference bindings expose mutable `qp.settings.<knob> = value`
attribute assignment (bindings/python/src/expose-settings.hpp:17-107) and
a `qp.results` / `qp.model` object graph (expose-results.hpp,
expose-model.hpp). The TPU core uses a frozen, hashable Settings (it keys
jit caches), so the shim keeps a mutable bag of knobs and freezes it at
solve time.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..types import Results, Settings

_SETTINGS_FIELDS = {f.name for f in dataclasses.fields(Settings)}
# Inverse-representation mirrors the reference carries alongside the
# canonical knobs (settings.hpp:150-171; used in lockstep at
# solver.hpp:600-612): assignment maps onto the canonical field.
_INVERSE_ALIASES = {
    "mu_max_eq_inv": "mu_min_eq",
    "mu_max_in_inv": "mu_min_in",
    "mu_update_inv_factor": "mu_update_factor",
}
# Accepted-and-ignored knobs: dead in the reference too (only
# settings.hpp/serialization/bindings mention them; no solver reads).
_DEAD_REFERENCE_KNOBS = {
    "refactor_dual_feasibility_threshold",
    "refactor_rho_threshold",
    # eps_refact: the reference reads it for its refinement
    # refactorization fallback (solver.hpp:474-532); this core's Schur
    # factor does not depend on mu so there is nothing to refactor
    # (types.py Settings NOTE)
    "eps_refact",
}


class MutableSettings:
    """Attribute-assignable view over the frozen core Settings."""

    def __init__(self, base: Optional[Settings] = None):
        object.__setattr__(self, "_values",
                           dataclasses.asdict(base or Settings()))
        object.__setattr__(self, "_dead", {})

    def __getattr__(self, name):
        if name in _INVERSE_ALIASES:
            return 1.0 / object.__getattribute__(
                self, "_values")[_INVERSE_ALIASES[name]]
        if name in _DEAD_REFERENCE_KNOBS:
            return object.__getattribute__(self, "_dead").get(name)
        try:
            return object.__getattribute__(self, "_values")[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name, value):
        if name in _INVERSE_ALIASES:
            self._values[_INVERSE_ALIASES[name]] = 1.0 / value
            return
        if name in _DEAD_REFERENCE_KNOBS:
            self._dead[name] = value
            return
        if name not in _SETTINGS_FIELDS:
            raise AttributeError(
                f"unknown setting '{name}' (reference settings.hpp:87-316)")
        self._values[name] = value

    def freeze(self) -> Settings:
        return Settings(**self._values)

    def update_from(self, **kw):
        for k, v in kw.items():
            if v is not None:
                setattr(self, k, v)


class ResultsView:
    """`qp.results` object with .x/.y/.z/.se/.si/.info as numpy arrays
    (reference results.hpp:66-204)."""

    def __init__(self, results: Results):
        self._r = results

    @property
    def x(self):
        return np.asarray(self._r.x)

    @property
    def y(self):
        return np.asarray(self._r.y)

    @property
    def z(self):
        return np.asarray(self._r.z)

    @property
    def se(self):
        return np.asarray(self._r.se)

    @property
    def si(self):
        return np.asarray(self._r.si)

    @property
    def info(self):
        return InfoView(self._r)

    @property
    def raw(self) -> Results:
        """The underlying device-array pytree."""
        return self._r


class InfoView:
    """`qp.results.info` scalars (reference results.hpp:27-58)."""

    _INT = {"iter", "iter_ext", "mu_updates", "rho_updates", "status"}

    def __init__(self, results: Results):
        self._info = results.info

    def __getattr__(self, name):
        try:
            v = getattr(self._info, name)
        except AttributeError:
            raise AttributeError(name) from None
        if name == "status":
            from ..types import QPSolverOutput
            return QPSolverOutput(int(v))
        if name in self._INT:
            return int(v)
        return float(v)

    @property
    def objValue(self):
        return float(self._info.objValue)


class ModelView:
    """`qp.model` problem storage incl. backward_data
    (reference dense/model.hpp:22-149, backward_data.hpp:26-128)."""

    def __init__(self, owner):
        self._owner = owner

    def __getattr__(self, name):
        m = self._owner._core._model
        if m is not None and name in m:
            return np.asarray(m[name])
        if name == "backward_data":
            return BackwardDataView(self._owner)
        raise AttributeError(name)

    @property
    def dim(self):
        return self._owner._core.spec.n

    @property
    def n_eq(self):
        return self._owner._core.spec.n_eq

    @property
    def n_in(self):
        return self._owner._core.spec.n_in


class BackwardDataView:
    """dL_d* gradients after compute_backward (backward_data.hpp:26-128)."""

    def __init__(self, owner):
        self._owner = owner

    def __getattr__(self, name):
        bd = self._owner._core.backward_data
        if bd is None:
            raise RuntimeError(
                "call compute_backward before reading backward_data")
        if not name.startswith("dL_d"):
            raise AttributeError(name)
        field = name
        n_in = self._owner._core.spec.n_in
        if name in ("dL_du", "dL_dl", "dL_dC"):
            return np.asarray(getattr(bd, field))[:n_in]
        if name == "dL_du_box":
            return np.asarray(bd.dL_du)[n_in:]
        if name == "dL_dl_box":
            return np.asarray(bd.dL_dl)[n_in:]
        return np.asarray(getattr(bd, field))
