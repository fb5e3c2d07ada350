"""Serialization of solver objects (JSON / binary round-trips).

Counterpart of the reference cereal-based archives
(/root/reference/include/proxsuite/serialization/archive.hpp:19-231 and
{model,results,settings,workspace,wrapper}.hpp): save/load Settings,
problem data, and Results to JSON strings or compressed .npz binaries.
There is no C++ object graph here -- state is plain arrays + a frozen
Settings dataclass -- so the archive format is a flat dict.
"""
from __future__ import annotations

import dataclasses
import io
import json
from typing import Any

import numpy as np

from .types import (
    HessianType,
    InitialGuess,
    Info,
    MeritFunctionType,
    Results,
    Settings,
    SparseBackend,
)

_ENUM_FIELDS = {
    "initial_guess": InitialGuess,
    "merit_function_type": MeritFunctionType,
    "sparse_backend": SparseBackend,
}


# ---------------- Settings <-> JSON ----------------

def settings_to_dict(settings: Settings) -> dict:
    d = dataclasses.asdict(settings)
    for k in _ENUM_FIELDS:
        d[k] = int(d[k])
    return d


def settings_from_dict(d: dict) -> Settings:
    # Forward compatibility: drop keys that are not Settings fields, so
    # archives written by older versions (e.g. ones that still carried the
    # retired reference knob `eps_refact`, see types.py Settings notes)
    # load cleanly instead of raising TypeError in Settings(**d).
    known = {f.name for f in dataclasses.fields(Settings)}
    d = {k: v for k, v in d.items() if k in known}
    for k, enum_t in _ENUM_FIELDS.items():
        if k in d:
            d[k] = enum_t(d[k])
    return Settings(**d)


def save_settings_to_string(settings: Settings) -> str:
    return json.dumps(settings_to_dict(settings), indent=1)


def load_settings_from_string(s: str) -> Settings:
    return settings_from_dict(json.loads(s))


# ---------------- Results <-> JSON / npz ----------------

def results_to_dict(results: Results) -> dict:
    info = {k: np.asarray(v).tolist() for k, v in results.info._asdict().items()}
    return {
        "x": np.asarray(results.x).tolist(),
        "y": np.asarray(results.y).tolist(),
        "z": np.asarray(results.z).tolist(),
        "se": np.asarray(results.se).tolist(),
        "si": np.asarray(results.si).tolist(),
        "info": info,
    }


def results_from_dict(d: dict, dtype=np.float64) -> Results:
    info_d = d["info"]
    int_fields = {"iter", "iter_ext", "mu_updates", "rho_updates", "status", "minres_iters"}
    info = Info(**{
        k: np.asarray(v, np.int32 if k in int_fields else dtype)
        for k, v in info_d.items() if k in Info._fields})
    return Results(
        x=np.asarray(d["x"], dtype), y=np.asarray(d["y"], dtype),
        z=np.asarray(d["z"], dtype), se=np.asarray(d["se"], dtype),
        si=np.asarray(d["si"], dtype), info=info)


def save_results_to_string(results: Results) -> str:
    return json.dumps(results_to_dict(results))


def load_results_from_string(s: str, dtype=np.float64) -> Results:
    return results_from_dict(json.loads(s), dtype)


# ---------------- QP model <-> npz binary ----------------

def save_model_to_binary(path_or_buf, **arrays: Any) -> None:
    """Save problem arrays (H, g, A, b, C, u, l, ...) to a compressed npz."""
    np.savez_compressed(
        path_or_buf, **{k: np.asarray(v) for k, v in arrays.items()
                        if v is not None})


def load_model_from_binary(path_or_buf) -> dict:
    with np.load(path_or_buf, allow_pickle=False) as f:
        return {k: f[k] for k in f.files}


def save_model_to_bytes(**arrays: Any) -> bytes:
    buf = io.BytesIO()
    save_model_to_binary(buf, **arrays)
    return buf.getvalue()


def load_model_from_bytes(data: bytes) -> dict:
    return load_model_from_binary(io.BytesIO(data))


# ---------------- whole stateful QP <-> npz ----------------

def save_qp(qp, path_or_buf) -> None:
    """Round-trip the WHOLE stateful QP: model + settings + proximal
    parameters + equilibration state + results (+ df low words).

    Counterpart of the reference's cereal archive of the full wrapper
    (serialization/wrapper.hpp:24, workspace.hpp:89, ruiz.hpp:32;
    test/src/serialization.cpp:1-157): a reloaded QP resumes exactly --
    a WARM_START_WITH_PREVIOUS_RESULT resolve takes 0 iterations.
    """
    arrays = {}
    meta = {
        "spec": {
            "n": qp.spec.n, "n_eq": qp.spec.n_eq, "n_in": qp.spec.n_in,
            "box_constraints": qp.spec.box_constraints,
            "hessian_type": int(qp.spec.hessian_type),
        },
        "settings": settings_to_dict(qp.settings),
        "rho": float(np.asarray(qp._rho)),
        "mu_eq": float(np.asarray(qp._mu_eq)),
        "mu_in": float(np.asarray(qp._mu_in)),
        "has_results": qp.results is not None,
    }
    model64 = getattr(qp, "_model64", None)
    for k, v in qp._model.items():
        if v is not None:
            # prefer the f64 host copies kept by high-accuracy mode
            arrays[f"model_{k}"] = (np.asarray(model64[k])
                                    if model64 and k in model64
                                    else np.asarray(v))
    if qp._scaled is not None:
        for k in ("delta_x", "delta_y", "delta_z", "c"):
            arrays[f"ruiz_{k}"] = np.asarray(getattr(qp._scaled, k))
    if qp.results is not None:
        r = qp.results
        for k in ("x", "y", "z", "se", "si", "x_lo", "y_lo", "z_lo"):
            v = getattr(r, k)
            if v is not None:
                arrays[f"res_{k}"] = np.asarray(v)
        arrays["res_info"] = np.frombuffer(
            json.dumps({k: np.asarray(v).tolist()
                        for k, v in r.info._asdict().items()}).encode(),
            dtype=np.uint8)
    arrays["meta"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    np.savez_compressed(path_or_buf, **arrays)


def load_qp(path_or_buf):
    """Reconstruct a stateful QP saved by save_qp (see its docstring)."""
    import jax.numpy as jnp

    from .wrapper import QP

    with np.load(path_or_buf, allow_pickle=False) as f:
        data = {k: f[k] for k in f.files}
    meta = json.loads(bytes(data["meta"]).decode())
    sp = meta["spec"]
    settings = settings_from_dict(meta["settings"])
    qp = QP(sp["n"], sp["n_eq"], sp["n_in"],
            box_constraints=sp["box_constraints"],
            hessian_type=HessianType(sp["hessian_type"]),
            settings=settings)
    model_kw = {k[len("model_"):]: data[k] for k in data
                if k.startswith("model_")}
    # re-ingest WITHOUT re-running Ruiz, then overwrite the scaling state
    # with the stored equilibration (reference: the serialized
    # RuizEquilibration is restored verbatim)
    qp.init(compute_preconditioner="ruiz_c" not in data, **model_kw,
            rho=meta["rho"], mu_eq=meta["mu_eq"], mu_in=meta["mu_in"])
    if "ruiz_c" in data:
        m = qp._model
        from .api import build_scaled_qp
        qp._scaled = build_scaled_qp(
            qp.spec, qp.settings, m["H"], m["g"], m["A"], m["b"], m["C"],
            m["u"], m["l"], m["u_box"], m["l_box"],
            execute_preconditioner=False,
            delta_x=jnp.asarray(data["ruiz_delta_x"]),
            delta_y=jnp.asarray(data["ruiz_delta_y"]),
            delta_z=jnp.asarray(data["ruiz_delta_z"]),
            c=jnp.asarray(data["ruiz_c"]))
    if meta["has_results"]:
        info_d = json.loads(bytes(data["res_info"]).decode())
        int_fields = {"iter", "iter_ext", "mu_updates", "rho_updates",
                      "status", "minres_iters"}
        time_fields = {"setup_time", "solve_time", "run_time",
                       "compile_time"}
        info = Info(**{
            k: (float(v) if k in time_fields else
                np.asarray(v, np.int32 if k in int_fields else
                           qp.dtype))
            for k, v in info_d.items() if k in Info._fields})
        get = lambda k: (jnp.asarray(data[f"res_{k}"])
                         if f"res_{k}" in data else None)
        qp.results = Results(
            x=get("x"), y=get("y"), z=get("z"), se=get("se"), si=get("si"),
            info=info, x_lo=get("x_lo"), y_lo=get("y_lo"), z_lo=get("z_lo"))
    return qp


def save_qp_to_bytes(qp) -> bytes:
    buf = io.BytesIO()
    save_qp(qp, buf)
    return buf.getvalue()


def load_qp_from_bytes(data: bytes):
    return load_qp(io.BytesIO(data))
