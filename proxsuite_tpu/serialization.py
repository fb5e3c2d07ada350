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
    d = dict(d)
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
    int_fields = {"iter", "iter_ext", "mu_updates", "rho_updates", "status"}
    info = Info(**{
        k: np.asarray(v, np.int32 if k in int_fields else dtype)
        for k, v in info_d.items()})
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
