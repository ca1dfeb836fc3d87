"""ctypes binding for the first-party exact EMD solver (emd.cpp), with a
scipy.optimize.linprog fallback so the loss works before `make` is run.

Replaces POT's ot.emd used by the reference (losses/rec_encoder_loss.py:11-18).
Marginals here are always uniform (1/n), matching the reference.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libemd.so"
_lib = None
_lib_tried = False


def _load_lib():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_HERE)], check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.emd_plan.restype = ctypes.c_int
        lib.emd_plan.argtypes = [
            ctypes.c_int,
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def exact_emd_plan(cost: np.ndarray) -> np.ndarray:
    """Exact transport plan for uniform marginals. cost: (n, m) float64."""
    cost = np.ascontiguousarray(cost, np.float64)
    n, m = cost.shape
    a = np.full(n, 1.0 / n)
    b = np.full(m, 1.0 / m)

    lib = _load_lib()
    if lib is not None:
        plan = np.zeros((n, m), np.float64)
        lib.emd_plan(n, m, cost, a, b, plan, 100000)
        return plan
    return _linprog_plan(cost, a, b)


def _linprog_plan(cost: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact LP fallback via scipy HiGHS."""
    from scipy.optimize import linprog
    from scipy.sparse import coo_matrix

    n, m = cost.shape
    nv = n * m
    rows, cols, vals = [], [], []
    for i in range(n):
        for j in range(m):
            k = i * m + j
            rows.append(i)
            cols.append(k)
            vals.append(1.0)
            rows.append(n + j)
            cols.append(k)
            vals.append(1.0)
    A_eq = coo_matrix((vals, (rows, cols)), shape=(n + m, nv))
    # drop the last (redundant) constraint for numerical stability
    res = linprog(
        cost.ravel(), A_eq=A_eq.tocsr()[:-1], b_eq=np.concatenate([a, b])[:-1], bounds=(0, None), method="highs"
    )
    if not res.success:
        raise RuntimeError(f"linprog EMD failed: {res.message}")
    return res.x.reshape(n, m)
