"""Cosine similarity + Hungarian reference assignment.

Maps reference components C21/C22 (/root/reference/R/helpers.R:218-398):
``pairwise_sim`` becomes a single jnp matmul of normalized columns; the
Hungarian solve runs in native C++ (native/hungarian.cpp, compiled on first
use and loaded via ctypes) with a scipy fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np
import pandas as pd

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "native")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _load_native():
    """Compile + load the C++ Hungarian solver; cache the handle."""
    global _LIB, _LIB_FAILED
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        src = os.path.abspath(os.path.join(_NATIVE_DIR, "hungarian.cpp"))
        so = os.path.abspath(os.path.join(_NATIVE_DIR, "libhungarian.so"))
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", so, src],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so)
            lib.hungarian_solve.restype = ctypes.c_double
            lib.hungarian_solve.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
                ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
            lib.hungarian_solve_batch.restype = None
            lib.hungarian_solve_batch.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32)]
            _LIB = lib
        except Exception:
            _LIB_FAILED = True
        return _LIB


def hungarian_solve(cost: np.ndarray) -> np.ndarray:
    """Minimum-cost assignment of rows to columns; -1 for unassigned rows."""
    cost = np.ascontiguousarray(cost, np.float64)
    r, c = cost.shape
    lib = _load_native()
    if lib is not None:
        out = np.full(r, -1, np.int32)
        lib.hungarian_solve(
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), r, c,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out
    from scipy.optimize import linear_sum_assignment

    rows, cols = linear_sum_assignment(cost)
    out = np.full(r, -1, np.int32)
    out[rows] = cols
    return out


def hungarian_solve_batch(costs: np.ndarray) -> np.ndarray:
    """Batch of independent assignments: (B, R, C) → (B, R) column indices."""
    costs = np.ascontiguousarray(costs, np.float64)
    b, r, c = costs.shape
    lib = _load_native()
    if lib is not None:
        out = np.full((b, r), -1, np.int32)
        lib.hungarian_solve_batch(
            costs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), b, r, c,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out
    return np.stack([hungarian_solve(costs[i]) for i in range(b)])


def pairwise_cosine(mat1: np.ndarray, mat2: np.ndarray,
                    which: str = "cols") -> np.ndarray:
    """All-pairs cosine similarity between columns (or rows) of two matrices.

    Parity: pairwise_sim (helpers.R:218-267), as one normalized matmul
    instead of the reference's double sapply over lsa::cosine.
    """
    a = np.asarray(mat1, np.float64)
    b = np.asarray(mat2, np.float64)
    if which == "cols":
        a, b = a.T, b.T
    if a.shape[1] != b.shape[1]:
        raise ValueError(
            f"Different number of overlapping dims: {a.shape[1]} != {b.shape[1]}")
    an = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-30)
    bn = b / np.maximum(np.linalg.norm(b, axis=1, keepdims=True), 1e-30)
    return an @ bn.T


def hungarian_assignment(
    estimated_P,
    reference_P="cosmic",
    which: str = "cols",
    keep_all_est: bool = True,
    keep_all_ref: bool = False,
    return_mat: bool = False,
    check_reference_order: bool = True,
    est_names=None,
    ref_names=None,
):
    """Assign estimated factors to reference factors maximizing total cosine.

    Parity: hungarian_assignment (helpers.R:287-398) including the square
    padding with zero-cosine 'None' rows/cols and the returned
    (sig_est, sig_ref, cos_sim) frame.
    """
    from .cosmic import get_cosmic

    est_df = None
    if isinstance(estimated_P, pd.DataFrame):
        est_df = estimated_P
        estimated_P = est_df.to_numpy()
    if isinstance(reference_P, str):
        if reference_P != "cosmic":
            raise ValueError("reference_P must be a matrix or 'cosmic'")
        reference_P = get_cosmic()
    ref_df = reference_P if isinstance(reference_P, pd.DataFrame) else None
    if ref_df is not None:
        if check_reference_order and est_df is not None:
            if set(est_df.index) == set(ref_df.index):
                ref_df = ref_df.loc[est_df.index]
        reference_P = ref_df.to_numpy()

    sim = pairwise_cosine(estimated_P, reference_P, which=which)

    if ref_names is None:
        ref_names = (list(ref_df.columns) if ref_df is not None
                     else [f"Ref{i+1}" for i in range(sim.shape[1])])
    if est_names is None:
        est_names = (list(est_df.columns) if est_df is not None
                     else [f"Est{i+1}" for i in range(sim.shape[0])])

    cols = hungarian_solve(-sim)
    rows = [i for i in range(sim.shape[0]) if cols[i] >= 0]
    col_list = [int(cols[i]) for i in rows]
    if keep_all_est:
        rows += [i for i in range(sim.shape[0]) if i not in rows]
    if keep_all_ref:
        col_list += [j for j in range(sim.shape[1]) if j not in col_list]

    re_sim = sim[np.ix_(rows, col_list)] if col_list else sim[rows][:, :0]
    row_names = [est_names[i] for i in rows]
    col_names = [ref_names[j] for j in col_list]
    # square-pad with zero-cosine "None" rows/cols (helpers.R:367-377)
    nr, nc = re_sim.shape
    if nr > nc:
        re_sim = np.concatenate([re_sim, np.zeros((nr, nr - nc))], axis=1)
        col_names += ["None"] * (nr - nc)
    elif nc > nr:
        re_sim = np.concatenate([re_sim, np.zeros((nc - nr, nc))], axis=0)
        row_names += ["None"] * (nc - nr)

    if return_mat:
        return pd.DataFrame(re_sim, index=row_names, columns=col_names)

    return pd.DataFrame({
        "sig_est": row_names,
        "sig_ref": col_names,
        "cos_sim": np.diag(re_sim),
    })
