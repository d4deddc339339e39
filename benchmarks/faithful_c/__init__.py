"""Build + load the compiled faithful baseline (see faithful.cpp)."""

from __future__ import annotations

import ctypes
import os
import numpy as np

_LIB = None


def load():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "faithful.cpp")
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(here)))
    from pybnesian_tpu._native import build_and_load

    lib = build_and_load(src)
    dptr = ctypes.POINTER(ctypes.c_double)
    lib.fb_lg_pipeline.argtypes = [dptr, dptr, dptr, dptr, ctypes.c_int,
                                   ctypes.c_int, dptr]
    lib.fb_lg_pipeline.restype = ctypes.c_double
    lib.fb_discrete_bic.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, dptr,
    ]
    lib.fb_discrete_bic.restype = ctypes.c_double
    _LIB = lib
    return lib


def lg_pipeline_rate(df, reps: int) -> tuple[float, float]:
    """(pipelines/s, slogl) for the config-1 README network."""
    lib = load()
    cols = [np.ascontiguousarray(df[c].to_numpy(), np.float64)
            for c in ["a", "b", "c", "d"]]
    n = len(cols[0])
    out = ctypes.c_double(0.0)
    ptrs = [c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) for c in cols]
    elapsed = lib.fb_lg_pipeline(*ptrs, n, reps, ctypes.byref(out))
    return reps / elapsed, out.value


def discrete_bic_rate(df, n_fams: int, card: int = 3) -> float:
    """family-scores/s for 1-parent discrete BIC families."""
    lib = load()
    codes = np.ascontiguousarray(
        np.column_stack([df[c].cat.codes.to_numpy() for c in df.columns])
        .T.astype(np.int32)
    )
    n = len(df)
    d = len(df.columns)
    out = ctypes.c_double(0.0)
    elapsed = lib.fb_discrete_bic(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, d, card, n_fams, ctypes.byref(out),
    )
    return n_fams / elapsed
