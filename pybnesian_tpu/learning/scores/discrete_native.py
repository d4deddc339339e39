"""ctypes loader for the native discrete-family scoring core
(pybnesian_tpu/_native/discretecore.cpp, auto-built on first use like the
graph closure core). The reference scores discrete families in C++
(scores/bic.cpp:66-97 over discrete_indices.cpp counts); this is the
small/medium tier of the adaptive dispatch in learning/scores/bic.py —
one compiled pass over the cached codes for a whole hill-climbing batch.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

__all__ = ["available", "bic_batch"]

_LIB = None
_TRIED = False

# beyond this configuration-space size the device scatter-count path wins
MAX_CONFIGS = 1 << 22


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    pkg_dir = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    src = os.path.join(pkg_dir, "_native", "discretecore.cpp")
    try:
        from ..._native import build_and_load

        lib = build_and_load(src)
        lib.dc_bic_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
        ]
        lib.dc_bic_batch.restype = None
        _LIB = lib
    except Exception:  # pragma: no cover - toolchain specific
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def bic_batch(codes_block: np.ndarray, cards: np.ndarray,
              fam_var: np.ndarray, fam_parents: np.ndarray) -> np.ndarray:
    """BIC scores for F families over the (ncols, n) int32 code block.

    ``fam_parents`` is (F, maxp) with -1 padding. Returns (F,) scores with
    NaN where the family's configuration space exceeded MAX_CONFIGS (the
    caller routes those to another tier).
    """
    lib = _load()
    assert lib is not None
    ncols, n = codes_block.shape
    F, maxp = fam_parents.shape
    out = np.empty(F, np.float64)
    lib.dc_bic_batch(
        codes_block.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, ncols,
        np.ascontiguousarray(cards, np.int64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)
        ),
        np.ascontiguousarray(fam_var, np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)
        ),
        np.ascontiguousarray(fam_parents, np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)
        ),
        F, maxp, MAX_CONFIGS,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
