"""Native helpers (C, built on demand via the system compiler).

score_rcp_nr: bit-exact float32 identity computation matching the
reference binary's -Ofast reciprocal sequence (see fastdiv.c). Falls
back to IEEE float32 division when no compiler is available, which can
differ by 1 ulp on rare inputs.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(__file__)
    src = os.path.join(here, "fastdiv.c")
    so = os.path.join(here, "fastdiv.so")
    try:
        if not os.path.exists(so) or \
                os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["cc", "-O2", "-msse", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.score_rcp_nr.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_long]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def score_identity(ed: np.ndarray, divisor: np.ndarray) -> np.ndarray:
    """float32 1 - ed/divisor with the reference binary's rounding."""
    ed32 = np.ascontiguousarray(ed, dtype=np.float32)
    dv32 = np.ascontiguousarray(divisor, dtype=np.float32)
    lib = _load()
    if lib is None:
        return (np.float32(1.0) - ed32 / dv32).astype(np.float32)
    out = np.empty(len(ed32), dtype=np.float32)
    lib.score_rcp_nr(
        ed32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dv32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(len(ed32)))
    return out
