r"""ctypes bindings to the native C++ core (``src/pxtpu_native.cpp``).

Builds the shared library on first use with g++ (-O3 -fopenmp); every entry
point has a numpy fallback in :mod:`pxmcmc_tpu.ops`, so an unavailable
toolchain degrades gracefully.  Bindings use ctypes (no pybind11 in this
environment).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "src", "pxtpu_native.cpp")
_LIB_PATH = os.path.join(_HERE, "libpxtpu_native.so")

_lib = None
_build_failed = False


def build(force: bool = False) -> str:
    """Compile the shared library; returns its path."""
    if force or not os.path.exists(_LIB_PATH) or (
        os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
    ):
        cmd = [
            "g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-fopenmp",
            _SRC, "-o", _LIB_PATH,
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    return _LIB_PATH


def _load():
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        raise ImportError("native build previously failed")
    try:
        path = build()
        lib = ctypes.CDLL(path)
    except Exception as e:  # pragma: no cover
        _build_failed = True
        raise ImportError(f"cannot build/load native library: {e}") from e
    lib.wigner_d_table.argtypes = [
        ctypes.c_int,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    lib.path_matrix.argtypes = [
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    lib.pxtpu_num_threads.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except ImportError:
        return False


def wigner_d_table_native(L: int, n: int, thetas: np.ndarray) -> np.ndarray:
    """C++/OpenMP version of :func:`pxmcmc_tpu.ops.wigner.wigner_d_table`."""
    lib = _load()
    thetas = np.ascontiguousarray(thetas, dtype=np.float64)
    T = thetas.size
    out = np.zeros((2 * L - 1, T, L), dtype=np.float64)
    lib.wigner_d_table(L, n, thetas, T, out)
    return out


def path_matrix_native(starts, stops, L: int, points_per_rad: int = 160) -> np.ndarray:
    """C++/OpenMP version of :func:`pxmcmc_tpu.ops.paths.build_path_matrix`."""
    lib = _load()
    starts = np.ascontiguousarray(starts, dtype=np.float64)
    stops = np.ascontiguousarray(stops, dtype=np.float64)
    npaths = starts.shape[0]
    out = np.zeros((npaths, L * (2 * L - 1)), dtype=np.float64)
    lib.path_matrix(starts, stops, npaths, L, points_per_rad, out)
    return out
