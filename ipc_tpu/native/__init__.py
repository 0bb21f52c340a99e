"""ctypes bindings for the native C++ host runtime (ipc_native.cpp).

Builds the shared library on first import (g++ -O3, cached next to the
source); every entry point has a pure-Python fallback elsewhere in the
package, so environments without a toolchain still work (`available()`
gates usage).
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ipc_native.cpp")
_SO = os.path.join(_DIR, "libipc_native.so")

_lib = None
_err = None


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _err
    if _lib is not None or _err is not None:
        return _lib
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.ipc_free.argtypes = [ctypes.c_void_p]
        lib.parse_msh.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.parse_msh.restype = ctypes.c_int
        lib.boundary_faces.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.boundary_faces.restype = ctypes.c_int
        lib.grid_candidates.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_double, ctypes.c_double,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.grid_candidates.restype = ctypes.c_int64
        _lib = lib
    except Exception as e:  # pragma: no cover
        _err = e
    return _lib


def available():
    return _load() is not None


def parse_msh(path):
    """Native .msh parser -> (V (n,3) f64, T (m,4) i32)."""
    lib = _load()
    Vp = ctypes.POINTER(ctypes.c_double)()
    Tp = ctypes.POINTER(ctypes.c_int32)()
    nV = ctypes.c_int64()
    nT = ctypes.c_int64()
    rc = lib.parse_msh(path.encode(), ctypes.byref(Vp), ctypes.byref(nV),
                       ctypes.byref(Tp), ctypes.byref(nT))
    if rc != 0:
        raise IOError(f"parse_msh({path}) failed with code {rc}")
    V = np.ctypeslib.as_array(Vp, shape=(nV.value, 3)).copy()
    T = np.ctypeslib.as_array(Tp, shape=(nT.value, 4)).copy()
    lib.ipc_free(Vp)
    lib.ipc_free(Tp)
    return V, T


def boundary_faces(tets):
    """Native boundary-face extraction -> (nF,3) i32 (outward oriented)."""
    lib = _load()
    tets = np.ascontiguousarray(tets, dtype=np.int32)
    Fp = ctypes.POINTER(ctypes.c_int32)()
    nF = ctypes.c_int64()
    lib.boundary_faces(
        tets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(tets)),
        ctypes.byref(Fp),
        ctypes.byref(nF),
    )
    F = np.ctypeslib.as_array(Fp, shape=(nF.value, 3)).copy()
    lib.ipc_free(Fp)
    return F


def grid_candidates(X, A, B, cell_size, gap, skip_shared=True, upper_only=False, cap=None):
    """Uniform-grid broad phase: candidate (a, b) index pairs between
    primitive sets A (nA, ka) and B (nB, kb) over positions X (n,3).

    Returns (pairs (m,2) i32, total_count). total_count > m means the cap
    was hit; call again with a larger cap."""
    lib = _load()
    X = np.ascontiguousarray(X, dtype=np.float64)
    A = np.ascontiguousarray(np.atleast_2d(A), dtype=np.int32)
    B = np.ascontiguousarray(np.atleast_2d(B), dtype=np.int32)
    if cap is None:
        cap = max(1024, 16 * max(len(A), len(B)))
    out = np.empty((cap, 2), dtype=np.int32)
    total = ctypes.c_int64()
    written = lib.grid_candidates(
        X.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), ctypes.c_int64(len(X)),
        A.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), ctypes.c_int64(len(A)),
        ctypes.c_int32(A.shape[1]),
        B.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), ctypes.c_int64(len(B)),
        ctypes.c_int32(B.shape[1]),
        ctypes.c_double(cell_size), ctypes.c_double(gap),
        ctypes.c_int32(1 if skip_shared else 0),
        ctypes.c_int32(1 if upper_only else 0),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), ctypes.c_int64(cap),
        ctypes.byref(total),
    )
    return out[:written], int(total.value)
