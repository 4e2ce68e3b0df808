"""ctypes bindings for the native host kernels (native/dgp_native.cpp).

Builds the shared library on first use (g++ -O3 -fopenmp); every caller has
a pure-JAX fallback, so a missing toolchain only costs performance, never
functionality.
"""
import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(os.path.dirname(_HERE), "native", "dgp_native.cpp")
_SO = os.path.join(_HERE, "_dgp_native.so")


def _build():
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
            ):
                _build()
            lib = ctypes.CDLL(_SO)
            c_i64 = ctypes.c_int64
            dptr = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
            iptr = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            lib.nn_ordered.argtypes = [dptr, c_i64, c_i64, c_i64, iptr]
            lib.pred_nn.argtypes = [dptr, c_i64, dptr, c_i64, c_i64, c_i64, iptr]
            lib.ancestral_sample.argtypes = [dptr, iptr, dptr, c_i64, c_i64, dptr]
            _LIB = lib
        except Exception:
            _LIB = None
    return _LIB


def nn_ordered(X, m):
    """Ordered NN (reference NNarray layout) on the host; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    X = np.ascontiguousarray(X, np.float64)
    n, d = X.shape
    out = np.empty((n, m + 1), np.int64)
    lib.nn_ordered(X, n, d, int(m), out)
    return out


def pred_nn(query, x, m):
    lib = get_lib()
    if lib is None:
        return None
    query = np.ascontiguousarray(query, np.float64)
    x = np.ascontiguousarray(x, np.float64)
    nq, d = query.shape
    out = np.empty((nq, m), np.int64)
    lib.pred_nn(query, nq, x, x.shape[0], d, int(m), out)
    return out


def ancestral_sample(w, idx, eps):
    lib = get_lib()
    if lib is None:
        return None
    w = np.ascontiguousarray(w, np.float64)
    idx = np.ascontiguousarray(idx, np.int64)
    eps = np.ascontiguousarray(eps, np.float64)
    n, m = w.shape
    out = np.zeros(n, np.float64)
    lib.ancestral_sample(w, idx, eps, n, m, out)
    return out
