"""Pure-Python stand-in for the `numba` package (NOT installed in this
image), exposing exactly the surface `dgpsi` imports (reference
`functions.py:1`, `vecchia.py:1`, `utils.py:3`).

This exists so the read-only reference library at /root/reference can be
*executed* (slowly, uncompiled) on identical data draws, producing
reference-anchored quality numbers for the parity gates in
tools/parity.py.  The @njit kernels are plain Python under this shim --
orders of magnitude slower, numerically identical.
"""
import numpy as np


class _Config:
    # dgpsi only reads NUMBA_NUM_THREADS and assigns THREADING_LAYER
    NUMBA_NUM_THREADS = 1
    THREADING_LAYER = "default"


class _Type:
    """Signature-building stub: float64(float64) must be callable."""

    def __call__(self, *args, **kwargs):
        return self


config = _Config()
prange = range
float64 = _Type()


def njit(*args, **kwargs):
    if args and callable(args[0]):
        return args[0]

    def deco(f):
        return f

    return deco


jit = njit


def vectorize(*args, **kwargs):
    def deco(f):
        return np.vectorize(f)

    return deco


def set_num_threads(n):
    pass


def get_num_threads():
    return 1
