"""Native (C++/ctypes) host kernels vs the device implementations."""
import numpy as np
import pytest

from dgp_tpu import native
from dgp_tpu.vecchia import nn as vnn


pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")


def test_native_nn_ordered_matches_device():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(300, 2))
    m = 8
    got = native.nn_ordered(X, m)
    ref = np.asarray(vnn._nn_ordered_impl(np.asarray(X), m))
    np.testing.assert_array_equal(got, ref)


def test_native_pred_nn_matches_device():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(200, 3))
    Q = rng.normal(size=(40, 3))
    got = native.pred_nn(Q, X, 7)
    ref = np.asarray(vnn._pred_nn_impl(np.asarray(Q), np.asarray(X), 7))
    np.testing.assert_array_equal(got, ref)


def test_native_ancestral_sample():
    rng = np.random.default_rng(2)
    n, m = 50, 4
    w = rng.normal(size=(n, m)) * 0.1
    idx = np.zeros((n, m), np.int64)
    for i in range(n):
        if i > 0:
            idx[i] = rng.integers(0, i, size=m)
        else:
            w[i] = 0.0
    eps = rng.normal(size=n)
    got = native.ancestral_sample(w, idx, eps)
    ref = np.zeros(n)
    for i in range(n):
        ref[i] = eps[i] + w[i] @ ref[idx[i]]
    np.testing.assert_allclose(got, ref, rtol=1e-12)
