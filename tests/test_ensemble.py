"""Compiled device-resident ensemble prediction vs the per-imputation host
loop: both paths must produce the same mean/variance propagation for the
same stored imputations (models/ensemble.py vs emulation._propagate_generic).
"""
import numpy as np
import pytest

from dgp_tpu import dgp, emulator, kernel, combine, nb_seed
from dgp_tpu.likelihoods import Hetero
from dgp_tpu.models import ensemble as ens_mod


def _fallback_predict(emu, x, m):
    """Force the reference (host-loop) path on the same emulator."""
    comp = emu._compiled_propagation

    class _Off:
        def __call__(self, *a, **k):
            return None

    emu._compiled_propagation = _Off()
    try:
        return emu.predict(x, m=m)
    finally:
        emu._compiled_propagation = comp


def _make_data(n=60, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.rand(n, 1)
    Y = np.sin(6 * X) + 0.05 * rng.randn(n, 1)
    return X, Y


@pytest.mark.parametrize("vecch", [False, pytest.param(True, marks=pytest.mark.slow)])
def test_two_layer_equivalence(vecch):
    nb_seed(1)
    X, Y = _make_data()
    lay1 = [kernel(length=np.array([0.4]), name='sexp')]
    lay2 = [kernel(length=np.array([0.4]), name='sexp', scale_est=True,
                   nugget_est=True, connect=np.arange(1))]
    m = dgp(X, Y, combine(lay1, lay2), vecchia=vecch, m=12)
    m.train(N=10, disable=True)
    emu = emulator(m.estimate(), N=3)
    z = np.linspace(0, 1, 40).reshape(-1, 1)
    mu_c, var_c = emu.predict(z, m=15)
    assert emu._ens_cache is not None  # compiled path actually ran
    mu_h, var_h = _fallback_predict(emu, z, 15)
    np.testing.assert_allclose(mu_c, mu_h, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(var_c, var_h, rtol=2e-3, atol=2e-5)


@pytest.mark.slow
def test_hetero_equivalence():
    nb_seed(2)
    rng = np.random.RandomState(3)
    X = rng.rand(50, 1)
    Y = np.sin(5 * X) + (0.02 + 0.2 * X) * rng.randn(50, 1)
    lay1 = [kernel(length=np.array([0.4]), name='sexp'),
            kernel(length=np.array([0.4]), name='sexp')]
    m = dgp(X, Y, combine(lay1, [Hetero()]))
    m.train(N=10, disable=True)
    emu = emulator(m.estimate(), N=2)
    z = np.linspace(0, 1, 30).reshape(-1, 1)
    mu_c, var_c = emu.predict(z, m=15)
    mu_h, var_h = _fallback_predict(emu, z, 15)
    np.testing.assert_allclose(mu_c, mu_h, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(var_c, var_h, rtol=2e-3, atol=2e-5)


@pytest.mark.slow
def test_loo_equivalence():
    nb_seed(4)
    X, Y = _make_data(seed=5)
    lay1 = [kernel(length=np.array([0.4]), name='sexp')]
    lay2 = [kernel(length=np.array([0.4]), name='sexp', scale_est=True,
                   connect=np.arange(1))]
    m = dgp(X, Y, combine(lay1, lay2), vecchia=True, m=10)
    m.train(N=10, disable=True)
    emu = emulator(m.estimate(), N=2)
    mu_c, var_c = emu.loo(X, m=10)
    with emu.change_vecch_state():
        mu_h, var_h = _fallback_predict(emu, X, 11)
    np.testing.assert_allclose(mu_c, mu_h, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(var_c, var_h, rtol=2e-3, atol=2e-5)
