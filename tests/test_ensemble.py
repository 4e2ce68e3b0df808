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


@pytest.mark.slow
def test_compiled_ensemble_approx_nn():
    """Approximate-NN (IVF) models must use the compiled ensemble too
    (pre-fix they fell back to the host loop), and the in-program IVF
    search must agree with the exact in-program search to high accuracy."""
    nb_seed(5)
    rng = np.random.RandomState(5)
    n = 1500  # > 4 * vecchia.nn._BLOCK so the IVF branch engages
    X = rng.rand(n, 1) * 2 - 1
    Y = np.sin(3 * X) + 0.05 * rng.randn(n, 1)
    m = dgp(X, Y, vecchia=True, m=10)
    m.train(N=6, disable=True, chunk_size=3)
    struct = m.estimate()
    for layer in struct:
        for nd in layer:
            if nd.type == 'gp':
                nd.nn_method = 'approx'
    emu = emulator(struct, N=3)
    assert ens_mod.supported(emu.all_layer_set) is None
    xt = np.linspace(-1, 1, 400)[:, None]
    mu_a, var_a = emu.predict(xt, m=15)
    assert np.all(np.isfinite(mu_a)) and np.all(var_a >= 0)

    # same stored imputations, exact in-program search
    for layer_set in emu.all_layer_set:
        for layer in layer_set:
            for nd in layer:
                if nd.type == 'gp':
                    nd.nn_method = 'exact'
    emu._ens_cache = None
    emu.__dict__.pop('_ens_cache', None)
    mu_e, var_e = emu.predict(xt, m=15)

    rmse_a = np.sqrt(np.mean((mu_a - np.sin(3 * xt)) ** 2))
    rmse_e = np.sqrt(np.mean((mu_e - np.sin(3 * xt)) ** 2))
    assert rmse_a < 0.15, rmse_a
    assert rmse_e < 0.15, rmse_e
    # IVF recall > 95%: predictions nearly identical
    assert np.mean(np.abs(mu_a - mu_e)) < 0.02, np.mean(np.abs(mu_a - mu_e))
