"""dgpsi checkpoint import (io_dgpsi.read_dgpsi).

Round-trips REAL dgpsi pickles: the reference library at /root/reference is
trained (pure-Python under tools/refshim), saved with its own dill writer
(`dgpsi/utils.py:18`), and re-loaded as dgp_tpu objects.  Predictions of the
imported model must match the reference's own predictions on the carried
state (deterministic given latents + hyper-parameters, up to cache
recomputation precision).
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "dgpsi")),
    reason="reference library not mounted")


@pytest.fixture(scope="module")
def dgpsi_mod():
    sys.path.insert(0, os.path.join(_ROOT, "tools", "refshim"))
    sys.path.insert(0, REF)
    import dgpsi
    yield dgpsi
    sys.path.remove(os.path.join(_ROOT, "tools", "refshim"))
    sys.path.remove(REF)


def _toy_data(n=12, seed=0):
    rs = np.random.RandomState(seed)
    X = np.linspace(0, 1, n)[:, None]
    Y = np.sin(4 * X) + 0.05 * rs.randn(n, 1)
    return X, Y


def test_gp_import_matches_reference_prediction(dgpsi_mod, tmp_path):
    d = dgpsi_mod
    from dgp_tpu import read_dgpsi
    X, Y = _toy_data()
    m = d.gp(X, Y, d.kernel(length=np.array([0.3]), name='matern2.5',
                            scale_est=True, nugget_est=True))
    m.train()
    z = np.linspace(-0.1, 1.1, 31)[:, None]
    mu_ref, var_ref = m.predict(z)

    p = str(tmp_path / "ref_gp")
    d.write(m, p)
    g = read_dgpsi(p)
    assert type(g).__module__.startswith("dgp_tpu")
    np.testing.assert_allclose(np.asarray(g.kernel.length),
                               np.asarray(m.kernel.length))
    np.testing.assert_allclose(np.asarray(g.kernel.scale).ravel(),
                               np.asarray(m.kernel.scale).ravel())
    mu, var = g.predict(z)
    np.testing.assert_allclose(np.asarray(mu).ravel(), mu_ref.ravel(),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(var).ravel(), var_ref.ravel(),
                               rtol=1e-4, atol=1e-7)


def test_dgp_and_emulator_import(dgpsi_mod, tmp_path):
    d = dgpsi_mod
    from dgp_tpu import read_dgpsi, emulator as TpuEmu
    d.nb_seed(5)
    np.random.seed(5)
    X, Y = _toy_data(n=10, seed=5)
    all_layer = d.combine(
        [d.kernel(length=np.array([0.5]), name='sexp')],
        [d.kernel(length=np.array([0.5]), name='sexp', scale_est=True)])
    m = d.dgp(X, [Y], all_layer)
    m.train(N=20, disable=True)

    # --- dgp import: hyper-params, latents and trace carry over exactly
    p = str(tmp_path / "ref_dgp")
    d.write(m, p)
    m2 = read_dgpsi(p)
    assert m2.n_layer == 2 and m2.N == 20
    for lr, lt in zip(m.all_layer, m2.all_layer):
        for nr, nt in zip(lr, lt):
            np.testing.assert_allclose(np.asarray(nt.output),
                                       np.asarray(nr.output))
            if nr.type == 'gp':
                np.testing.assert_allclose(np.asarray(nt.para_path),
                                           np.asarray(nr.para_path))
    # imported model trains on (resume semantics, reference dgp.py:1374)
    m2.train(N=3, disable=True)
    assert m2.N == 23
    # and its estimate() drives a dgp_tpu emulator
    emu2 = TpuEmu(m2.estimate(), N=3)
    mu, var = emu2.predict(X, method='mean_var')
    assert np.all(np.isfinite(np.asarray(mu)))
    rmse = float(np.sqrt(np.mean((np.asarray(mu) - Y) ** 2)))
    assert rmse < 0.5, rmse

    # --- emulator import: stored imputations transfer verbatim
    emu_ref = d.emulator(m.estimate(), N=4)
    mu_ref, var_ref = emu_ref.predict(X, method='mean_var')
    pe = str(tmp_path / "ref_emu")
    d.write(emu_ref, pe)
    emu_t = read_dgpsi(pe)
    assert len(emu_t.all_layer_set) == 4
    mu_t, var_t = emu_t.predict(X, method='mean_var')
    # identical imputations + deterministic propagation => tight agreement
    np.testing.assert_allclose(np.asarray(mu_t).ravel(), mu_ref.ravel(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_t).ravel(), var_ref.ravel(),
                               rtol=1e-3, atol=1e-6)


def test_lgp_container_import(dgpsi_mod, tmp_path):
    d = dgpsi_mod
    from dgp_tpu import read_dgpsi
    d.nb_seed(3)
    np.random.seed(3)
    X1 = np.linspace(0, 1, 10)[:, None]
    Y1 = np.sin(2 * X1)
    m1 = d.gp(X1, Y1, d.kernel(length=np.array([0.5]), name='matern2.5',
                               scale_est=True))
    m1.train()
    X2 = np.linspace(-1, 1, 10)[:, None]
    Y2 = np.cos(2 * X2)
    m2 = d.gp(X2, Y2, d.kernel(length=np.array([0.5]), name='matern2.5',
                               scale_est=True))
    m2.train()
    c1 = d.container(m1.export(), local_input_idx=np.array([0]))
    c2 = d.container(m2.export(), local_input_idx=np.array([0]))
    lm = d.lgp([[c1], [c2]])
    z = np.linspace(0, 1, 7)[:, None]
    mu_ref, _ = lm.predict(z)

    p = str(tmp_path / "ref_lgp")
    d.write(lm, p)
    lt = read_dgpsi(p)
    mu, _ = lt.predict(z)
    np.testing.assert_allclose(np.asarray(mu[0]).ravel(),
                               np.asarray(mu_ref[0]).ravel(),
                               rtol=1e-4, atol=1e-5)


def test_pre24_pickle_gfod_migration(tmp_path, monkeypatch):
    """Pre-2.4 dgpsi pickles carry a 'gfod' attribute and store prior_coef in
    the OLD parameterisation; the reference renormalises at load time
    (kernel_class.__setstate__, kernel_class.py:146-158).  Stub loads (dgpsi
    not importable) must apply the same migration."""
    import pickle as pk
    import types

    # hide any previously imported dgpsi so the read takes the stub path
    for key in [k for k in sys.modules
                if k == 'dgpsi' or k.startswith('dgpsi.')]:
        monkeypatch.delitem(sys.modules, key)
    monkeypatch.setattr(sys, 'path', [p for p in sys.path
                                      if 'reference' not in p
                                      and 'refshim' not in p])

    # craft a by-reference pickle whose class resolves to dgpsi.kernel
    fake = types.ModuleType('dgpsi')

    class kernel:  # noqa: N801 - mirrors the reference class name
        pass

    kernel.__module__ = 'dgpsi'
    kernel.__qualname__ = 'kernel'
    fake.kernel = kernel
    monkeypatch.setitem(sys.modules, 'dgpsi', fake)

    rs = np.random.RandomState(0)
    Xin = rs.rand(10, 1)
    obj = kernel()
    obj.__dict__.update(
        length=np.array([0.4]), scale=np.array([1.2]),
        nugget=np.array([1e-6]), name='sexp', prior_name='ga',
        # OLD ga parameterisation: shape is post-shim shape + 1
        prior_coef=np.array([2.6, 2.0]),
        gfod=None,  # pre-2.4 compiled-prior marker
        input=Xin, output=np.sin(4 * Xin),
        scale_est=True, nugget_est=False, D=1)
    p = str(tmp_path / 'pre24.pkl')
    with open(p, 'wb') as f:
        pk.dump(obj, f)

    monkeypatch.delitem(sys.modules, 'dgpsi')
    from dgp_tpu import read_dgpsi
    k = read_dgpsi(p)
    assert type(k).__module__.startswith('dgp_tpu')
    np.testing.assert_allclose(np.asarray(k.prior_coef)[0], 1.6)
    assert not hasattr(k, 'gfod')
