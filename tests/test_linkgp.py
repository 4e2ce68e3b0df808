"""Linked (D)GP system tests (demo/model_linking.ipynb style: a chain of
computer models emulated separately and composed)."""
import numpy as np

from dgp_tpu import rng
from dgp_tpu.models.node import kernel, combine
from dgp_tpu.models.gp import gp
from dgp_tpu.models.dgp import dgp
from dgp_tpu.models.linkgp import container, lgp
from dgp_tpu.models.synthetic import path
from dgp_tpu import utils


def _seed(s):
    np.random.seed(s)
    rng.seed(s)


def f1(x):
    return np.sin(np.pi * x)


def f2(w):
    return np.cos(2 * w) + w / 2


def test_linked_gp_to_gp_chain():
    _seed(0)
    # model 1: GP on f1, model 2: GP on f2(f1 range)
    X1 = np.linspace(0, 1, 12).reshape(-1, 1)
    Y1 = f1(X1)
    m1 = gp(X1, Y1, kernel(length=np.array([0.5]), name='matern2.5', scale_est=True))
    m1.train()
    W = np.linspace(Y1.min(), Y1.max(), 12).reshape(-1, 1)
    m2 = gp(W, f2(W), kernel(length=np.array([0.5]), name='matern2.5', scale_est=True))
    m2.train()

    c1 = container(m1.export(), local_input_idx=np.array([0]))
    c2 = container(m2.export(), local_input_idx=np.array([0]))
    system = lgp(combine([c1], [c2]), N=5)

    xt = np.linspace(0.05, 0.95, 30).reshape(-1, 1)
    mu, var = system.predict(xt)
    truth = f2(f1(xt))
    rmse = np.sqrt(np.mean((mu[0] - truth) ** 2))
    assert rmse < 0.1, rmse
    assert np.all(np.asarray(var[0]) >= 0)


def test_linked_gp_to_dgp_chain():
    _seed(1)
    X1 = np.linspace(0, 1, 12).reshape(-1, 1)
    Y1 = f1(X1)
    m1 = gp(X1, Y1, kernel(length=np.array([0.5]), name='sexp', scale_est=True))
    m1.train()
    W = np.linspace(Y1.min(), Y1.max(), 15).reshape(-1, 1)
    m2 = dgp(W, f2(W))
    m2.train(N=50, disable=True, chunk_size=25)

    c1 = container(m1.export(), local_input_idx=np.array([0]))
    c2 = container(m2.estimate(), local_input_idx=np.array([0]))
    system = lgp(combine([c1], [c2]), N=4)

    xt = np.linspace(0.05, 0.95, 25).reshape(-1, 1)
    mu, var = system.predict(xt)
    truth = f2(f1(xt))
    rmse = np.sqrt(np.mean((mu[0] - truth) ** 2))
    assert rmse < 0.15, rmse


def test_linked_full_layer_and_sampling():
    _seed(2)
    X1 = np.linspace(0, 1, 10).reshape(-1, 1)
    m1 = gp(X1, f1(X1), kernel(length=np.array([0.5]), name='sexp', scale_est=True))
    m1.train()
    W = np.linspace(-1, 1, 10).reshape(-1, 1)
    m2 = gp(W, f2(W), kernel(length=np.array([0.5]), name='sexp', scale_est=True))
    m2.train()
    system = lgp(combine([container(m1.export(), np.array([0]))],
                         [container(m2.export(), np.array([0]))]), N=1)
    xt = np.linspace(0, 1, 8).reshape(-1, 1)
    mu_l, var_l = system.predict(xt, full_layer=True)
    assert len(mu_l) == 2
    samples = system.predict(xt, method='sampling', sample_size=20)
    assert samples[0].shape == (1, 8, 20)


def test_multi_input_second_layer():
    """Second-layer model fed by two first-layer emulators."""
    _seed(3)
    X = np.linspace(0, 1, 12).reshape(-1, 1)
    ma = gp(X, np.sin(np.pi * X), kernel(length=np.array([0.5]), name='sexp', scale_est=True))
    ma.train()
    mb = gp(X, np.cos(np.pi * X), kernel(length=np.array([0.5]), name='sexp', scale_est=True))
    mb.train()
    rng2 = np.random.default_rng(0)
    W = rng2.uniform(-1, 1, size=(25, 2))
    Zc = (W[:, [0]] ** 2 + W[:, [1]])
    mc = gp(W, Zc, kernel(length=np.array([0.5, 0.5]), name='sexp', scale_est=True))
    mc.train()
    system = lgp(combine(
        [container(ma.export(), np.array([0])), container(mb.export(), np.array([0]))],
        [container(mc.export(), np.array([0, 1]))]), N=1)
    xt = np.linspace(0.1, 0.9, 15).reshape(-1, 1)
    mu, var = system.predict(xt)
    truth = np.sin(np.pi * xt) ** 2 + np.cos(np.pi * xt)
    rmse = np.sqrt(np.mean((mu[0] - truth) ** 2))
    assert rmse < 0.15, rmse


def test_prior_path_sampling():
    _seed(4)
    X = np.linspace(0, 1, 20).reshape(-1, 1)
    layers = combine([kernel(length=np.array([0.3]))], [kernel(length=np.array([1.0]))])
    p = path(X, layers)
    paths = p.generate(N=7)
    assert paths.shape == (1, 7, 20)
    assert np.all(np.isfinite(paths))
    # prior paths should have roughly unit marginal variance
    assert 0.1 < np.var(paths) < 10


def test_write_read_summary(tmp_path):
    _seed(5)
    X = np.linspace(0, 1, 10).reshape(-1, 1)
    Y = np.sin(2 * np.pi * X)
    m = gp(X, Y, kernel(length=np.array([1.0]), scale_est=True))
    m.train()
    utils.write(m, str(tmp_path / "emu"))
    m2 = utils.read(str(tmp_path / "emu"))
    mu1, _ = m.predict(X)
    mu2, _ = m2.predict(X)
    np.testing.assert_allclose(mu1, mu2, rtol=1e-10)
    utils.summary(m)            # smoke: prints a table
    utils.summary(m.kernel)


def test_write_read_dgp_emulator(tmp_path):
    _seed(6)
    from dgp_tpu.models.emulation import emulator
    X = np.linspace(0, 1, 10).reshape(-1, 1)
    Y = np.sin(2 * np.pi * X)
    m = dgp(X, Y)
    m.train(N=10, disable=True, chunk_size=10)
    emu = emulator(m.estimate(), N=3)
    utils.write(emu, str(tmp_path / "demu"))
    emu2 = utils.read(str(tmp_path / "demu"))
    mu1, _ = emu.predict(X)
    mu2, _ = emu2.predict(X)
    np.testing.assert_allclose(mu1, mu2, rtol=1e-8, atol=1e-10)
    utils.summary(emu2)


def test_multistart():
    _seed(7)
    def neg_branin(x2d):
        x, y = x2d[:, 0], x2d[:, 1]
        a, b, c, r, s, t = 1, 5.1 / (4 * np.pi**2), 5 / np.pi, 6, 10, 1 / (8 * np.pi)
        val = a * (y - b * x**2 + c * x - r) ** 2 + s * (1 - t) * np.cos(x) + s
        return (-val).reshape(-1, 1)

    inits = np.random.uniform([-5, 0], [10, 15], size=(8, 2))
    best = utils.multistart(neg_branin, inits, np.array([-5.0, 0.0]),
                            np.array([10.0, 15.0]))
    assert -neg_branin(best.reshape(1, -1))[0, 0] < 0.5  # branin min = 0.398


def test_multistart_device_path():
    """A jax-traceable objective must run the vmapped on-device L-BFGS with
    no scipy-fallback warning."""
    import warnings
    import jax.numpy as jnp
    _seed(9)

    def neg_branin(x2d):
        x, y = x2d[:, 0], x2d[:, 1]
        a, b, c, r, s, t = 1, 5.1 / (4 * np.pi**2), 5 / np.pi, 6, 10, 1 / (8 * np.pi)
        val = a * (y - b * x**2 + c * x - r) ** 2 + s * (1 - t) * jnp.cos(x) + s
        return (-val).reshape(-1, 1)

    inits = np.random.uniform([-5, 0], [10, 15], size=(8, 2))
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        best = utils.multistart(neg_branin, inits, np.array([-5.0, 0.0]),
                                np.array([10.0, 15.0]))
    assert -float(neg_branin(jnp.asarray(best.reshape(1, -1)))[0, 0]) < 0.5


def test_compiled_lgp_matches_host_loop():
    """The one-program system pass (models/linked_ensemble.py) must agree
    with the per-imputation host loop on the same stored imputations
    (reference semantics: linkgp.py:285-495)."""
    _seed(7)
    X1 = np.linspace(0, 1, 12).reshape(-1, 1)
    Y1 = f1(X1)
    m1 = gp(X1, Y1, kernel(length=np.array([0.5]), name='matern2.5',
                           scale_est=True))
    m1.train()
    W = np.linspace(Y1.min(), Y1.max(), 15).reshape(-1, 1)
    m2 = dgp(W, f2(W))
    m2.train(N=30, disable=True, chunk_size=15)
    c1 = container(m1.export(), local_input_idx=np.array([0]))
    c2 = container(m2.estimate(), local_input_idx=np.array([0]))
    system = lgp(combine([c1], [c2]), N=4)

    xt = np.linspace(0.05, 0.95, 40).reshape(-1, 1)
    mu_c, var_c = system.predict(xt)
    assert getattr(system, '_lgp_cache', None) is not None, \
        'compiled path did not engage'
    # force the host loop on the same imputations
    system._compiled_propagation = lambda *a, **k: None
    mu_h, var_h = system.predict(xt)
    np.testing.assert_allclose(np.asarray(mu_c[0]), np.asarray(mu_h[0]),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(var_c[0]), np.asarray(var_h[0]),
                               rtol=1e-4, atol=1e-8)

    # full_layer variant
    del system.__dict__['_compiled_propagation']
    mu_cf, var_cf = system.predict(xt, full_layer=True)
    system._compiled_propagation = lambda *a, **k: None
    mu_hf, var_hf = system.predict(xt, full_layer=True)
    for lc, lh in zip(mu_cf, mu_hf):
        for ac, ah in zip(lc, lh):
            np.testing.assert_allclose(np.asarray(ac), np.asarray(ah),
                                       rtol=1e-5, atol=1e-8)
