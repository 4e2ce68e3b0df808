"""End-to-end tests for the single-GP emulator on the step-function demo
configuration (BASELINE.json config 1)."""
import numpy as np
import pytest

from dgp_tpu.models.node import kernel
from dgp_tpu.models.gp import gp


def step_fct(x):
    return np.where(x > 0.5, 1.0, 0.0)


def make_data(n=16, seed=0):
    rng = np.random.default_rng(seed)
    X = np.linspace(0, 1, n).reshape(-1, 1)
    Y = step_fct(X)
    return X, Y


@pytest.mark.parametrize("name", ["sexp", "matern2.5"])
def test_gp_train_predict_interpolates(name):
    X = np.linspace(0, 1, 16).reshape(-1, 1)
    Y = np.sin(2 * np.pi * X)
    m = gp(X, Y, kernel(length=np.array([1.0]), name=name, nugget=1e-6,
                        scale_est=True))
    m.train()
    mu, var = m.predict(X)
    # near-interpolation at training points
    np.testing.assert_allclose(mu, Y, atol=5e-2)
    assert np.all(var >= 0)
    # lengthscale actually moved from its initial value
    assert m.kernel.para_path.shape[0] == 2
    assert not np.allclose(m.kernel.para_path[0, 1], m.kernel.para_path[1, 1])


def test_gp_rmse_on_heldout():
    rng = np.random.default_rng(1)
    X = rng.uniform(size=(30, 1))
    Y = np.sin(4 * np.pi * X)
    m = gp(X, Y, kernel(length=np.array([0.5]), name="matern2.5", scale_est=True,
                        nugget_est=True, nugget=1e-4))
    m.train()
    xt = np.linspace(0.05, 0.95, 100).reshape(-1, 1)
    mu, _ = m.predict(xt)
    rmse = np.sqrt(np.mean((mu - np.sin(4 * np.pi * xt)) ** 2))
    assert rmse < 0.05, rmse


def test_gp_llik_grad_matches_finite_difference():
    X, Y = make_data(12)
    m = gp(X, Y, kernel(length=np.array([0.8]), scale_est=True, nugget_est=True,
                        nugget=1e-4))
    x0 = m.kernel.log_t()
    f0, g0 = m.kernel.llik(x0)
    eps = 1e-6
    for i in range(len(x0)):
        xp = x0.copy(); xp[i] += eps
        xm = x0.copy(); xm[i] -= eps
        fp, _ = m.kernel.llik(xp)
        fm, _ = m.kernel.llik(xm)
        fd = (fp[0] - fm[0]) / (2 * eps)
        np.testing.assert_allclose(g0[i], fd, rtol=2e-4, atol=1e-6)


def test_gp_replicates_collapse():
    rng = np.random.default_rng(2)
    Xu = np.linspace(0, 1, 8).reshape(-1, 1)
    X = np.repeat(Xu, 3, axis=0)
    Y = np.sin(2 * np.pi * X) + 0.05 * rng.normal(size=X.shape)
    m = gp(X, Y, kernel(length=np.array([0.5]), scale_est=True, nugget_est=True,
                        nugget=1e-2))
    assert m.indices is not None
    assert len(m.X) == 8
    assert m.kernel.W_diag is not None
    m.train()
    mu, var = m.predict(Xu)
    rmse = np.sqrt(np.mean((mu - np.sin(2 * np.pi * Xu)) ** 2))
    assert rmse < 0.2


def test_gp_loo_and_metrics():
    X, Y = make_data(16)
    m = gp(X, Y, kernel(length=np.array([1.0]), scale_est=True))
    m.train()
    mu, var = m.loo()
    assert mu.shape == Y.shape and np.all(var > 0)
    x_cand = np.linspace(0, 1, 20).reshape(-1, 1)
    idx, val = m.metric(x_cand, method='ALM')
    assert 0 <= idx[0] < 20
    scores = m.metric(x_cand, method='MICE', score_only=True)
    assert scores.shape == (20, 1)
    idx, val = m.metric(x_cand, method='VIGF')
    assert 0 <= idx[0] < 20


def test_gp_ppredict_matches_predict():
    X = np.linspace(0, 1, 16).reshape(-1, 1)
    Y = np.sin(2 * np.pi * X)
    m = gp(X, Y, kernel(length=np.array([1.0]), scale_est=True))
    m.train()
    xt = np.linspace(0, 1, 37).reshape(-1, 1)
    mu1, v1 = m.predict(xt)
    mu2, v2 = m.ppredict(xt, chunk_num=4)
    np.testing.assert_allclose(mu1, mu2, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(v1, v2, rtol=1e-6, atol=1e-8)


def test_gp_ref_prior_and_bounds():
    X, Y = make_data(16)
    m = gp(X, Y, kernel(length=np.array([1.0]), prior_name='ref',
                        scale_est=True, nugget_est=True, nugget=1e-3))
    m.train()
    assert np.all(np.isfinite(m.kernel.length))
    assert np.log(m.kernel.nugget[0]) >= np.log(1e-8) - 1e-9
