"""Golden tests for the likelihood-link moment formulas.

Covers the links that had no dedicated coverage: Categorical binary
probit/logit, multi-class robustmax/softmax, and ZIP/ZINB.  Two layers of
verification per link:

  * parity: prediction/pllik/llik/sampling must reproduce the reference
    implementations (likelihood_class.py:294-815) on identical inputs
    (seeded rng makes the MC-based multi-class predictions bit-identical);
  * ground truth: the closed-form / approximate moments must agree with
    brute-force Monte-Carlo moments of y with f ~ N(m, v) -- this checks
    the formulas themselves (e.g. the Owen's-T probit second moment), not
    just that both sides share them.
"""
import os
import sys

import numpy as np
import pytest
from scipy.special import expit
from scipy.stats import norm

from dgp_tpu.likelihoods import ZIP, ZINB, Categorical

REF = "/root/reference"
_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)


@pytest.fixture(scope="module")
def ref_lik():
    if not os.path.isdir(os.path.join(REF, "dgpsi")):
        pytest.skip("reference library not mounted")
    sys.path.insert(0, os.path.join(_ROOT, "tools", "refshim"))
    sys.path.insert(0, REF)
    from dgpsi import likelihood_class
    yield likelihood_class
    sys.path.remove(os.path.join(_ROOT, "tools", "refshim"))
    sys.path.remove(REF)


def _mv(seed, n, k, m_scale=1.5, v_max=1.5):
    rs = np.random.RandomState(seed)
    return (m_scale * rs.randn(n, k), v_max * rs.rand(n, k) + 0.01)


# ----------------------------------------------------------------------
# parity vs the reference implementations on identical inputs
# ----------------------------------------------------------------------
def test_binary_probit_parity(ref_lik):
    m, v = _mv(0, 40, 1)
    ours = Categorical(num_classes=2, link='probit')
    ours.num_classes = 2
    ref = ref_lik.Categorical(num_classes=2, link='probit')
    om, ov = ours.prediction(m, v)
    rm, rv = ref.prediction(m, v)
    np.testing.assert_allclose(om, rm, rtol=1e-10)
    np.testing.assert_allclose(ov, rv, rtol=1e-6, atol=1e-12)
    y = (np.random.RandomState(1).rand(40, 1) < 0.5).astype(float)
    f = m.copy()
    np.testing.assert_allclose(ours.pllik(y, f), ref.pllik(y, f), rtol=1e-12)
    np.testing.assert_allclose(ours.sampling(f), ref.sampling(f), rtol=1e-12)


def test_binary_logit_parity(ref_lik):
    m, v = _mv(2, 40, 1)
    ours = Categorical(num_classes=2, link='logit')
    ref = ref_lik.Categorical(num_classes=2, link='logit')
    om, ov = ours.prediction(m, v)
    rm, rv = ref.prediction(m, v)
    np.testing.assert_allclose(om, rm, rtol=1e-12)
    np.testing.assert_allclose(ov, rv, rtol=1e-12)


@pytest.mark.parametrize("link", ["robustmax", "softmax"])
def test_multiclass_parity(ref_lik, link):
    """The MC-based multi-class predictions share the reference's exact
    chunking and antithetic structure, so a shared seed makes them
    bit-identical."""
    K = 4
    m, v = _mv(3, 30, K)
    ours = Categorical(num_classes=K, link=link)
    ref = ref_lik.Categorical(num_classes=K, link=link)
    np.random.seed(42)
    om, ov = ours.prediction(m, v)
    np.random.seed(42)
    rm, rv = ref.prediction(m, v)
    np.testing.assert_allclose(om, rm, rtol=1e-12)
    np.testing.assert_allclose(ov, rv, rtol=1e-12)
    y = np.random.RandomState(5).randint(0, K, size=(30, 1))
    f = m[:, None, :] + 0 * m[:, None, :]
    np.testing.assert_allclose(ours.pllik(y, f), ref.pllik(y, f), rtol=1e-12)
    np.testing.assert_allclose(ours.sampling(m), ref.sampling(m), rtol=1e-12)


@pytest.mark.parametrize("cls", ["ZIP", "ZINB"])
def test_zi_parity(ref_lik, cls):
    k = 2 if cls == "ZIP" else 3
    m, v = _mv(7, 40, k, m_scale=0.8, v_max=0.8)
    ours, ref = {"ZIP": ZIP, "ZINB": ZINB}[cls](), getattr(ref_lik, cls)()
    om, ov = ours.prediction(m, v)
    rm, rv = ref.prediction(m, v)
    np.testing.assert_allclose(om, rm, rtol=1e-12)
    np.testing.assert_allclose(ov, rv, rtol=1e-12)
    y = np.random.RandomState(8).poisson(
        2.0, size=(40, 1)).astype(float)[:, None, :]
    f3 = np.random.RandomState(9).randn(40, 6, k) * 0.5
    np.testing.assert_allclose(ours.pllik(y, f3), ref.pllik(y, f3),
                               rtol=1e-10)


# ----------------------------------------------------------------------
# ground truth: formulas vs brute-force Monte-Carlo moments
# ----------------------------------------------------------------------
def test_binary_probit_moments_vs_mc():
    """E[Phi(f)] = Phi(m/sqrt(1+v)) and the Owen's-T second moment
    E[Phi(f)^2] = Phi(t) - 2*T(t, 1/sqrt(1+2v)) must match MC."""
    m = np.array([[-1.2], [0.0], [0.7], [2.0]])
    v = np.array([[0.3], [1.1], [0.6], [2.0]])
    lik = Categorical(num_classes=2, link='probit')
    y_mean, y_var = lik.prediction(m, v)
    rs = np.random.RandomState(0)
    S = 400_000
    f = m.flatten()[:, None] + np.sqrt(v.flatten())[:, None] * rs.randn(4, S)
    p = norm.cdf(f)
    np.testing.assert_allclose(y_mean.flatten(), p.mean(1), atol=4e-3)
    np.testing.assert_allclose(y_var.flatten(), p.var(1), atol=4e-3)


def test_binary_logit_mean_vs_mc():
    """The probit-style approximation of the logit-normal mean is accurate
    to ~1e-2 absolute over moderate (m, v)."""
    m = np.array([[-1.5], [0.0], [0.8], [1.8]])
    v = np.array([[0.4], [1.0], [0.7], [1.5]])
    lik = Categorical(num_classes=2, link='logit')
    y_mean, y_var = lik.prediction(m, v)
    rs = np.random.RandomState(1)
    S = 400_000
    f = m.flatten()[:, None] + np.sqrt(v.flatten())[:, None] * rs.randn(4, S)
    p = expit(f)
    np.testing.assert_allclose(y_mean.flatten(), p.mean(1), atol=2e-2)
    # the clipped delta-style variance is an approximation; same order as MC
    assert np.all(y_var.flatten() <= p.mean(1) * (1 - p.mean(1)) + 1e-12)


def test_robustmax_prediction_vs_independent_mc():
    """The internal S=1000 win-probability estimate must agree with an
    independent, larger MC estimate of P(argmax_k f = k)."""
    K = 3
    m = np.array([[1.0, 0.0, -0.5], [0.0, 0.0, 0.0], [-1.0, 2.0, 0.0]])
    v = 0.5 * np.ones((3, K))
    lik = Categorical(num_classes=K, link='robustmax', robustmax_eps=1e-3)
    np.random.seed(11)
    y_mean, y_var = lik.prediction(m, v)
    # rows are exact probability vectors: b*K + (a-b) = 1
    np.testing.assert_allclose(y_mean.sum(axis=1), 1.0, rtol=1e-12)
    rs = np.random.RandomState(12)
    S = 200_000
    f = m[:, None, :] + np.sqrt(v)[:, None, :] * rs.randn(3, S, K)
    q = np.zeros((3, K))
    ks = np.argmax(f, axis=2)
    np.add.at(q, (np.arange(3)[:, None], ks), 1.0)
    q /= S
    eps = 1e-3
    ref_mean = eps / (K - 1) + (1 - eps - eps / (K - 1)) * q
    np.testing.assert_allclose(y_mean, ref_mean, atol=0.06)


def test_robustmax_llik_and_sampling():
    K, eps = 4, 1e-3
    lik = Categorical(num_classes=K, link='robustmax', robustmax_eps=eps)
    f = np.array([[3.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 5.0]])
    y_right = np.array([[0.0], [3.0]])
    y_wrong = np.array([[1.0], [0.0]])
    ll_r = lik._llik_np(f, y_right)
    ll_w = lik._llik_np(f, y_wrong)
    np.testing.assert_allclose(ll_r, 2 * np.log(1 - eps), rtol=1e-12)
    np.testing.assert_allclose(ll_w, 2 * np.log(eps / (K - 1)), rtol=1e-12)
    s = lik.sampling(f)
    assert s.shape == f.shape
    np.testing.assert_allclose(s.sum(axis=1), 1.0 + eps / (K - 1) * 0
                               + (1 - eps) + eps - 1.0, rtol=1e-9)
    assert (s.max(axis=1) == 1 - eps).all()


@pytest.mark.parametrize("cls,k", [("ZIP", 2), ("ZINB", 3)])
def test_zi_moments_vs_mc(cls, k):
    """ZIP/ZINB predictive moments vs brute-force latent MC: the mean uses
    the exact lognormal/probit-logit factors (tight tolerance); the
    variance decomposition carries delta-method approximations for the
    zero-inflation factor (order-of-magnitude tolerance)."""
    lik = {"ZIP": ZIP, "ZINB": ZINB}[cls]()
    rs = np.random.RandomState(13)
    n = 5
    m = 0.6 * rs.randn(n, k)
    v = 0.5 * rs.rand(n, k) + 0.05
    y_mean, y_var = lik.prediction(m, v)
    S = 200_000
    f = m[:, None, :] + np.sqrt(v)[:, None, :] * rs.randn(n, S, k)
    if cls == "ZIP":
        lam = np.exp(f[:, :, 0])
        pi = expit(f[:, :, 1])
        cm = (1 - pi) * lam                       # E[y | f]
        cv = (1 - pi) * lam * (1 + pi * lam)      # Var[y | f]
    else:
        mu = np.exp(f[:, :, 0])
        nn = np.exp(-f[:, :, 1])
        pi = expit(f[:, :, 2])
        cm = (1 - pi) * mu
        nb_var = mu + mu * mu / nn
        cv = (1 - pi) * nb_var + pi * (1 - pi) * mu * mu
    mc_mean = cm.mean(1)
    mc_var = cv.mean(1) + cm.var(1)
    np.testing.assert_allclose(y_mean, mc_mean, rtol=0.05)
    np.testing.assert_allclose(y_var, mc_var, rtol=0.30)


# ----------------------------------------------------------------------
# end-to-end: binary classification DGP with each link
# ----------------------------------------------------------------------
@pytest.mark.parametrize("link", ["probit", "logit"])
def test_binary_dgp_end_to_end(link):
    from dgp_tpu import dgp, kernel, combine, emulator, nb_seed

    nb_seed(3)
    rs = np.random.RandomState(3)
    n = 80
    X = np.sort(rs.rand(n, 1), axis=0)
    f = 2.5 * np.sin(6.0 * X)
    y = (rs.rand(n, 1) < norm.cdf(f)).astype(int)
    lay1 = [kernel(length=np.array([0.3]), name='matern2.5',
                   scale_est=True)]
    m = dgp(X, y, combine(lay1, [Categorical(num_classes=2, link=link)]))
    m.train(N=30, disable=True)
    emu = emulator(m.estimate(), N=5)
    z = np.linspace(0.02, 0.98, 60)[:, None]
    prob = np.asarray(emu.predict(z)[0]).reshape(-1)
    assert prob.shape == (60,)
    assert np.all((prob >= 0) & (prob <= 1))
    truth = (norm.cdf(2.5 * np.sin(6.0 * z.flatten())) > 0.5).astype(int)
    acc = np.mean((prob > 0.5).astype(int) == truth)
    assert acc >= 0.8, acc
