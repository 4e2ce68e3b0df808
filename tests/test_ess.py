"""Distributional correctness of the elliptical slice sampler.

With prior f ~ N(0, S) and likelihood y | f ~ N(f, s2 I), the posterior is
Gaussian in closed form; a chain of ESS transitions must reproduce its
moments.  Run for both the sequential sampler (spec=1) and the speculative
batched sampler (spec=4) -- the latter's bracket-replay logic must leave the
stationary distribution untouched -- and for an angle-based evaluator.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgp_tpu.ess import ess_update


def _setup():
    rs = np.random.RandomState(0)
    n = 12
    X = np.linspace(0, 1, n)[:, None]
    S = np.exp(-((X - X.T) / 0.3) ** 2) + 1e-8 * np.eye(n)
    s2 = 0.05
    f_true = np.linalg.cholesky(S) @ rs.normal(size=n)
    y = f_true + np.sqrt(s2) * rs.normal(size=n)
    P = np.linalg.inv(np.linalg.inv(S) + np.eye(n) / s2)
    mu = P @ (y / s2)
    return S, s2, y, mu, P


def _run_chain(S, s2, y, spec, log_lik_angles=False, n_iter=6000):
    n = len(y)
    L = jnp.asarray(np.linalg.cholesky(S))
    y_j = jnp.asarray(y)

    def log_lik(f):
        return -0.5 * jnp.sum((y_j - f) ** 2) / s2

    def step(carry, key):
        f = carry
        k_nu, k_ess = jax.random.split(key)
        nu = L @ jax.random.normal(k_nu, (n,))
        kw = {}
        if log_lik_angles:
            # linear-in-(f, nu) evaluator exercising the angles interface
            def ll_ang(cosv, sinv):
                fps = cosv[:, None] * f[None] + sinv[:, None] * nu[None]
                return jax.vmap(log_lik)(fps)
            kw['log_lik_angles'] = ll_ang
        f = ess_update(k_ess, f, nu, log_lik, spec=spec, **kw)
        return f, f

    keys = jax.random.split(jax.random.PRNGKey(42), n_iter)
    _, chain = jax.jit(lambda f0, ks: jax.lax.scan(step, f0, ks))(
        jnp.zeros(n), keys)
    return np.asarray(chain[n_iter // 4:])


@pytest.mark.parametrize("spec,angles", [(1, False), (4, False), (4, True)])
def test_ess_posterior_moments(spec, angles):
    S, s2, y, mu, P = _setup()
    draws = _run_chain(S, s2, y, spec, log_lik_angles=angles)
    se = np.sqrt(np.diag(P) / draws.shape[0] * 20)  # autocorr-inflated
    assert np.all(np.abs(draws.mean(0) - mu) < 5 * se + 0.03), (
        np.abs(draws.mean(0) - mu).max())
    np.testing.assert_allclose(draws.var(0), np.diag(P), rtol=0.5, atol=0.02)
