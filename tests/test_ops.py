"""Golden-value tests for the numerical ops.

Expected values are re-derived independently in NumPy at float64 straight
from the kernel/moment definitions (not imported from any library).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgp_tpu.ops import kernels, linalg, moments, special, lbfgs

SQRT5 = np.sqrt(5.0)


def np_sexp(x, y, length):
    return np.exp(-np.sum(((x - y) / length) ** 2))


def np_matern25(x, y, length):
    a = np.abs(x - y) / length
    return np.prod((1 + SQRT5 * a + 5.0 / 3.0 * a**2)) * np.exp(-SQRT5 * np.sum(a))


@pytest.mark.parametrize("name", ["sexp", "matern2.5"])
def test_k_matrix_golden(name):
    rng = np.random.default_rng(0)
    X = rng.normal(size=(7, 3))
    length = np.array([0.7, 1.3, 2.1])
    nugget = 1e-4
    fn = np_sexp if name == "sexp" else np_matern25
    expected = np.empty((7, 7))
    for i in range(7):
        for j in range(7):
            expected[i, j] = fn(X[i], X[j], length)
    np.fill_diagonal(expected, 1 + nugget)
    got = np.asarray(kernels.k_matrix(jnp.asarray(X), jnp.asarray(length), nugget, name))
    np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("name", ["sexp", "matern2.5"])
def test_k_cross_and_vec(name):
    rng = np.random.default_rng(1)
    X = rng.normal(size=(5, 2))
    Z = rng.normal(size=(4, 2))
    length = np.array([0.9])
    fn = np_sexp if name == "sexp" else np_matern25
    expected = np.array([[fn(x, z, length) for z in Z] for x in X])
    got = np.asarray(kernels.k_cross(jnp.asarray(X), jnp.asarray(Z), jnp.asarray(length), name))
    np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-12)
    got_vec = np.asarray(kernels.k_vec(jnp.asarray(X), jnp.asarray(Z[0]), jnp.asarray(length), name))
    np.testing.assert_allclose(got_vec, expected[:, 0], rtol=1e-12, atol=1e-12)


def test_k_matrix_w_diag():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(5, 2))
    w = rng.uniform(0.2, 1.0, size=5)
    K = np.asarray(kernels.k_matrix(jnp.asarray(X), jnp.array([1.0]), 1e-2, "sexp", jnp.asarray(w)))
    np.testing.assert_allclose(np.diag(K), 1 + 1e-2 * w, rtol=1e-12)


def test_safe_cholesky_recovers_near_singular():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(20, 1))
    X[10:] = X[:10]  # exact duplicates -> singular correlation matrix
    K = np.asarray(kernels.k_matrix(jnp.asarray(X), jnp.array([1.0]), 0.0, "sexp"))
    L = np.asarray(linalg.safe_cholesky(jnp.asarray(K)))
    assert np.all(np.isfinite(L))
    np.testing.assert_allclose(L @ L.T, K, atol=1e-4)


def test_cho_solve_and_logdet():
    rng = np.random.default_rng(4)
    A = rng.normal(size=(6, 6))
    A = A @ A.T + 6 * np.eye(6)
    b = rng.normal(size=(6, 2))
    L = np.linalg.cholesky(A)
    got = np.asarray(linalg.cho_solve(jnp.asarray(L), jnp.asarray(b)))
    np.testing.assert_allclose(got, np.linalg.solve(A, b), rtol=1e-10)
    np.testing.assert_allclose(
        float(linalg.logdet_from_chol(jnp.asarray(L))), np.linalg.slogdet(A)[1], rtol=1e-12
    )


def test_owens_t_against_quadrature():
    from scipy.special import owens_t as sp_owens_t

    h = np.linspace(-4, 4, 23)
    a = np.linspace(0.05, 1.0, 23)
    got = np.asarray(special.owens_t(jnp.asarray(h), jnp.asarray(a)))
    expected = sp_owens_t(h, a)
    np.testing.assert_allclose(got, expected, atol=1e-12)


@pytest.mark.parametrize("name", ["sexp", "matern2.5"])
def test_IJ_moments_match_monte_carlo(name):
    """I = E[k(w, X_i)], J = E[k(w, X_i) k(w, X_j)] under w ~ N(z_m, diag(z_v)),
    validated with Gauss-Hermite quadrature per dimension."""
    rng = np.random.default_rng(5)
    n, d = 4, 2
    X = rng.normal(size=(n, d))
    z_m = rng.normal(size=d)
    z_v = np.array([0.3, 0.8])
    length = np.array([0.9, 1.4])

    nodes, weights = np.polynomial.hermite_e.hermegauss(80)
    k1 = np_sexp if name == "sexp" else np_matern25

    def one_dim_k(w, x, l):
        if name == "sexp":
            return np.exp(-(((w - x) / l) ** 2))
        a = np.abs(w - x) / l
        return (1 + SQRT5 * a + 5.0 / 3.0 * a**2) * np.exp(-SQRT5 * a)

    I_exp = np.ones(n)
    J_exp = np.ones((n, n))
    for k in range(d):
        w = z_m[k] + np.sqrt(z_v[k]) * nodes
        ws = weights / np.sqrt(2 * np.pi)
        kw = np.array([one_dim_k(w, X[i, k], length[k]) for i in range(n)])  # (n, q)
        I_exp *= kw @ ws
        J_exp *= np.einsum("iq,jq,q->ij", kw, kw, ws)

    I_got, J_got = moments.IJ(jnp.asarray(X), jnp.asarray(z_m), jnp.asarray(z_v),
                              jnp.asarray(length), name)
    # quadrature (not the closed form) limits accuracy for the |.|-kinked Matern
    tol = 1e-6 if name == "sexp" else 2e-5
    np.testing.assert_allclose(np.asarray(I_got), I_exp, rtol=tol, atol=1e-9)
    np.testing.assert_allclose(np.asarray(J_got), J_exp, rtol=tol, atol=1e-9)


@pytest.mark.parametrize("name", ["sexp", "matern2.5"])
def test_IJ_zero_variance_reduces_to_kernel(name):
    rng = np.random.default_rng(6)
    X = rng.normal(size=(5, 2))
    z_m = rng.normal(size=2)
    z_v = np.zeros(2)
    length = np.array([1.1, 0.8])
    I, J = moments.IJ(jnp.asarray(X), jnp.asarray(z_m), jnp.asarray(z_v),
                      jnp.asarray(length), name)
    kv = np.asarray(kernels.k_vec(jnp.asarray(X), jnp.asarray(z_m), jnp.asarray(length), name))
    np.testing.assert_allclose(np.asarray(I), kv, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(J), np.outer(kv, kv), rtol=1e-10)


def test_lbfgs_rosenbrock_bounded():
    def fg(x):
        f = (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2
        g = jnp.array([
            -2 * (1 - x[0]) - 400 * x[0] * (x[1] - x[0] ** 2),
            200 * (x[1] - x[0] ** 2),
        ])
        return f, g

    x0 = jnp.array([-1.2, 1.0])
    x, f, _ = jax.jit(lambda x0: lbfgs.minimize(fg, x0, maxiter=200, maxfun=200))(x0)
    np.testing.assert_allclose(np.asarray(x), [1.0, 1.0], atol=1e-3)

    # box-constrained: optimum on the boundary
    lb = jnp.array([-2.0, -2.0])
    ub = jnp.array([0.5, 2.0])
    x, f, _ = jax.jit(lambda x0: lbfgs.minimize(fg, x0, lb, ub, maxiter=200, maxfun=200))(x0)
    assert x[0] <= 0.5 + 1e-12
    # compare against scipy L-BFGS-B on the same box
    from scipy.optimize import minimize as sp_min

    ref = sp_min(lambda z: np.asarray(fg(jnp.asarray(z))[0]), np.array([-1.2, 1.0]),
                 jac=lambda z: np.asarray(fg(jnp.asarray(z))[1]),
                 method="L-BFGS-B", bounds=[(-2, 0.5), (-2, 2)])
    assert float(f) <= ref.fun * 1.05 + 1e-8


def test_lbfgs_quadratic_exact():
    A = jnp.asarray(np.diag([1.0, 10.0, 100.0]))
    b = jnp.asarray(np.array([1.0, -2.0, 3.0]))

    def fg(x):
        return 0.5 * x @ A @ x - b @ x, A @ x - b

    x, f, _ = lbfgs.minimize(fg, jnp.zeros(3), maxiter=100, maxfun=100)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(np.asarray(A), np.asarray(b)), atol=1e-5)


def test_blocking_fetch_installed():
    """importing dgp_tpu must patch jax.Array._value to wait for readiness
    before the host copy (hostio.install_blocking_fetch): a d2h requested
    while its producer is in flight takes minutes over the device tunnel."""
    import dgp_tpu  # noqa: F401  (import side effect installs the patch)
    from jax._src import array as jarray
    prop = jarray.ArrayImpl.__dict__['_value']
    assert prop.fget.__name__ == '_dgp_tpu_blocking_value'
    # the patched property still round-trips values correctly
    z = jnp.arange(5.0)
    np.testing.assert_allclose(np.asarray(z), np.arange(5.0))
