"""Core GP-node math: marginal (negative) log-likelihood with profiled scale,
replicate handling, hyper-priors, predictions, and linked-GP predictions.

Parity targets (math re-derived, gradients via autodiff instead of the
reference's hand-written derivative stacks):
  - `dgpsi/kernel_class.py:403-449`  (llik: profiled scale + replicates)
  - `dgpsi/kernel_class.py:481-509`  (log_likelihood_func, the ESS target)
  - `dgpsi/kernel_class.py:367-401`  (ga / inv_ga / ref priors)
  - `dgpsi/functions.py:326-430`     (gp / link_gp predictions)
  - `dgpsi/gp.py:326-371`            (closed-form LOO)

All functions are pure and jit/vmap-friendly.  Static structure (kernel name,
which terms exist) is passed via Python-level kwargs so XLA specialises per
node configuration.
"""
from functools import partial

import jax
import jax.numpy as jnp

from .ops import kernels, linalg, moments


# ----------------------------------------------------------------------
# priors
# ----------------------------------------------------------------------
def log_prior(length, nugget, *, prior_name, prior_coef, nugget_est, cl=None):
    """Log prior on lengthscales (and nugget when estimated).

    ``prior_coef`` holds the *adjusted* coefficients: for 'ga' the first
    entry is shape-1, for 'inv_ga' shape+1 (reference kernel_class.py:93-104).
    For 'ref', prior_coef = (a, b) with b computed at init.
    """
    if prior_name is None:
        return 0.0
    if prior_name == "ref":
        a, b = prior_coef[0], prior_coef[1]
        t = jnp.sum(cl / length) + nugget
        return a * jnp.log(t) - b * t
    c0, c1 = prior_coef[0], prior_coef[1]
    if prior_name == "ga":
        lp = jnp.sum(c0 * jnp.log(length) - c1 * length)
        if nugget_est:
            lp += c0 * jnp.log(nugget) - c1 * nugget
    elif prior_name == "inv_ga":
        lp = jnp.sum(-c0 * jnp.log(length) - c1 / length)
        if nugget_est:
            lp += -c0 * jnp.log(nugget) - c1 / nugget
    else:
        raise ValueError(f"unknown prior: {prior_name}")
    return lp


def compute_cl(X, n_out, n_length, vecch):
    """Characteristic length for the 'ref' prior (kernel_class.py:207-225)."""
    if n_length == 1:
        if vecch:
            rng = jnp.max(X, axis=0) - jnp.min(X, axis=0)
            return jnp.atleast_1d(jnp.sqrt(jnp.dot(rng, rng)) / n_out)
        d2 = kernels._sq_dists(X)
        return jnp.atleast_1d(jnp.sqrt(jnp.max(d2)) / n_out)
    rng = jnp.max(X, axis=0) - jnp.min(X, axis=0)
    return rng / n_out ** (1.0 / n_length)


# ----------------------------------------------------------------------
# negative log-likelihood (M-step objective)
# ----------------------------------------------------------------------
def neg_log_lik(log_theta, X, y, *, name, n_length, scale_est, nugget_est,
                fixed_scale, fixed_nugget, prior_name, prior_coef,
                w_diag=None, sum_residual=None, n_orig=None, cl=None):
    """Profiled negative log-likelihood of one GP node.

    Args:
        log_theta: (p [+1],) log lengthscales (+ log nugget if estimated).
        X: (n, d) node input (already concatenated with global input).
        y: (n,) node output (replicate-collapsed for final-layer nodes).
        w_diag: (n,) replicate weights 1/counts, or None.
        sum_residual: scalar within-replicate residual sum, or None.
        n_orig: original (expanded) data count when replicates exist.
        cl: characteristic lengths for the 'ref' prior.

    Returns:
        (nll, scale): scalar objective and the (profiled or fixed) scale.
    """
    if nugget_est:
        length = jnp.exp(log_theta[:-1])
        nugget = jnp.exp(log_theta[-1])
    else:
        length = jnp.exp(log_theta)
        nugget = fixed_nugget
    n = y.shape[0]
    K = kernels.k_matrix(X, length, nugget, name, w_diag)
    L = linalg.safe_cholesky(K)
    logdet = linalg.sum64(2.0 * jnp.log(jnp.abs(jnp.diagonal(L))))
    Kinv_y = linalg.cho_solve(L, y[:, None])[:, 0]
    yKy = linalg.sum64(y * Kinv_y)
    nugget = jnp.asarray(nugget, jnp.float64)
    has_rep = w_diag is not None
    N = n_orig if has_rep else n

    if scale_est:
        if has_rep:
            scale = (yKy + sum_residual / nugget) / N
        else:
            scale = yKy / n
        nll = 0.5 * (logdet + N * jnp.log(scale))
        if has_rep and nugget_est:
            nll += 0.5 * (N - n) * jnp.log(nugget)
    else:
        scale = fixed_scale
        nll = 0.5 * (logdet + yKy / scale)
        if has_rep and nugget_est:
            nll += 0.5 * (sum_residual / (scale * nugget) + (N - n) * jnp.log(nugget))

    nll -= log_prior(length, nugget, prior_name=prior_name, prior_coef=prior_coef,
                     nugget_est=nugget_est, cl=cl)
    return nll, scale


def neg_log_lik_and_grad(log_theta, X, y, **kw):
    (nll, scale), g = jax.value_and_grad(
        lambda lt: neg_log_lik(lt, X, y, **kw), has_aux=True
    )(log_theta)
    return nll, g, scale


# ----------------------------------------------------------------------
# marginal log-likelihood (ESS acceptance target)
# ----------------------------------------------------------------------
def log_lik_fixed(X, y, length, scale, nugget, *, name, w_diag=None,
                  ref_prior_coef=None, n_length=None, vecch=False):
    """Gaussian marginal log-lik at fixed hyper-parameters
    (kernel_class.log_likelihood_func; includes the 'ref' prior term with a
    freshly computed cl, as the reference does at kernel_class.py:489-491)."""
    n = y.shape[0]
    K = scale * kernels.k_matrix(X, length, nugget, name, w_diag)
    L = linalg.safe_cholesky(K)
    logdet = linalg.sum64(2.0 * jnp.log(jnp.abs(jnp.diagonal(L))))
    ll = -0.5 * (logdet + linalg.sum64(y * linalg.cho_solve(L, y[:, None])[:, 0]))
    if ref_prior_coef is not None:
        cl = compute_cl(X, n, n_length, vecch)
        ll += log_prior(length, nugget, prior_name="ref",
                        prior_coef=ref_prior_coef, nugget_est=False, cl=cl)
    return ll


# ----------------------------------------------------------------------
# predictions
# ----------------------------------------------------------------------
def compute_stats(X, y, length, nugget, *, name, w_diag=None):
    """Cache Rinv and Rinv_y for dense predictions (kernel_class.py:735-751)."""
    K = kernels.k_matrix(X, length, nugget, name, w_diag)
    L = linalg.safe_cholesky(K)
    n = X.shape[0]
    Rinv = linalg.cho_solve(L, jnp.eye(n, dtype=K.dtype))
    Rinv_y = linalg.cho_solve(L, y[:, None])[:, 0]
    return Rinv, Rinv_y


def gp_predict(x, X, Rinv, Rinv_y, scale, length, nugget, *, name):
    """Dense GP prediction at deterministic inputs x (M, d) -> (mean, var)."""
    r = kernels.k_cross(X, x, length, name)  # (n, M)
    mean = r.T @ Rinv_y
    rRr = jnp.sum(r * (Rinv @ r), axis=0)
    var = jnp.abs(scale * (1.0 + nugget - rRr))
    return mean, var


def _link_one(z_m, z_v, z_det, X, Zglobal, Rinv, Rinv_y, scale, nugget,
              length_w, length_z, name):
    I, J = moments.IJ(X, z_m, z_v, length_w, name)
    if z_det is not None:
        Iz = kernels.k_vec(Zglobal, z_det, length_z, name)
        I = I * Iz
        J = J * jnp.outer(Iz, Iz)
    tr = linalg.trace_prod(Rinv, J)
    mu = jnp.dot(I, Rinv_y)
    var = jnp.abs(linalg.quad_form(J, Rinv_y) - mu**2 + scale * (1.0 + nugget - tr))
    return mu, var


def linkgp_predict(m, v, z, X, Zglobal, Rinv, Rinv_y, scale, length, nugget,
                   *, name):
    """Linked-GP prediction: Gaussian inputs (m, v) (M, Dw), optional
    deterministic global input z (M, Dz).  Returns (mean, var), each (M,).

    The lengthscale vector is broadcast to the full input dimension and split
    between the stochastic (first Dw) and deterministic (last Dz) blocks,
    exactly as functions.link_gp does.
    """
    Dw = X.shape[1]
    Dz = 0 if z is None else z.shape[1]
    full_len = jnp.broadcast_to(length, (Dw + Dz,))
    length_w, length_z = full_len[:Dw], full_len[Dw:]

    if z is None:
        fn = lambda zm, zv: _link_one(zm, zv, None, X, None, Rinv, Rinv_y,
                                      scale, nugget, length_w, None, name)
        return jax.vmap(fn)(m, v)
    fn = lambda zm, zv, zd: _link_one(zm, zv, zd, X, Zglobal, Rinv, Rinv_y,
                                      scale, nugget, length_w, length_z, name)
    return jax.vmap(fn)(m, v, z)


def loo(y, Rinv, Rinv_y, scale):
    """Closed-form leave-one-out mean/variance (gp.py:354-360)."""
    sigma2 = 1.0 / jnp.diagonal(Rinv)
    mu = y - Rinv_y * sigma2
    return mu, scale * sigma2
