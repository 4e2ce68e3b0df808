"""Thin batched linear-algebra wrappers with a jitter-retry policy.

Replaces the reference's LAPACK calls plus its `pinvh` fallback
(`dgpsi/kernel_class.py:745-751`): inside jit we cannot branch to a
pseudo-inverse, so instead the Cholesky is retried with growing diagonal
jitter until it is finite (`config.CHOLESKY_JITTERS`).
"""
import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from .. import config


def cholesky(A):
    """Plain lower Cholesky (batched)."""
    return jnp.linalg.cholesky(A)


def safe_cholesky(A):
    """Lower Cholesky with adaptive diagonal jitter.

    Tries jitters from ``config.CHOLESKY_JITTERS`` (scaled by mean(diag))
    until the factor is finite.  Works on batched inputs (..., n, n); the
    jitter escalation is per-call, not per-batch-element.

    Reverse-mode differentiable: the jitter level is selected on a
    stop-gradient copy (the selection loop carries no cotangents), then a
    single differentiable Cholesky runs at the selected jitter.
    """
    n = A.shape[-1]
    scale = jnp.mean(jnp.diagonal(A, axis1=-2, axis2=-1), axis=-1)[..., None, None]
    eye = jnp.eye(n, dtype=A.dtype)

    A0 = jax.lax.stop_gradient(A)
    scale0 = jax.lax.stop_gradient(scale)
    jitters = jnp.asarray(config.CHOLESKY_JITTERS, dtype=A.dtype)

    def attempt(i):
        return jnp.linalg.cholesky(A0 + jitters[i] * scale0 * eye)

    def cond(carry):
        i, L = carry
        return jnp.logical_and(~jnp.all(jnp.isfinite(L)), i < len(config.CHOLESKY_JITTERS) - 1)

    def body(carry):
        i, _ = carry
        return i + 1, attempt(i + 1)

    i_sel, _ = jax.lax.while_loop(cond, body, (0, attempt(0)))
    return jnp.linalg.cholesky(A + jitters[i_sel] * scale * eye)


def cho_solve(L, B):
    """Solve A x = B given lower Cholesky factor L (batched)."""
    y = solve_triangular(L, B, lower=True)
    return solve_triangular(L, y, lower=True, trans=1)


def logdet_from_chol(L):
    """log|A| from its lower Cholesky factor (batched -> (...,))."""
    return 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(L, axis1=-2, axis2=-1))), axis=-1)


def tri_solve(L, B, lower=True, trans=0):
    return solve_triangular(L, B, lower=lower, trans=trans)


def quad_form(A, b):
    """b^T A b for (..., n, n) A and (..., n) b."""
    return jnp.einsum("...i,...ij,...j->...", b, A, b)


def trace_prod(A, B):
    """tr(A @ B) without forming the product."""
    return jnp.sum(A * jnp.swapaxes(B, -1, -2), axis=(-2, -1))


def chol_small(A):
    """Cholesky for small trailing dims, unrolled over columns and
    vectorised over the batch.

    XLA's batched Cholesky/solve lowerings are latency-bound for tiny
    (m <= ~64) systems on TPU; m unrolled steps of (batch,)-wide VPU ops are
    1-2 orders of magnitude faster for the (n, m, m) Vecchia block shapes.
    Differentiable through autodiff (plain elementwise ops)."""
    m = A.shape[-1]
    L = jnp.zeros_like(A)
    for j in range(m):
        s = A[..., j, j] - jnp.sum(L[..., j, :j] ** 2, -1)
        d = jnp.sqrt(s)
        L = L.at[..., j, j].set(d)
        if j + 1 < m:
            off = (A[..., j + 1:, j]
                   - jnp.einsum("...ik,...k->...i", L[..., j + 1:, :j], L[..., j, :j])
                   ) / d[..., None]
            L = L.at[..., j + 1:, j].set(off)
    return L


def fwd_solve_small(L, b):
    """Solve L x = b for small lower-triangular L, unrolled substitution
    vectorised over the batch.  L: (..., m, m), b: (..., m) -> (..., m).

    Relies on x[j] == 0 for not-yet-computed entries, so each step is one
    full-row dot (strictly-upper entries of L are never read)."""
    m = L.shape[-1]
    x = jnp.zeros_like(b)
    for i in range(m):
        xi = (b[..., i] - jnp.einsum("...k,...k->...", L[..., i, :i], x[..., :i])) \
            / L[..., i, i]
        x = x.at[..., i].set(xi)
    return x


def bwd_solve_small(L, b):
    """Solve L^T x = b for small lower-triangular L, unrolled."""
    m = L.shape[-1]
    x = jnp.zeros_like(b)
    for i in range(m - 1, -1, -1):
        xi = (b[..., i] - jnp.einsum("...k,...k->...", L[..., i + 1:, i], x[..., i + 1:])) \
            / L[..., i, i]
        x = x.at[..., i].set(xi)
    return x


def sum64(x, axis=None):
    """Sum with float64 accumulation.

    Log-likelihoods grow like O(n); in float32 their accumulation noise
    (~|llik| * eps) can exceed the log-uniform ESS acceptance margin and
    stall the bracket-shrinking loop.  Summing the (float32-computed)
    per-point contributions in float64 removes the accumulation error at
    negligible cost.  No-op upcast for float64 inputs."""
    return jnp.sum(x.astype(jnp.float64), axis=axis)


def mvn_sample(key, L, mean=None):
    """Sample from N(mean, L L^T) given a lower Cholesky factor (batched)."""
    sn = jax.random.normal(key, L.shape[:-1], dtype=L.dtype)
    samp = jnp.einsum("...ij,...j->...i", L, sn)
    if mean is not None:
        samp = samp + mean
    return samp
