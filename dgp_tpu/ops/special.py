"""Special functions needed by the likelihood layer.

Owen's T function is required for the probit-link categorical moments
(reference `dgpsi/likelihood_class.py:396-404` uses scipy.special.owens_t).
JAX has no owens_t, so it is evaluated here with fixed Gauss-Legendre
quadrature of the defining integral

    T(h, a) = 1/(2*pi) * int_0^a exp(-h^2 (1 + x^2) / 2) / (1 + x^2) dx,

which is smooth on the domain used by the library (0 < a <= 1).
"""
import numpy as np
import jax.numpy as jnp

_GL_NODES, _GL_WEIGHTS = np.polynomial.legendre.leggauss(48)
# map from [-1, 1] to [0, 1]
_GL_T = (_GL_NODES + 1.0) / 2.0
_GL_W = _GL_WEIGHTS / 2.0


def owens_t(h, a):
    """Owen's T function, elementwise with broadcasting."""
    h = jnp.asarray(h)
    a = jnp.asarray(a)
    t = jnp.asarray(_GL_T, dtype=jnp.result_type(h, a))
    w = jnp.asarray(_GL_W, dtype=jnp.result_type(h, a))
    x = a[..., None] * t  # (..., q)
    integrand = jnp.exp(-0.5 * h[..., None] ** 2 * (1.0 + x * x)) / (1.0 + x * x)
    return a * jnp.sum(w * integrand, axis=-1) / (2.0 * jnp.pi)
