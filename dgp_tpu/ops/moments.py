"""Closed-form linked-GP moments.

For a GP with training inputs X and a Gaussian test input w ~ N(z_m, diag(z_v)),
these ops compute, per kernel dimension and in product across dimensions,

    I_i     = E_w[ k(w, X_i) ]                       (n,)
    J_ij    = E_w[ k(w, X_i) k(w, X_j) ]             (n, n)

for the sexp and separable Matern-2.5 kernels.  These are the moments that
drive linked(D)GP mean/variance propagation.

Parity targets (math only): reference `dgpsi/functions.py:432-494`
(IJ_sexp / IJ_matern) and `dgpsi/vecchia.py:838-988` (IJ_nb, Jd, Jd0).

All functions take a single test point's (z_m, z_v); callers vmap over test
points.  Dimensions with z_v == 0 (deterministic input, used by
linkgp_prediction_full) fall back to plain kernel evaluations.
"""
import jax.numpy as jnp
from jax.scipy.special import erf

SQRT5 = 2.23606797749978969
_HALF_LOG2PI = 0.9189385332046727


def i_sexp(X, z_m, z_v, length):
    l2 = length**2
    c = jnp.prod(1.0 / jnp.sqrt(1.0 + 2.0 * z_v / l2))
    expo = jnp.sum((X - z_m) ** 2 / (2.0 * z_v + l2), axis=-1)
    return c * jnp.exp(-expo)


def j_sexp(X, z_m, z_v, length):
    l2 = length**2
    c = jnp.prod(1.0 / jnp.sqrt(1.0 + 4.0 * z_v / l2))
    Xz = X - z_m  # (n, d)
    plus = Xz[:, None, :] + Xz[None, :, :]
    minus = Xz[:, None, :] - Xz[None, :, :]
    expo = jnp.sum(
        plus**2 / (2.0 * l2 + 8.0 * z_v) + minus**2 / (2.0 * l2), axis=-1
    )
    return c * jnp.exp(-expo)


def _i_matern_1d(zX, z_v, length):
    """E_w[k_1d(w, x)] per dimension for w ~ N(0 offset zX = z_m - x, z_v)."""
    vs = jnp.where(z_v > 0.0, z_v, 1.0)
    muA = zX - SQRT5 * vs / length
    muB = zX + SQRT5 * vs / length
    l2 = length**2
    sq = jnp.sqrt(0.5 * vs / jnp.pi) / length
    partA = jnp.exp((5.0 * vs - 2.0 * SQRT5 * length * zX) / (2.0 * l2)) * (
        (1.0 + SQRT5 * muA / length + 5.0 * (muA**2 + vs) / (3.0 * l2))
        * 0.5
        * (1.0 + erf(muA / jnp.sqrt(2.0 * vs)))
        + (SQRT5 + 5.0 * muA / (3.0 * length)) * sq * jnp.exp(-0.5 * muA**2 / vs)
    )
    partB = jnp.exp((5.0 * vs + 2.0 * SQRT5 * length * zX) / (2.0 * l2)) * (
        (1.0 - SQRT5 * muB / length + 5.0 * (muB**2 + vs) / (3.0 * l2))
        * 0.5
        * (1.0 + erf(-muB / jnp.sqrt(2.0 * vs)))
        + (SQRT5 - 5.0 * muB / (3.0 * length)) * sq * jnp.exp(-0.5 * muB**2 / vs)
    )
    stochastic = partA + partB
    a = jnp.abs(zX) / length
    deterministic = (1.0 + SQRT5 * a + (5.0 / 3.0) * a**2) * jnp.exp(-SQRT5 * a)
    return jnp.where(z_v > 0.0, stochastic, deterministic)


def i_matern(X, z_m, z_v, length):
    zX = z_m - X  # (n, d)
    return jnp.prod(_i_matern_1d(zX, z_v, length), axis=-1)


def _jd_matern_1d(X1, X2, z_m, z_v, length):
    """E_w[k_1d(w, X1) k_1d(w, X2)], w ~ N(z_m, z_v), separable Matern-2.5.

    Closed form with three pieces (w < x1, x1 < w < x2, w > x2); polynomial
    coefficients follow the reference's Jd (vecchia.py:915-959), re-derived
    elementwise for broadcasting.
    """
    x1 = jnp.minimum(X1, X2)
    x2 = jnp.maximum(X1, X2)
    l, v = length, z_v
    l2, l3, l4 = l**2, l**3, l**4
    sqv = jnp.sqrt(0.5 * v / jnp.pi)
    inv9l4 = 1.0 / (9.0 * l4)

    # piece 1: w < x1 (both kernels on the same side)
    E30 = 1.0 + (
        25.0 * x1**2 * x2**2
        - 3.0 * SQRT5 * (3.0 * l3 + 5.0 * l * x1 * x2) * (x1 + x2)
        + 15.0 * l2 * (x1**2 + x2**2 + 3.0 * x1 * x2)
    ) * inv9l4
    E31 = (
        18.0 * SQRT5 * l3
        + 15.0 * SQRT5 * l * (x1**2 + x2**2)
        - (75.0 * l2 + 50.0 * x1 * x2) * (x1 + x2)
        + 60.0 * SQRT5 * l * x1 * x2
    ) * inv9l4
    E32 = 5.0 * (
        5.0 * x1**2 + 5.0 * x2**2 + 15.0 * l2 - 9.0 * SQRT5 * l * (x1 + x2) + 20.0 * x1 * x2
    ) * inv9l4
    E33 = 10.0 * (3.0 * SQRT5 * l - 5.0 * x1 - 5.0 * x2) * inv9l4
    E34 = 25.0 * inv9l4
    muC = z_m - 2.0 * SQRT5 * v / l
    E3A31 = (
        E30
        + muC * E31
        + (muC**2 + v) * E32
        + (muC**3 + 3.0 * v * muC) * E33
        + (muC**4 + 6.0 * v * muC**2 + 3.0 * v**2) * E34
    )
    E3A32 = (
        E31
        + (muC + x2) * E32
        + (muC**2 + 2.0 * v + x2**2 + muC * x2) * E33
        + (muC**3 + x2**3 + x2 * muC**2 + muC * x2**2 + 3.0 * v * x2 + 5.0 * v * muC) * E34
    )
    P1 = jnp.exp((10.0 * v + SQRT5 * l * (x1 + x2 - 2.0 * z_m)) / l2) * (
        0.5 * E3A31 * (1.0 + erf((muC - x2) / jnp.sqrt(2.0 * v)))
        + E3A32 * sqv * jnp.exp(-0.5 * (x2 - muC) ** 2 / v)
    )

    # piece 2: x1 < w < x2
    E40 = 1.0 + (
        25.0 * x1**2 * x2**2
        + 3.0 * SQRT5 * (3.0 * l3 - 5.0 * l * x1 * x2) * (x2 - x1)
        + 15.0 * l2 * (x1**2 + x2**2 - 3.0 * x1 * x2)
    ) * inv9l4
    E41 = 5.0 * (
        3.0 * SQRT5 * l * (x2**2 - x1**2) + 3.0 * l2 * (x1 + x2) - 10.0 * x1 * x2 * (x1 + x2)
    ) * inv9l4
    E42 = 5.0 * (
        5.0 * x1**2 + 5.0 * x2**2 - 3.0 * l2 - 3.0 * SQRT5 * l * (x2 - x1) + 20.0 * x1 * x2
    ) * inv9l4
    E43 = -50.0 * (x1 + x2) * inv9l4
    E44 = 25.0 * inv9l4
    E4A41 = (
        E40
        + z_m * E41
        + (z_m**2 + v) * E42
        + (z_m**3 + 3.0 * v * z_m) * E43
        + (z_m**4 + 6.0 * v * z_m**2 + 3.0 * v**2) * E44
    )
    E4A42 = (
        E41
        + (z_m + x1) * E42
        + (z_m**2 + 2.0 * v + x1**2 + z_m * x1) * E43
        + (z_m**3 + x1**3 + x1 * z_m**2 + z_m * x1**2 + 3.0 * v * x1 + 5.0 * v * z_m) * E44
    )
    E4A43 = (
        E41
        + (z_m + x2) * E42
        + (z_m**2 + 2.0 * v + x2**2 + z_m * x2) * E43
        + (z_m**3 + x2**3 + x2 * z_m**2 + z_m * x2**2 + 3.0 * v * x2 + 5.0 * v * z_m) * E44
    )
    P2 = jnp.exp(-SQRT5 * (x2 - x1) / l) * (
        0.5 * E4A41 * (erf((x2 - z_m) / jnp.sqrt(2.0 * v)) - erf((x1 - z_m) / jnp.sqrt(2.0 * v)))
        + E4A42 * sqv * jnp.exp(-0.5 * (x1 - z_m) ** 2 / v)
        - E4A43 * sqv * jnp.exp(-0.5 * (x2 - z_m) ** 2 / v)
    )

    # piece 3: w > x2
    E50 = 1.0 + (
        25.0 * x1**2 * x2**2
        + 3.0 * SQRT5 * (3.0 * l3 + 5.0 * l * x1 * x2) * (x1 + x2)
        + 15.0 * l2 * (x1**2 + x2**2 + 3.0 * x1 * x2)
    ) * inv9l4
    E51 = (
        18.0 * SQRT5 * l3
        + 15.0 * SQRT5 * l * (x1**2 + x2**2)
        + (75.0 * l2 + 50.0 * x1 * x2) * (x1 + x2)
        + 60.0 * SQRT5 * l * x1 * x2
    ) * inv9l4
    E52 = 5.0 * (
        5.0 * x1**2 + 5.0 * x2**2 + 15.0 * l2 + 9.0 * SQRT5 * l * (x1 + x2) + 20.0 * x1 * x2
    ) * inv9l4
    E53 = 10.0 * (3.0 * SQRT5 * l + 5.0 * x1 + 5.0 * x2) * inv9l4
    E54 = 25.0 * inv9l4
    muD = z_m + 2.0 * SQRT5 * v / l
    E5A51 = (
        E50
        - muD * E51
        + (muD**2 + v) * E52
        - (muD**3 + 3.0 * v * muD) * E53
        + (muD**4 + 6.0 * v * muD**2 + 3.0 * v**2) * E54
    )
    E5A52 = (
        E51
        - (muD + x1) * E52
        + (muD**2 + 2.0 * v + x1**2 + muD * x1) * E53
        - (muD**3 + x1**3 + x1 * muD**2 + muD * x1**2 + 3.0 * v * x1 + 5.0 * v * muD) * E54
    )
    P3 = jnp.exp((10.0 * v - SQRT5 * l * (x1 + x2 - 2.0 * z_m)) / l2) * (
        0.5 * E5A51 * (1.0 + erf((x1 - muD) / jnp.sqrt(2.0 * v)))
        + E5A52 * sqv * jnp.exp(-0.5 * (x1 - muD) ** 2 / v)
    )

    return P1 + P2 + P3


def j_matern(X, z_m, z_v, length):
    """(n, n) second moment matrix for the separable Matern-2.5 kernel."""
    n, d = X.shape
    vs = jnp.where(z_v > 0.0, z_v, 1.0)
    Xi = X[:, None, :]  # (n, 1, d)
    Xj = X[None, :, :]  # (1, n, d)
    jd = _jd_matern_1d(Xi, Xj, z_m, vs, length)  # (n, n, d)
    # deterministic dims: product of the two I factors
    ifac = _i_matern_1d(z_m - X, z_v, length)  # (n, d), already handles v==0
    det = ifac[:, None, :] * ifac[None, :, :]
    per_dim = jnp.where(z_v > 0.0, jd, det)
    return jnp.prod(per_dim, axis=-1)


def IJ(X, z_m, z_v, length, name):
    """Compute (I, J) for one Gaussian test input.

    Args:
        X: (n, d) training inputs.
        z_m: (d,) test mean. z_v: (d,) test variance.
        length: (d,) lengthscales (already broadcast to full dim).
        name: 'sexp' or 'matern2.5'.
    """
    if name == "sexp":
        return i_sexp(X, z_m, z_v, length), j_sexp(X, z_m, z_v, length)
    elif name == "matern2.5":
        return i_matern(X, z_m, z_v, length), j_matern(X, z_m, z_v, length)
    raise ValueError(f"unknown kernel name: {name}")
