"""Stationary correlation kernels (squared-exponential and separable
Matern-2.5) as batched JAX ops.

Parity targets (math only, re-derived):
  - reference `dgpsi/kernel_class.py:304` (k_matrix) and
    `dgpsi/vecchia.py:244-321` (K_vec_nb / K_cross_nb / K_matrix_nb).

Conventions (identical to the reference):
  - `sexp`:      k(x, y) = exp(-sum_d ((x_d - y_d) / l_d)^2)        (no 1/2!)
  - `matern2.5`: k(x, y) = prod_d (1 + sqrt5 a_d + (5/3) a_d^2) * exp(-sqrt5 * sum_d a_d)
                 with a_d = |x_d - y_d| / l_d
  - diagonal of a training matrix is 1 + nugget (optionally scaled by
    per-point replicate weights ``w_diag``).

Gradients w.r.t. ``length`` flow through these ops via autodiff; the
reference's hand-written derivative stacks (fod_exp, pdist_matern_*,
dK_matrix_nb) are intentionally not reproduced.
"""
import jax.numpy as jnp

SQRT5 = 2.23606797749978969


def _sq_dists(X, Z=None):
    """Pairwise squared euclidean distances, (..., n, m).

    Computed from explicit differences rather than the Gram-matrix identity:
    GP correlation matrices need the small distances between near-coincident
    points to full float32 precision, which the matmul form loses to
    catastrophic cancellation (and, on TPU, to bf16 MXU passes).  XLA fuses
    the d-reduction, so no (n, m, d) tensor is materialised."""
    if Z is None:
        Z = X
    diff = X[..., :, None, :] - Z[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def k_cross(X, Z, length, name):
    """Cross-correlation matrix between two point sets.

    Args:
        X: (..., n, d) points.
        Z: (..., m, d) points.
        length: (p,) lengthscales with p == 1 or p == d.
        name: 'sexp' or 'matern2.5'.

    Returns:
        (..., n, m) correlation matrix.
    """
    Xl, Zl = X / length, Z / length
    if name == "sexp":
        return jnp.exp(-_sq_dists(Xl, Zl))
    elif name == "matern2.5":
        a = jnp.abs(Xl[..., :, None, :] - Zl[..., None, :, :])
        coef = jnp.prod(1.0 + SQRT5 * a + (5.0 / 3.0) * a * a, axis=-1)
        return coef * jnp.exp(-SQRT5 * jnp.sum(a, axis=-1))
    raise ValueError(f"unknown kernel name: {name}")


def set_diag(K, diag):
    """Replace the diagonal of (..., n, n) K with ``diag`` (scalar or (..., n))."""
    n = K.shape[-1]
    eye = jnp.eye(n, dtype=K.dtype)
    diag = jnp.broadcast_to(jnp.asarray(diag, K.dtype), K.shape[:-1])
    return K * (1.0 - eye) + diag[..., None] * eye


def k_matrix(X, length, nugget, name, w_diag=None):
    """Training correlation matrix with nugget on the diagonal.

    Args:
        X: (..., n, d) training inputs.
        length: (p,) lengthscales.
        nugget: scalar nugget.
        name: 'sexp' or 'matern2.5'.
        w_diag: optional (n,) per-point nugget scaling (replicate
            weights 1/counts, reference kernel_class.py:352-355).

    Returns:
        (..., n, n) matrix with diag = 1 + nugget * w_diag.
    """
    K = k_cross(X, X, length, name)
    diag = 1.0 + nugget * (w_diag if w_diag is not None else 1.0)
    return set_diag(K, diag)


def k_vec(X, z, length, name):
    """Correlation vector between training points X (n, d) and one point z (d,).

    Mirrors reference `vecchia.K_vec_nb`.
    """
    return k_cross(X, z[None, :], length, name)[..., 0]
