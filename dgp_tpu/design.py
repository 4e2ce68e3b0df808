"""Sequential-design criteria helpers (ALM / MICE / VIGF support ops).

Parity: `dgpsi/functions.py:244-256` (mice_var); criterion assembly lives in
the gp / emulator classes as in the reference.
"""
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .ops import kernels as kops
from .ops import linalg


@lru_cache(maxsize=None)
def _make_mice_var(name):
    def f(x, length, nugget, scale):
        K = kops.k_matrix(x, length, nugget, name)
        L = linalg.safe_cholesky(K)
        Rinv = linalg.cho_solve(L, jnp.eye(x.shape[0], dtype=x.dtype))
        return scale / jnp.diagonal(Rinv)

    return jax.jit(f)


def mice_var(x, x_extra, input_dim, connect, name, length, scale, nugget, nugget_s):
    """Smoothed predictive variance over a candidate design set."""
    kernel_input = x[:, input_dim]
    if connect is not None:
        kernel_input = np.concatenate((kernel_input, x_extra[:, connect]), axis=1)
    kernel_nugget = max(nugget_s, float(np.atleast_1d(nugget)[0]))
    f = _make_mice_var(name)
    sigma2 = f(jnp.asarray(kernel_input), jnp.asarray(length),
               jnp.asarray(kernel_nugget), jnp.asarray(float(np.atleast_1d(scale)[0])))
    return np.asarray(sigma2).reshape(-1, 1)
