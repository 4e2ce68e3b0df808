"""Nearest-neighbour search for the Vecchia approximation, as tiled
device-side top-k (replaces the reference's FAISS / sklearn KD-trees,
`dgpsi/vecchia.py:20-109`).

Layout conventions match the reference:
  * `nn(x, m)`: for points already in Vecchia order, row i holds the indices
    {i and its m nearest predecessors} sorted in DESCENDING index order,
    padded with -1 (so reversing a row gives ascending order with the point
    itself last).
  * `get_pred_nn(query, x, m)`: unconstrained m nearest training points per
    query, nearest first.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

_BLOCK = 256


def _sq_dists_block(Q, X):
    qq = jnp.sum(Q * Q, axis=1)[:, None]
    xx = jnp.sum(X * X, axis=1)[None, :]
    return jnp.maximum(qq + xx - 2.0 * Q @ X.T, 0.0)


@partial(jax.jit, static_argnums=(1,))
def _nn_ordered_impl(x, m):
    n = x.shape[0]
    big = jnp.asarray(jnp.finfo(x.dtype).max / 8, x.dtype)
    n_pad = ((n + _BLOCK - 1) // _BLOCK) * _BLOCK
    xp = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    idx_all = jnp.arange(n)

    def one_block(b):
        q_idx = b * _BLOCK + jnp.arange(_BLOCK)
        Q = jax.lax.dynamic_slice(xp, (b * _BLOCK, 0), (_BLOCK, x.shape[1]))
        d2 = _sq_dists_block(Q, x)  # (_BLOCK, n)
        # mask successors (j > i) and out-of-range queries
        mask = idx_all[None, :] > q_idx[:, None]
        d2 = jnp.where(mask, big, d2)
        neg_d, nn_idx = jax.lax.top_k(-d2, m + 1)
        valid = -neg_d < big / 2
        return jnp.where(valid, nn_idx, -1)

    n_blocks = n_pad // _BLOCK
    out = jax.lax.map(one_block, jnp.arange(n_blocks))
    out = out.reshape(n_pad, m + 1)[:n]
    # descending index order with -1s at the tail
    return jnp.flip(jnp.sort(out, axis=1), axis=1)


#: point count above which the host-native O(n^2/2) OpenMP search is used
#: instead of materialising device distance tiles.
NATIVE_NN_THRESHOLD = 32768


def nn(x, m, method='exact', size=40, efSearch=100, n_jobs=-1):
    """Ordered nearest neighbours (reference vecchia.nn)."""
    x = np.asarray(x)
    n = x.shape[0]
    m = min(m, n - 1)
    if n >= NATIVE_NN_THRESHOLD:
        from .. import native
        out = native.nn_ordered(x, int(m))
        if out is not None:
            return out
    return np.asarray(_nn_ordered_impl(jnp.asarray(x), int(m)))


@partial(jax.jit, static_argnums=(2,))
def _pred_nn_impl(query, x, m):
    nq = query.shape[0]
    n_pad = ((nq + _BLOCK - 1) // _BLOCK) * _BLOCK
    qp = jnp.pad(query, ((0, n_pad - nq), (0, 0)))

    def one_block(b):
        Q = jax.lax.dynamic_slice(qp, (b * _BLOCK, 0), (_BLOCK, query.shape[1]))
        d2 = _sq_dists_block(Q, x)
        _, nn_idx = jax.lax.top_k(-d2, m)
        return nn_idx

    n_blocks = n_pad // _BLOCK
    out = jax.lax.map(one_block, jnp.arange(n_blocks))
    return out.reshape(n_pad, m)[:nq]


def get_pred_nn(query, x, m=50, method='exact', size=40, efSearch=100, n_jobs=-1):
    """Unconstrained NN of each query among x, nearest first
    (reference vecchia.get_pred_nn)."""
    query, x = np.asarray(query), np.asarray(x)
    n = x.shape[0]
    m = int(min(m, n))
    if len(query) * n >= NATIVE_NN_THRESHOLD ** 2:
        from .. import native
        out = native.pred_nn(query, x, m)
        if out is not None:
            return out
    return np.asarray(_pred_nn_impl(jnp.asarray(query), jnp.asarray(x), m))
