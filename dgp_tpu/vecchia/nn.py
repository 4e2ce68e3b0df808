"""Nearest-neighbour search for the Vecchia approximation.

Exact search is tiled device-side top-k over full distance rows; approximate
search (``method='approx'``; the reference's FAISS-HNSW role,
`dgpsi/vecchia.py:28-35, 72-107`) is an IVF-style scheme built from
TPU-friendly primitives: a k-means coarse quantizer (batched
distance matmuls), inverted bucket lists, and cluster-restricted exact
top-k over the P nearest buckets per query.

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


def nn(x, m, method='exact', size=40, efSearch=100, n_jobs=-1, cache=None):
    """Ordered nearest neighbours (reference vecchia.nn).  ``method`` in
    {'exact', 'approx'} ('hnsw'/'ivf' are accepted aliases for 'approx')."""
    x = np.asarray(x)
    n = x.shape[0]
    m = min(m, n - 1)
    if method in ('approx', 'hnsw', 'ivf') and n > 4 * _BLOCK:
        return _nn_approx(x, int(m), ordered=True, cache=cache)
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
    if method in ('approx', 'hnsw', 'ivf') and n > 4 * _BLOCK:
        return _pred_nn_approx(query, x, m)
    if len(query) * n >= NATIVE_NN_THRESHOLD ** 2:
        from .. import native
        out = native.pred_nn(query, x, m)
        if out is not None:
            return out
    return np.asarray(_pred_nn_impl(jnp.asarray(query), jnp.asarray(x), m))


# ----------------------------------------------------------------------
# approximate (IVF) search
# ----------------------------------------------------------------------
@partial(jax.jit, static_argnums=(1, 2))
def _kmeans_fit(x, K, iters, cent0=None):
    """Lloyd k-means on device: assignments via blocked distance matmuls,
    centroid updates via segment sums.  Returns (centroids, assign).
    ``cent0`` warm-starts the fit (e.g. from the previous NN refresh --
    the latent distribution drifts slowly, so a couple of refinement
    passes suffice instead of a cold fit)."""
    n = x.shape[0]
    if cent0 is None:
        cent0 = x[(jnp.arange(K) * (n // K)) % n]

    def assign_all(cent):
        # wide assignment blocks: the per-block work is one (B, K) distance
        # matmul + argmin, tiny at B=256 (a 1e6-point fit spent ~185 s on
        # map-iteration overhead); B=4096 keeps the matmul small (<= 32 MB
        # distance tile at K~2000) and cuts the block count 16x
        B = 16 * _BLOCK
        n_pad = ((n + B - 1) // B) * B
        xp = jnp.pad(x, ((0, n_pad - n), (0, 0)))

        def one_block(b):
            Q = jax.lax.dynamic_slice(xp, (b * B, 0), (B, x.shape[1]))
            return jnp.argmin(_sq_dists_block(Q, cent), axis=1)

        out = jax.lax.map(one_block, jnp.arange(n_pad // B))
        return out.reshape(n_pad)[:n]

    def step(cent, _):
        a = assign_all(cent)
        sums = jax.ops.segment_sum(x, a, num_segments=K)
        cnts = jax.ops.segment_sum(jnp.ones((n,), x.dtype), a, num_segments=K)
        new = jnp.where(cnts[:, None] > 0,
                        sums / jnp.maximum(cnts, 1.0)[:, None], cent)
        return new, None

    cent, _ = jax.lax.scan(step, cent0, None, length=iters)
    return cent, assign_all(cent)


def _buckets_np(assign, K, Lmax):
    """(K, Lmax) inverted lists (-1 padded); overflow beyond Lmax dropped."""
    n = assign.shape[0]
    order = np.argsort(assign, kind='stable')
    a_sorted = assign[order]
    start = np.searchsorted(a_sorted, np.arange(K))
    pos = np.arange(n) - start[a_sorted]
    keep = pos < Lmax
    buckets = np.full((K, Lmax), -1, np.int32)
    buckets[a_sorted[keep], pos[keep]] = order[keep]
    return buckets


def _buckets_dev(assign, K, Lmax):
    """Device version of _buckets_np (jit-traceable): inverted lists via a
    stable argsort + scatter; rows past a bucket's Lmax capacity drop out
    through scatter mode='drop'."""
    n = assign.shape[0]
    order = jnp.argsort(assign, stable=True)
    a_sorted = assign[order]
    start = jnp.searchsorted(a_sorted, jnp.arange(K))
    pos = jnp.arange(n) - start[a_sorted]
    return (jnp.full((K, Lmax), -1, jnp.int32)
            .at[a_sorted, pos].set(order.astype(jnp.int32), mode='drop'))


def _ivf_params(n):
    """Static (K, Lmax) for an n-point IVF index.  Lmax caps inverted-list
    length at 2x the average bucket size: candidate gather + ranking cost is
    proportional to P*Lmax, and on measured uniform/latent inputs the cap
    costs <1% recall while halving the dominant gather traffic (overflow
    beyond the cap is dropped, exactly like the reference's HNSW ef bound)."""
    K = int(np.ceil(2.0 * np.sqrt(n)))
    Lmax = int(np.ceil(2.0 * n / K))
    return K, Lmax


@partial(jax.jit, static_argnums=(4, 5))
def _ivf_query_self_both(q, x, cent, buckets, m, P, q0=0):
    """Fused self-query: ordered (predecessors-only) AND unconstrained
    top-(m+1) in one pass.  The candidate gather and distance matrix -- the
    dominant cost -- are computed once and reused for both maskings.
    ``q`` is a (contiguous) slice of ``x`` starting at global row ``q0``,
    so very large refreshes can dispatch bounded query chunks (the same
    runtime-envelope concern as _QUERY_CHUNK)."""
    nq, d = q.shape
    big = jnp.asarray(jnp.finfo(x.dtype).max / 8, x.dtype)
    n_pad = ((nq + _BLOCK - 1) // _BLOCK) * _BLOCK
    xp = jnp.pad(q, ((0, n_pad - nq), (0, 0)))

    def one_block(b):
        Q = jax.lax.dynamic_slice(xp, (b * _BLOCK, 0), (_BLOCK, d))
        q_idx = q0 + b * _BLOCK + jnp.arange(_BLOCK)
        d2c = _sq_dists_block(Q, cent)
        _, cl = jax.lax.top_k(-d2c, P)
        cand = jnp.concatenate(
            [buckets[cl].reshape(_BLOCK, -1), q_idx[:, None]], axis=1)
        ok = cand >= 0
        safe = jnp.where(ok, cand, 0)
        # self appears both in its bucket copy and as the appended column;
        # knock out the bucket copy so neither masking double-counts it
        dup = cand == q_idx[:, None]
        dup = dup.at[:, -1].set(False)
        base_ok = ok & ~dup

        res = _topk_candidates_multi(
            Q, x, safe, [base_ok & (cand <= q_idx[:, None]), base_ok],
            m + 1, big)
        ordered, unconstrained = [
            jnp.where(-nd < big / 2, idx, -1) for nd, idx in res]
        return ordered, unconstrained

    o, u = jax.lax.map(one_block, jnp.arange(n_pad // _BLOCK))
    return (o.reshape(n_pad, m + 1)[:nq], u.reshape(n_pad, m + 1)[:nq])


def nn_approx_dev(x, m, impute=False):
    """Jit-traceable ordered approximate NN: device IVF build + query for
    points already in Vecchia order.  Returns the reference NN layout
    (descending index order, -1 padded), plus -- when ``impute`` -- the
    unconstrained m-NN per point used for imputation pointers.  Same
    structure as the host `_nn_approx`/`_pred_nn_approx` pair but with no
    host transfers, so it can run inside the device NN-refresh program."""
    n = x.shape[0]
    K, Lmax = _ivf_params(n)
    cent, assign = _kmeans_fit(x, K, 6)
    buckets = _buckets_dev(assign, K, Lmax)
    if not impute:
        out = _ivf_query(x, x, cent, buckets, int(m) + 1, 16, True)
        return jnp.flip(jnp.sort(out, axis=1), axis=1), None
    out, imp = _ivf_query_self_both(x, x, cent, buckets, int(m), 16)
    ordered = jnp.flip(jnp.sort(out, axis=1), axis=1)
    # imp is the unconstrained top-(m+1) in ascending distance; column 0 is
    # self.  Slice to (n, m-1) to match the host path (get_pred_nn(.., m)[:,1:])
    # and the exact device path (_pred_nn_impl(.., m)[:, 1:]) -- a different
    # width would recompile every chunk program at the first device refresh
    # and condition on one extra neighbour.
    return ordered, jnp.where(imp >= 0, imp, 0)[:, 1:int(m)]


def nn_approx_dev_chunked(x, m, impute=False, chunk=None):
    """Device IVF build + self-query dispatched in bounded query chunks:
    the arrays never leave the device (x may be a sharded latent view), but
    no single program exceeds the runtime envelope that one monolithic
    query over a >200k-point gather source can breach (see _QUERY_CHUNK).
    Drop-in for nn_approx_dev at any n; used by the engine's NN refresh
    above models/compiled.DEVICE_REFRESH_MAX_FUSED_N points."""
    n = x.shape[0]
    chunk = chunk or _QUERY_CHUNK
    K, Lmax = _ivf_params(n)
    cent, assign = _kmeans_fit(x, K, 6)
    buckets = _buckets_dev(assign, K, Lmax)
    outs, imps = [], []
    for s in range(0, n, chunk):
        qc = x[s:s + chunk]
        if impute:
            o, im = _ivf_query_self_both(qc, x, cent, buckets, int(m), 16, s)
            imps.append(im)
        else:
            o = _ivf_query(qc, x, cent, buckets, int(m) + 1, 16, True, s)
        outs.append(o)
    ordered = jnp.concatenate(outs, axis=0)
    ordered = jnp.flip(jnp.sort(ordered, axis=1), axis=1)
    if not impute:
        return ordered, None
    imp = jnp.concatenate(imps, axis=0)
    return ordered, jnp.where(imp >= 0, imp, 0)[:, 1:int(m)]



def _topk_candidates_multi(Q, x, safe, masks, k, big, seg=4096):
    """Top-k nearest candidates by squared distance under one or more
    validity masks, segmented so no single gather or lax.top_k exceeds
    `seg` lanes: at n=1e6 the flat candidate list is P*Lmax = 16k wide, and
    one monolithic gather + top_k at that width crashes the TPU runtime
    (worker kernel fault).  Per segment: ONE gather + distance matrix,
    shared across all masks, then a local top-k per mask; finally a top-k
    over each mask's concatenated local winners.  Returns a list of
    (neg_dist, idx) pairs, one per mask."""
    C = safe.shape[1]
    parts = [([], []) for _ in masks]
    for s0 in range(0, C, seg):
        c = safe[:, s0:s0 + seg]
        Xc = x[c]
        d2b = jnp.sum((Xc - Q[:, None, :]) ** 2, axis=-1)
        for j, mask in enumerate(masks):
            d2 = jnp.where(mask[:, s0:s0 + seg], d2b, big)
            nd, sel = jax.lax.top_k(-d2, min(k, c.shape[1]))
            parts[j][0].append(nd)
            parts[j][1].append(jnp.take_along_axis(c, sel, axis=1))
    out = []
    for ds, cs in parts:
        nd = jnp.concatenate(ds, axis=1)
        ci = jnp.concatenate(cs, axis=1)
        nd2, sel2 = jax.lax.top_k(nd, min(k, nd.shape[1]))
        out.append((nd2, jnp.take_along_axis(ci, sel2, axis=1)))
    return out


def _topk_candidates(Q, x, safe, ok, k, big, seg=4096):
    """Single-mask convenience wrapper over _topk_candidates_multi."""
    return _topk_candidates_multi(Q, x, safe, [ok], k, big, seg)[0]


@partial(jax.jit, static_argnums=(4, 5, 6))
def _ivf_query(q, x, cent, buckets, m, P, ordered, q0=0):
    """Cluster-restricted exact top-k: candidates = the P nearest buckets
    (plus the query itself when ordered).  `q0` is the global row index of
    q's first row (host-chunked calls).  Returns (idx (nq, m), valid)."""
    nq, d = q.shape
    big = jnp.asarray(jnp.finfo(x.dtype).max / 8, x.dtype)
    n_pad = ((nq + _BLOCK - 1) // _BLOCK) * _BLOCK
    qp = jnp.pad(q, ((0, n_pad - nq), (0, 0)))

    def one_block(b):
        Q = jax.lax.dynamic_slice(qp, (b * _BLOCK, 0), (_BLOCK, d))
        q_idx = q0 + b * _BLOCK + jnp.arange(_BLOCK)
        d2c = _sq_dists_block(Q, cent)                     # (B, K)
        _, cl = jax.lax.top_k(-d2c, P)                     # (B, P)
        cand = buckets[cl].reshape(_BLOCK, -1)             # (B, P*Lmax)
        ok = cand >= 0
        if ordered:
            # strict predecessors from the buckets; self appended explicitly
            # (its bucket copy is excluded so no slot is wasted on a dup)
            ok &= cand < q_idx[:, None]
            cand = jnp.concatenate([cand, q_idx[:, None]], axis=1)
            ok = jnp.concatenate([ok, jnp.ones((_BLOCK, 1), bool)], axis=1)
        safe = jnp.where(ok, cand, 0)
        neg_d, idx = _topk_candidates(Q, x, safe, ok, m, big)
        valid = -neg_d < big / 2
        return jnp.where(valid, idx, -1)

    out = jax.lax.map(one_block, jnp.arange(n_pad // _BLOCK))
    return out.reshape(n_pad, m)[:nq]


def _ivf_build(x, n, cache=None):
    """Build the IVF index; ``cache`` (a mutable dict, e.g. stored on the
    model node across NN refreshes) warm-starts k-means from the previous
    centroids, cutting the dominant large-n fit cost roughly in half."""
    K, Lmax = _ivf_params(n)
    cent0 = None if cache is None else cache.get('cent')
    if cent0 is not None and cent0.shape == (K, x.shape[1]):
        cent, assign = _kmeans_fit(jnp.asarray(x), K, 2, cent0)
    else:
        cent, assign = _kmeans_fit(jnp.asarray(x), K, 6)
    if cache is not None:
        cache['cent'] = np.asarray(cent)  # np: keeps model pickling clean
    buckets = _buckets_np(np.asarray(assign), K, Lmax)
    return cent, jnp.asarray(buckets)


#: host-side query-chunk size for the IVF search.  One long-running query
#: program over a very large gather source (measured: 600k queries against a
#: 1e6-point index, ~2300 fused blocks in one dispatch) can crash the TPU
#: runtime worker; dispatching the same blocks as ~128k-query chunks is
#: equally fast (per-dispatch overhead is amortised over 512 blocks) and
#: keeps every program comfortably inside the runtime's envelope.
_QUERY_CHUNK = 131072


def _query_chunks(q0, q, x, cent, buckets, m, P, ordered):
    """Host-chunked _ivf_query: global row offset q0 keeps the ordered
    (predecessors-only) masking correct across chunks."""
    outs = []
    for s0 in range(0, q.shape[0], _QUERY_CHUNK):
        qc = q[s0:s0 + _QUERY_CHUNK]
        outs.append(np.asarray(_ivf_query(
            qc, x, cent, buckets, m, P, ordered, q0 + s0)))
    return np.concatenate(outs, axis=0)


def _nn_approx(x, m, ordered=True, P=16, cache=None):
    n = x.shape[0]
    cent, buckets = _ivf_build(x, n, cache)
    out = _query_chunks(0, jnp.asarray(x), jnp.asarray(x), cent, buckets,
                        m + 1, P, True)
    # descending index order with -1s at the tail (reference layout)
    return np.flip(np.sort(out, axis=1), axis=1)


def _pred_nn_approx(query, x, m, P=16):
    n = x.shape[0]
    cent, buckets = _ivf_build(x, n)
    out = _query_chunks(0, jnp.asarray(query), jnp.asarray(x), cent,
                        buckets, m, P, False)
    # nearest-first layout; repair any -1 (insufficient candidates) to 0
    return np.where(out >= 0, out, 0)
