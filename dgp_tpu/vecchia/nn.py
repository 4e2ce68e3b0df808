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


def _host(a):
    """Device->host fetch that waits for readiness FIRST.  Over the axon
    tunnel a transfer requested while the producer is still executing can
    take minutes (measured 212 s vs 0.2 s on the same k-means fit); every
    host read of a freshly dispatched result must block first."""
    jax.block_until_ready(a)
    return np.asarray(a)


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
    return _host(_nn_ordered_impl(jnp.asarray(x), int(m)))


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
    return _host(_pred_nn_impl(jnp.asarray(query), jnp.asarray(x), m))


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


#: query-list capacity multiple of the average bucket size.  Queries beyond
#: a bucket's cap fall through to the per-query fallback pass (capacity
#: `_fallback_cap`), so -- unlike the candidate cap -- overflow here costs
#: extra work, never recall.
_LQ_MULT = 2.5


def _lq(n, K):
    return int(np.ceil(_LQ_MULT * n / K))


def _fallback_cap(n):
    """Static row capacity of the per-query fallback pass (bucket-overflow
    queries).  Generous vs the measured overflow mass of a Lloyd fit
    (zero at 2.5x average on uniform/latent data)."""
    r = max(_BLOCK, n // 64)
    return ((r + _BLOCK - 1) // _BLOCK) * _BLOCK


@partial(jax.jit, static_argnums=(6, 7, 8))
def _bucketed_self_impl(q, x, Bq, cl, Bc, gidx, m, ordered, impute):
    """Bucket-batched IVF self-query: one map step per BUCKET, whose members
    (rows of ``Bq``) share a single candidate set (the inverted lists of the
    bucket's ``P`` nearest buckets, rows of ``cl``).  The candidate gather is
    per-bucket instead of per-query -- ~200x less gather traffic than the
    per-query scheme at n=1e6 -- and the (Lq, C) distance matrix is one dense
    broadcast/matmul block, which is what the TPU wants.  Returns per-bucket
    result tensors (scatter back to rows via ``Bq``):
    (ordered_topk (K, Lq, m+1), unconstrained (K, Lq, m+1) | None)."""
    Lq = Bq.shape[1]
    big = jnp.asarray(jnp.finfo(x.dtype).max / 8, x.dtype)

    seg = 4096

    def one_bucket(args):
        qrows, clb = args                     # (Lq,), (P,)
        qs = jnp.where(qrows >= 0, qrows, 0)
        Q = q[qs]                             # (Lq, d)
        cnd = Bc[clb].reshape(-1)             # (C,)
        C = cnd.shape[0]
        ok_c = cnd >= 0
        Xc = x[jnp.where(ok_c, cnd, 0)]       # (C, d)
        row_ok = qrows >= 0
        gq = gidx[qs]
        # self appears both in its bucket copy and as an appended zero-
        # distance column; knock out the bucket copy
        dup = cnd[None, :] == gq[:, None]
        base = ok_c[None, :] & ~dup & row_ok[:, None]
        masks = []
        if ordered:
            masks.append(base & (cnd[None, :] <= gq[:, None]))
        if impute or not ordered:
            masks.append(base)
        # difference-form distances, segmented over the candidate axis: the
        # expanded |q|^2 + |c|^2 - 2qc form loses the low bits of SMALL
        # distances to f32 cancellation (neighbour spacings shrink as
        # 1/n while coordinates stay O(1)), which scrambles the near-
        # neighbour ranking exactly where it matters
        parts = [([], []) for _ in masks]
        for s0 in range(0, C, seg):
            Xs = jax.lax.dynamic_slice(Xc, (s0, 0), (min(seg, C - s0),
                                                     Xc.shape[1]))
            d2s = jnp.sum((Q[:, None, :] - Xs[None, :, :]) ** 2, axis=-1)
            cs = jax.lax.dynamic_slice(cnd, (s0,), (min(seg, C - s0),))
            for j, mk in enumerate(masks):
                mks = jax.lax.dynamic_slice(
                    mk, (0, s0), (Lq, min(seg, C - s0)))
                nd, sel = jax.lax.top_k(jnp.where(mks, -d2s, -big),
                                        min(m + 1, d2s.shape[1]))
                parts[j][0].append(nd)
                parts[j][1].append(cs[sel])
        outs = []
        for j in range(len(masks)):
            # fold in the appended zero-distance self column
            nd = jnp.concatenate(
                parts[j][0] + [jnp.where(row_ok, 0.0, -big)[:, None]
                               .astype(x.dtype)], axis=1)
            ci = jnp.concatenate(parts[j][1] + [gq[:, None]], axis=1)
            nd2, sel2 = jax.lax.top_k(nd, m + 1)
            idx = jnp.take_along_axis(ci, sel2, axis=1)
            outs.append(jnp.where(-nd2 < big / 2, idx, -1))
        return tuple(outs)

    res = jax.lax.map(one_bucket, (Bq, cl))
    if ordered and impute:
        return res[0], res[1]
    return res[0], None


@partial(jax.jit, static_argnums=(5, 6, 7))
def _ivf_query_rows(qsel, q, x, cent, Bc, m, P, impute):
    """Per-query ordered IVF search over an explicit (static-size) row list
    ``qsel`` (-1 padded) -- the fallback pass for queries that overflow
    their bucket's capacity in the bucketed self-query.  Row indices double
    as the global Vecchia positions for the predecessors-only masking."""
    R = qsel.shape[0]
    big = jnp.asarray(jnp.finfo(x.dtype).max / 8, x.dtype)

    def one_block(b):
        rows = jax.lax.dynamic_slice(qsel, (b * _BLOCK,), (_BLOCK,))
        row_ok = rows >= 0
        safe_r = jnp.where(row_ok, rows, 0)
        Q = q[safe_r]
        gq = safe_r
        d2c = _sq_dists_block(Q, cent)
        _, cl = jax.lax.top_k(-d2c, P)
        cand = jnp.concatenate(
            [Bc[cl].reshape(_BLOCK, -1), gq[:, None]], axis=1)
        ok = (cand >= 0) & row_ok[:, None]
        safe = jnp.where(ok, cand, 0)
        dup = cand == gq[:, None]
        dup = dup.at[:, -1].set(False)
        base_ok = ok & ~dup
        masks = [base_ok & (cand <= gq[:, None])]
        if impute:
            masks.append(base_ok)
        res = _topk_candidates_multi(Q, x, safe, masks, m + 1, big)
        outs = [jnp.where(-nd < big / 2, idx, -1) for nd, idx in res]
        return tuple(outs) if impute else (outs[0],)

    res = jax.lax.map(one_block, jnp.arange(R // _BLOCK))
    o = res[0].reshape(R, m + 1)
    u = res[1].reshape(R, m + 1) if impute else None
    return o, u


@jax.jit
def _scatter_rows(out, qflat, rows):
    """out[(n+1, w)] <- rows at positions qflat (-1 -> parked row n)."""
    qsafe = jnp.where(qflat >= 0, qflat, out.shape[0] - 1)
    return out.at[qsafe].set(rows)


@partial(jax.jit, static_argnums=(1,))
def _covered_mask(Bq, n):
    flat = Bq.reshape(-1)
    cov = jnp.zeros((n + 1,), bool).at[
        jnp.where(flat >= 0, flat, n)].set(True)
    return cov[:n]


def _self_query_parts(x, m, impute, P=16, cache=None):
    """Shared setup for the bucketed self-query: k-means (warm-started from
    ``cache``), inverted lists, centroid top-P lists.  Returns everything
    the bucketed + fallback passes need."""
    n = x.shape[0]
    K, Lc = _ivf_params(n)
    cent0 = None if cache is None else cache.get('cent')
    if cent0 is not None and cent0.shape == (K, x.shape[1]):
        cent, assign = _kmeans_fit(x, K, 2, jnp.asarray(cent0))
    else:
        cent, assign = _kmeans_fit(x, K, 6)
    if cache is not None:
        # block before the host read: a device->host transfer REQUESTED
        # while its producer is still executing takes ~200 s over the axon
        # tunnel (measured: 212 s vs 0.2 s for block-then-read on the same
        # k-means fit) -- this one line was the bulk of the n=1e6 model
        # construction wall time
        jax.block_until_ready(cent)
        cache['cent'] = np.asarray(cent)  # np: keeps model pickling clean
    Bq = _buckets_dev(assign, K, _lq(n, K))
    Bc = Bq[:, :Lc]
    cl = jax.lax.top_k(-_sq_dists_block(cent, cent), P)[1]
    return cent, Bq, Bc, cl


@jax.jit
def _repair_stranded(out):
    """A row the fallback capacity could not cover ends up all -1; park its
    own index in column 0 so downstream conditioning never sees an empty
    set (pathological-clustering insurance, not an expected path)."""
    allneg = (out < 0).all(axis=1)
    self_idx = jnp.arange(out.shape[0], dtype=out.dtype)
    return out.at[:, 0].set(jnp.where(allneg, self_idx, out[:, 0]))


def _finish_self_query(x, m, impute, cent, Bq, Bc, o_b, u_b):
    """Scatter per-bucket results to rows, run the overflow fallback pass,
    and apply the reference layouts."""
    n = x.shape[0]
    qflat = Bq.reshape(-1)
    out = _scatter_rows(jnp.full((n + 1, m + 1), -1, jnp.int32), qflat,
                        o_b.reshape(-1, m + 1))[:n]
    imp = None
    if impute:
        imp = _scatter_rows(jnp.full((n + 1, m + 1), -1, jnp.int32), qflat,
                            u_b.reshape(-1, m + 1))[:n]
    cov = _covered_mask(Bq, n)
    # overflow fallback: per-query search over the uncovered rows
    R = _fallback_cap(n)
    qsel = jnp.nonzero(~cov, size=R, fill_value=-1)[0].astype(jnp.int32)
    fo, fu = _ivf_query_rows(qsel, x, x, cent, Bc, m, 16, impute)
    out = _scatter_rows(
        jnp.concatenate([out, jnp.full((1, m + 1), -1, jnp.int32)]),
        qsel, fo)[:n]
    if impute:
        imp = _scatter_rows(
            jnp.concatenate([imp, jnp.full((1, m + 1), -1, jnp.int32)]),
            qsel, fu)[:n]
    out = _repair_stranded(out)
    ordered = jnp.flip(jnp.sort(out, axis=1), axis=1)
    if not impute:
        return ordered, None
    # imp is the unconstrained top-(m+1) in ascending distance; column 0 is
    # self.  Slice to (n, m-1) to match the host path (get_pred_nn(.., m)[:,1:])
    # and the exact device path (_pred_nn_impl(.., m)[:, 1:]) -- a different
    # width would recompile every chunk program at the first device refresh
    # and condition on one extra neighbour.
    return ordered, jnp.where(imp >= 0, imp, 0)[:, 1:int(m)]


def nn_approx_dev(x, m, impute=False, cache=None):
    """Jit-traceable ordered approximate NN: device IVF build + bucketed
    self-query for points already in Vecchia order.  Returns the reference
    NN layout (descending index order, -1 padded), plus -- when ``impute``
    -- the unconstrained m-NN per point used for imputation pointers.  No
    host transfers, so it can run inside the device NN-refresh program."""
    m = int(m)
    cent, Bq, Bc, cl = _self_query_parts(x, m, impute, cache=cache)
    gidx = jnp.arange(x.shape[0], dtype=jnp.int32)
    o_b, u_b = _bucketed_self_impl(x, x, Bq, cl, Bc, gidx, m, True, impute)
    return _finish_self_query(x, m, impute, cent, Bq, Bc, o_b, u_b)


#: buckets per dispatch of the chunked bucketed self-query; bounds single-
#: program runtime/memory at very large n (K=2*sqrt(n) buckets total).
_BUCKET_CHUNK = 512


def nn_approx_dev_chunked(x, m, impute=False, chunk=None, cache=None):
    """nn_approx_dev with the per-bucket map dispatched in bounded chunks of
    buckets: the arrays never leave the device (x may be a sharded latent
    view), but no single program exceeds the runtime envelope that one
    monolithic query at n=1e6 can breach.  Buckets are processed
    independently, so the results are bit-identical to the fused build.
    Used by the engine's NN refresh above
    models/compiled.DEVICE_REFRESH_MAX_FUSED_N points."""
    m = int(m)
    cent, Bq, Bc, cl = _self_query_parts(x, m, impute, cache=cache)
    gidx = jnp.arange(x.shape[0], dtype=jnp.int32)
    kb = chunk or _BUCKET_CHUNK
    os_, us_ = [], []
    for k0 in range(0, Bq.shape[0], kb):
        o, u = _bucketed_self_impl(x, x, Bq[k0:k0 + kb], cl[k0:k0 + kb],
                                   Bc, gidx, m, True, impute)
        os_.append(o)
        if impute:
            us_.append(u)
    o_b = jnp.concatenate(os_, axis=0)
    u_b = jnp.concatenate(us_, axis=0) if impute else None
    return _finish_self_query(x, m, impute, cent, Bq, Bc, o_b, u_b)



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
    buckets = _buckets_np(_host(assign), K, Lmax)
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
        outs.append(_host(_ivf_query(
            qc, x, cent, buckets, m, P, ordered, q0 + s0)))
    return np.concatenate(outs, axis=0)


def _nn_approx(x, m, ordered=True, P=16, cache=None):
    out, _ = nn_approx_dev_chunked(jnp.asarray(x), m, cache=cache)
    jax.block_until_ready(out)  # see _self_query_parts: no d2h on pending
    return np.asarray(out)


def _pred_nn_approx(query, x, m, P=16):
    n = x.shape[0]
    cent, buckets = _ivf_build(x, n)
    out = _query_chunks(0, jnp.asarray(query), jnp.asarray(x), cent,
                        buckets, m, P, False)
    # nearest-first layout; repair any -1 (insufficient candidates) to 0
    return np.where(out >= 0, out, 0)
