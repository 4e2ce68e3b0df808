"""Pallas TPU kernels: fused Vecchia block log-likelihood (+ gradient).

The Vecchia conditional log-likelihood is n independent (m+1)x(m+1)
problems: build the local correlation block, factorise it, forward-solve,
and keep the final element's (logdet, quad) contribution (reference
`dgpsi/vecchia.py:164-242` runs these as Numba prange loops, one small
LAPACK call per point).  The XLA path (vecchia.core) runs this as a chain
of ~m separate batched ops; these kernels fuse the whole pipeline --
kernel-matrix construction, column Cholesky, forward/backward substitution,
per-parameter derivative contractions -- into ONE kernel launch, with the
point batch as the vector-lane axis (arrays are (m1, ..., n)) and a grid
over row slabs so the whole objective evaluation is a single program.

Padded rows are handled by sentinel coordinates (far apart from everything,
including each other) + unit diagonal, which decouples them exactly: their
logdet contribution is log(1)=0 and their quad contribution is 0 (y=0).

The gradient kernel implements the reference's analytic Vecchia gradient
(dgpsi/vecchia.py:182-242):

    z    = L^-T e_last
    w_k  = L^-1 (dK_k z)
    dlogdet_k = w_k[-1]
    dquad_k   = 2 (Ly . w_k) Ly[-1] - w_k[-1] Ly[-1]^2

Coordinates arrive pre-scaled by the lengthscales, so
dK/dlog l_t = 2 u_t^2 K (sexp) or K * (5/3 a^2)(1+sqrt5 a)/c (matern),
and dK/dlog nugget = diag(nugget * nugget_diag).
"""
import contextlib
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _x32_ctx(dtype):
    """32-bit tracing context for the f32 kernel path: under x64, pallas
    emits i64 grid indices which Mosaic cannot legalize ('func.return'
    error).  The f64 (interpret/test) path must keep x64 semantics."""
    if dtype == jnp.float32:
        return jax.enable_x64(False)
    return contextlib.nullcontext()

SQRT5 = 2.23606797749978969
_SLAB = 1024
# the gradient kernel's scratch is 2 x (m1, m1, B) f32; B=1024 keeps it
# within VMEM for m <= ~40 while halving the grid steps per launch
_GRAD_SLAB = 1024


def _interpret():
    return jax.default_backend() != "tpu"


def _corr_cols(Xl, xj, name):
    """Correlation of rows Xl (r, d, B) against one row xj (1, d, B);
    coordinates arrive pre-scaled by the lengthscales.  Both kernels are
    per-dim PRODUCTS, so partial-dim results can be multiplied together."""
    if name == "sexp":
        return jnp.exp(-jnp.sum((Xl - xj) ** 2, axis=1))       # (r, B)
    # matern2.5 (unrolled product: Mosaic has no reduce_prod)
    ad = jnp.abs(Xl - xj)                         # (r, d, B)
    d_dims = ad.shape[1]
    coef = 1.0 + SQRT5 * ad[:, 0] + (5.0 / 3.0) * ad[:, 0] * ad[:, 0]
    for t in range(1, d_dims):
        coef = coef * (1.0 + SQRT5 * ad[:, t]
                       + (5.0 / 3.0) * ad[:, t] * ad[:, t])
    return coef * jnp.exp(-SQRT5 * jnp.sum(ad, axis=1))


def _fwd_pipeline(X, yv, diag, L, *, m1, name, fac=None):
    """Shared per-slab pipeline: column Cholesky with the correlation
    columns built on the fly (no block-matrix scratch) -> forward
    substitution.  X/yv/diag are VALUES (the caller loads refs); L is a VMEM
    scratch ref.  ``fac``, if given, maps column j to a precomputed (static)
    correlation factor for rows j+1.. -- the per-dim product structure of
    both kernels lets candidate-invariant dimensions be factored out of the
    per-candidate build (see _kernel_multi).  Returns (logdet_row (B,),
    quad_row (B,))."""
    def k_col(j):
        """Correlation of block rows j+1.. with row j.  Only the strict
        lower part is built -- the column Cholesky never reads above the
        diagonal, and the correlation build is ~half the kernel's VPU
        work."""
        col = _corr_cols(X[j + 1:], X[j][None], name)
        if fac is not None:
            col = col * fac(j)
        return col

    # column Cholesky, batch-vectorised (diagonal comes from `diag`)
    for j in range(m1):
        if j == 0:
            dj = jnp.sqrt(diag[0])
            L[0, 0] = dj
            if m1 > 1:  # Mosaic rejects the empty slice at m1 == 1
                L[1:, 0] = k_col(0) / dj[None]
        else:
            s = diag[j] - jnp.sum(L[j, :j] ** 2, axis=0)
            dj = jnp.sqrt(s)
            L[j, j] = dj
            if j + 1 < m1:
                off = (k_col(j)
                       - jnp.sum(L[j + 1:, :j] * L[j, :j][None], axis=1)) / dj[None]
                L[j + 1:, j] = off

    # forward substitution L sol = y
    sol_prev = []
    for i in range(m1):
        if i == 0:
            si = yv[0] / L[0, 0]
        else:
            acc = yv[i]
            stacked = jnp.stack(sol_prev, axis=0)      # (i, B)
            acc = acc - jnp.sum(L[i, :i] * stacked, axis=0)
            si = acc / L[i, i]
        sol_prev.append(si)

    return 2.0 * jnp.log(L[m1 - 1, m1 - 1]), sol_prev[-1] ** 2


def _kernel(x_ref, y_ref, diag_ref, logdet_ref, quad_ref, L, *, m1, name):
    logdet, quad = _fwd_pipeline(x_ref[...], y_ref[...], diag_ref[...],
                                 L, m1=m1, name=name)
    logdet_ref[...] = logdet[None]
    quad_ref[...] = quad[None]


def _kernel_multi(a_ref, b_ref, c_ref, y_ref, diag_ref, cos_ref, sin_ref,
                  logdet_ref, quad_ref, L, G, *, m1, name, dl):
    """Evaluate one ESS candidate cos*A + sin*B + C of a (slab, candidate)
    grid.  The candidate axis is the FASTEST grid axis and the slab inputs'
    index maps ignore it, so Pallas keeps the slab data VMEM-resident across
    all candidates (HBM traffic does not scale with the candidate count)
    while the factorisation pipeline is compiled ONCE -- unrolling the
    candidate loop inside the kernel instead multiplies Mosaic compile time
    by the candidate count (~300 s at K=9).  The candidate angle is selected
    by the grid index (cos/sin and the outputs keep full-K blocks: TPU block
    shapes cannot tile the K axis); output rows accumulate in the resident
    block across candidate steps and flush when the slab advances.

    Dimensions >= dl carry no candidate dependence (A/B are zero there; the
    global coordinates live in C).  Both kernels are per-dim products, so
    the static dims' pairwise correlation factor is computed ONCE per slab
    (candidate grid step 0) into the slab-persistent scratch G and reused by
    every candidate -- the per-candidate build covers only the dl latent
    dims."""
    k = pl.program_id(1)
    ck = cos_ref[k, 0]
    sk = sin_ref[k, 0]
    d = a_ref.shape[1]
    if dl >= d or dl == 0:
        X = ck * a_ref[...] + sk * b_ref[...] + c_ref[...]
        logdet, quad = _fwd_pipeline(X, y_ref[...], diag_ref[...],
                                     L, m1=m1, name=name)
    else:
        Cg = c_ref[:, dl:, :]

        @pl.when(k == 0)
        def _build_static():
            for j in range(m1 - 1):
                G[j + 1:, j] = _corr_cols(Cg[j + 1:], Cg[j][None], name)

        X = (ck * a_ref[:, :dl, :] + sk * b_ref[:, :dl, :]
             + c_ref[:, :dl, :])
        logdet, quad = _fwd_pipeline(X, y_ref[...], diag_ref[...],
                                     L, m1=m1, name=name,
                                     fac=lambda j: G[j + 1:, j])
    logdet_ref[k] = logdet
    quad_ref[k] = quad


def block_loglik_parts(Xg, yg, diag, *, name):
    """(n, m1, d)-layout wrapper around `block_loglik_parts_t`."""
    return block_loglik_parts_t(Xg.transpose(1, 2, 0), yg.T, diag.T, name=name)


def _kernel_condw(x_ref, diag_ref, w_ref, sigma_ref, L, *, m1, name):
    """Conditional weights for ancestral sampling: factorise the block and
    solve L_nn^T w = l_last; sigma is the final pivot (reference
    cond_weights, the batched-XLA form in vecchia/core.py)."""
    X = x_ref[...]
    diag = diag_ref[...]
    # reuse the shared pipeline's factorisation (y = 0 -> solution unused)
    _fwd_pipeline(X, jnp.zeros_like(diag), diag, L, m1=m1, name=name)
    m = m1 - 1
    # backward substitution L_nn^T w = l_last (unrolled value-list form)
    w = [None] * m
    for i in range(m - 1, -1, -1):
        acc = L[m1 - 1, i]
        for j in range(i + 1, m):
            acc = acc - L[j, i] * w[j]
        w[i] = acc / L[i, i]
    for i in range(m):
        w_ref[i] = w[i]
    sigma_ref[...] = L[m1 - 1, m1 - 1][None]


def cond_weights_t(Xg, diag, *, name):
    """(w (m, n), sigma (n,)) from transposed-layout blocks, one launch."""
    m1, d, n = Xg.shape
    B = min(_SLAB, max(256, 1 << int(np.ceil(np.log2(max(n, 2))))))
    n_pad = ((n + B - 1) // B) * B
    Xt, _, dt_ = _pad_last([Xg, None, diag], n, n_pad, m1)

    kern = functools.partial(_kernel_condw, m1=m1, name=name)
    grid = (n_pad // B,)
    with _x32_ctx(Xg.dtype):
        w, sigma = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((m1, d, B), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((m1 - 1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((m1 - 1, n_pad), Xg.dtype),
                jax.ShapeDtypeStruct((1, n_pad), Xg.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((m1, m1, B), Xg.dtype),
            ],
            interpret=_interpret(),
        )(Xt, dt_)
    return w[:, :n], sigma[0, :n]


def _pad_last(arrs, n, n_pad, m1, sentinel_for=0):
    """Pad the trailing point axis of transposed-layout arrays with
    decoupled sentinel columns."""
    if n_pad == n:
        return arrs
    pad = n_pad - n
    out = []
    for i, a in enumerate(arrs):
        if a is None:
            out.append(None)
        elif i == sentinel_for:  # (m1, d, n)
            sent = (1e7 + jnp.arange(n, n_pad, dtype=a.dtype)[None, :] * 1e3
                    + jnp.arange(m1, dtype=a.dtype)[:, None] * 7e2)
            out.append(jnp.concatenate(
                [a, jnp.broadcast_to(sent[:, None, :], (m1, a.shape[1], pad))],
                axis=-1))
        elif i == 2:  # diag pads with 1
            out.append(jnp.concatenate([a, jnp.ones(a.shape[:-1] + (pad,), a.dtype)],
                                       axis=-1))
        else:
            out.append(jnp.concatenate([a, jnp.zeros(a.shape[:-1] + (pad,), a.dtype)],
                                       axis=-1))
    return out


def gather_scale_t(X, y, NNarray, length, nugget, nugget_diag, extra_jitter):
    """Gather + sentinel-encode Vecchia blocks DIRECTLY in the kernels'
    transposed (m1, d, n) layout.

    The (n, m1, d) -> (m1, d, n) transpose of the naive layout moves the
    major axis to the minor position -- a full data shuffle per objective
    evaluation.  Gathering from the (d, n)-transposed inputs instead makes
    every large intermediate already minor-contiguous in n.
    """
    rev = jnp.flip(NNarray, axis=1)
    validT = (rev >= 0).T                       # (m1, n)
    safeT = jnp.where(validT, rev.T, 0)
    n, m1 = X.shape[0], NNarray.shape[1]
    Xl = (X / length).T                         # (d, n) -- tiny transpose
    Xg = jnp.swapaxes(Xl[:, safeT], 0, 1)       # (m1, d, n)
    sent = (1e7 + jnp.arange(n, dtype=Xg.dtype)[None, :] * 1e3
            + jnp.arange(m1, dtype=Xg.dtype)[:, None] * 7e2)
    Xg = jnp.where(validT[:, None, :], Xg, sent[:, None, :])
    yg = jnp.where(validT, y[safeT], 0.0)
    diag = jnp.where(validT, 1.0 + nugget * nugget_diag[safeT] + extra_jitter, 1.0)
    return Xg, yg, diag


def block_loglik_parts_t(Xg, yg, diag, *, name):
    """Per-point (logdet_i, quad_i) from transposed-layout blocks.

    Args:
        Xg:   (m1, d, n) length-scaled coordinates (ascending neighbour
              order, self last; padded lanes sentinel-encoded).
        yg:   (m1, n) gathered targets (padded lanes zero).
        diag: (m1, n) block diagonals (padded lanes 1).
    Returns:
        (logdet (n,), quad (n,)).
    """
    m1, d, n = Xg.shape
    B = min(_SLAB, max(256, 1 << int(np.ceil(np.log2(max(n, 2))))))
    n_pad = ((n + B - 1) // B) * B
    Xt, yt, dt_ = _pad_last([Xg, yg, diag], n, n_pad, m1)

    kern = functools.partial(_kernel, m1=m1, name=name)
    grid = (n_pad // B,)
    with _x32_ctx(Xg.dtype):
        logdet, quad = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((m1, d, B), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, n_pad), Xg.dtype),
                jax.ShapeDtypeStruct((1, n_pad), Xg.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((m1, m1, B), Xg.dtype),
            ],
            interpret=_interpret(),
        )(Xt, yt, dt_)
    return logdet[0, :n], quad[0, :n]


def block_loglik_multi_t(A, B, C, yg, diag, cosv, sinv, *, name, dl=None):
    """(logdet (K, n), quad (K, n)) for the K candidates cos*A + sin*B + C,
    in ONE kernel launch (transposed layout; see _kernel_multi).

    A/B/C: (m1, d, n); yg/diag: (m1, n); cosv/sinv: (K,).  ``dl`` marks the
    number of leading candidate-dependent dims (the rest are static global
    dims factored out of the per-candidate correlation build); defaults to
    all dims.
    """
    m1, d, n = A.shape
    if dl is None:
        dl = d
    K_c = cosv.shape[0]
    Bsz = min(_SLAB, max(256, 1 << int(np.ceil(np.log2(max(n, 2))))))
    n_pad = ((n + Bsz - 1) // Bsz) * Bsz
    # A/B pad with zeros; C carries the sentinel columns; diag pads with 1
    A_p, yt, dt_ = _pad_last([A, yg, diag], n, n_pad, m1, sentinel_for=-1)
    B_p, = _pad_last([B], n, n_pad, m1, sentinel_for=-1)
    C_p, = _pad_last([C], n, n_pad, m1, sentinel_for=0)

    kern = functools.partial(_kernel_multi, m1=m1, name=name, dl=int(dl))
    grid = (n_pad // Bsz, K_c)
    cs = cosv.reshape(K_c, 1).astype(A.dtype)
    sn = sinv.reshape(K_c, 1).astype(A.dtype)
    with _x32_ctx(A.dtype):
        logdet, quad = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((m1, d, Bsz), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m1, d, Bsz), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m1, d, Bsz), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m1, Bsz), lambda i, k: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m1, Bsz), lambda i, k: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((K_c, 1), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K_c, 1), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((K_c, Bsz), lambda i, k: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((K_c, Bsz), lambda i, k: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((K_c, n_pad), A.dtype),
                jax.ShapeDtypeStruct((K_c, n_pad), A.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((m1, m1, Bsz), A.dtype),
                pltpu.VMEM((m1, m1, Bsz), A.dtype),  # static-dim factor G
            ],
            interpret=_interpret(),
        )(A_p, B_p, C_p, yt, dt_, cs, sn)
    return logdet[:, :n], quad[:, :n]


def _grad_kernel(x_ref, y_ref, diag_ref, dnug_ref,
                 logdet_ref, quad_ref, dlogdet_ref, dquad_ref,
                 K, L, D2, *, m1, name, n_length, nugget_est):
    X = x_ref[...]          # (m1, d, B)
    yv = y_ref[...]         # (m1, B)
    diag = diag_ref[...]    # (m1, B)
    dnug = dnug_ref[...]    # (m1, B)
    d_dims = X.shape[1]
    # isotropic sexp: dK/dlog l = 2 d2 K, with d2 the squared distance
    # already computed while building K -- stash it (scratch D2) instead of
    # recomputing the full distance pass per gradient row
    keep_d2 = name == "sexp" and n_length == 1

    def k_row(a):
        xa = X[a][None]
        if name == "sexp":
            d2 = jnp.sum((X - xa) ** 2, axis=1)
            if keep_d2:
                D2[a] = d2
            return jnp.exp(-d2)
        ad = jnp.abs(X - xa)
        coef = 1.0 + SQRT5 * ad[:, 0] + (5.0 / 3.0) * ad[:, 0] * ad[:, 0]
        for t in range(1, d_dims):
            coef = coef * (1.0 + SQRT5 * ad[:, t] + (5.0 / 3.0) * ad[:, t] * ad[:, t])
        return coef * jnp.exp(-SQRT5 * jnp.sum(ad, axis=1))

    def dk_row(a, k):
        """Row a of dK/dlog theta_k times the stored K row (excluding the
        nugget diagonal, which K's off-diagonal rows don't carry)."""
        xa = X[a][None]
        Krow = K[a]
        if name == "sexp":
            if n_length == 1:
                dd = 2.0 * D2[a]
            else:
                dt_ = (X[:, k] - X[a, k][None]) ** 2
                dd = 2.0 * dt_
        else:
            if n_length == 1:
                ad = jnp.abs(X - xa)
                dd = jnp.zeros_like(Krow)
                for t in range(d_dims):
                    a_t = ad[:, t]
                    c_t = 1.0 + SQRT5 * a_t + (5.0 / 3.0) * a_t * a_t
                    dd = dd + (5.0 / 3.0) * a_t * a_t * (1.0 + SQRT5 * a_t) / c_t
            else:
                a_t = jnp.abs(X[:, k] - X[a, k][None])
                c_t = 1.0 + SQRT5 * a_t + (5.0 / 3.0) * a_t * a_t
                dd = (5.0 / 3.0) * a_t * a_t * (1.0 + SQRT5 * a_t) / c_t
        return dd * Krow

    for a in range(m1):
        K[a] = k_row(a)
    # keep pure correlation rows in K (diagonal 1) for dK; the factorisation
    # uses L built from K plus the nugget diagonal.
    for j in range(m1):
        K[j, j] = jnp.ones_like(diag[j])

    # Cholesky of the block with the nugget diagonal
    for j in range(m1):
        if j == 0:
            dj = jnp.sqrt(diag[0])
            L[0, 0] = dj
            if m1 > 1:  # Mosaic rejects the empty slice at m1 == 1
                L[1:, 0] = K[1:, 0] / dj[None]
        else:
            s = diag[j] - jnp.sum(L[j, :j] ** 2, axis=0)
            dj = jnp.sqrt(s)
            L[j, j] = dj
            if j + 1 < m1:
                off = (K[j + 1:, j]
                       - jnp.sum(L[j + 1:, :j] * L[j, :j][None], axis=1)) / dj[None]
                L[j + 1:, j] = off

    # NOTE: the substitutions/contractions below accumulate per-row (B,)
    # products in unrolled Python loops rather than jnp.sum over a stacked
    # (m1, B) tensor -- Mosaic rejects ADD multi_reductions whose operand
    # layout carries a sublane offset, which stacked value-lists produce.

    # Ly = L^-1 y
    Ly = []
    for i in range(m1):
        acc = yv[i]
        for t in range(i):
            acc = acc - L[i, t] * Ly[t]
        Ly.append(acc / L[i, i])
    Ly_last = Ly[-1]

    # z = L^-T e_last (backward substitution)
    z = [None] * m1
    z[m1 - 1] = 1.0 / L[m1 - 1, m1 - 1]
    for i in range(m1 - 2, -1, -1):
        acc = jnp.zeros_like(Ly_last)
        for j in range(i + 1, m1):
            acc = acc + L[j, i] * z[j]
        z[i] = -acc / L[i, i]

    logdet_ref[...] = 2.0 * jnp.log(L[m1 - 1, m1 - 1])[None]
    quad_ref[...] = (Ly_last ** 2)[None]

    n_par = n_length + (1 if nugget_est else 0)
    for kpar in range(n_par):
        # v = dK_k z
        if kpar < n_length:
            v = []
            for a in range(m1):
                va = dk_row(a, kpar)                 # (m1, B)
                acc = va[0] * z[0]
                for j in range(1, m1):
                    acc = acc + va[j] * z[j]
                v.append(acc)
        else:
            v = [dnug[i] * z[i] for i in range(m1)]
        # w = L^-1 v
        w = []
        for i in range(m1):
            acc = v[i]
            for t in range(i):
                acc = acc - L[i, t] * w[t]
            w.append(acc / L[i, i])
        w_last = w[-1]
        s_k = Ly[0] * w[0]
        for i in range(1, m1):
            s_k = s_k + Ly[i] * w[i]
        dlogdet_ref[kpar] = w_last
        dquad_ref[kpar] = 2.0 * s_k * Ly_last - w_last * Ly_last ** 2


def block_nllik_grad_parts(Xg, yg, diag, dnug, *, name, n_length, nugget_est):
    """(n, m1, d)-layout wrapper around `block_nllik_grad_parts_t`."""
    return block_nllik_grad_parts_t(Xg.transpose(1, 2, 0), yg.T, diag.T,
                                    dnug.T, name=name, n_length=n_length,
                                    nugget_est=nugget_est)


def block_nllik_grad_parts_t(Xg, yg, diag, dnug, *, name, n_length,
                             nugget_est):
    """Per-point (logdet, quad) and their gradients w.r.t. log-params, in one
    kernel launch (grid over point slabs), from transposed (m1, ..., n)
    layout blocks.

    Returns (logdet (n,), quad (n,), dlogdet (p, n), dquad (p, n))."""
    m1, d, n = Xg.shape
    n_par = n_length + (1 if nugget_est else 0)
    B = min(_GRAD_SLAB, max(256, 1 << int(np.ceil(np.log2(max(n, 2))))))
    n_pad = ((n + B - 1) // B) * B
    Xt, yt, dt_, dn_ = _pad_last([Xg, yg, diag, dnug], n, n_pad, m1)

    kern = functools.partial(_grad_kernel, m1=m1, name=name,
                             n_length=n_length, nugget_est=nugget_est)
    grid = (n_pad // B,)
    with _x32_ctx(Xg.dtype):
        logdet, quad, dlogdet, dquad = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((m1, d, B), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_par, B), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_par, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, n_pad), Xg.dtype),
                jax.ShapeDtypeStruct((1, n_pad), Xg.dtype),
                jax.ShapeDtypeStruct((n_par, n_pad), Xg.dtype),
                jax.ShapeDtypeStruct((n_par, n_pad), Xg.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((m1, m1, B), Xg.dtype),
                pltpu.VMEM((m1, m1, B), Xg.dtype),
                pltpu.VMEM((m1 if (name == "sexp" and n_length == 1) else 1,
                            m1, B), Xg.dtype),  # D2 (sexp-iso dK reuse)
            ],
            interpret=_interpret(),
        )(Xt, yt, dt_, dn_)
    return logdet[0, :n], quad[0, :n], dlogdet[:, :n], dquad[:, :n]


def use_pallas(dtype, m1):
    """Whether the fused kernel path applies (TPU backend, f32, small m)."""
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return backend == "tpu" and dtype == jnp.float32 and m1 <= 64


def gather_raw(X, y, NNarray, nugget_diag):
    """Index-only gather of Vecchia blocks (no parameter dependence).

    The NN indices are fixed across an M-step's objective evaluations, so the
    gather runs once and `scale_blocks` applies the per-evaluation
    lengthscale/nugget transforms.

    Returns (Xg_raw (n, m1, d), yg (n, m1), nug_g (n, m1), valid (n, m1)).
    """
    rev = jnp.flip(NNarray, axis=1)
    valid = rev >= 0
    safe = jnp.where(valid, rev, 0)
    Xg_raw = X[safe]
    yg = jnp.where(valid, y[safe], 0.0)
    nug_g = jnp.where(valid, nugget_diag[safe], 0.0)
    return Xg_raw, yg, nug_g, valid


def scale_blocks(Xg_raw, nug_g, valid, length, nugget, extra_jitter):
    """Per-evaluation transform: scale coordinates by the lengthscales,
    sentinel-encode padded lanes, and build the block diagonal.

    Returns (Xg, diag, dnug) ready for the fused kernels."""
    n, m1, d = Xg_raw.shape
    Xg = Xg_raw / length
    sent = (1e7 + jnp.arange(n, dtype=Xg.dtype)[:, None] * 1e3
            + jnp.arange(m1, dtype=Xg.dtype)[None, :] * 7e2)
    Xg = jnp.where(valid[:, :, None], Xg, sent[:, :, None])
    diag = jnp.where(valid, 1.0 + nugget * nug_g + extra_jitter, 1.0)
    dnug = nugget * nug_g
    return Xg, diag, dnug


def gather_blocks(X, y, NNarray, length, nugget, nugget_diag, extra_jitter):
    """Gather + sentinel-encode Vecchia blocks for the fused kernel."""
    Xg_raw, yg, nug_g, valid = gather_raw(X, y, NNarray, nugget_diag)
    Xg, diag, _ = scale_blocks(Xg_raw, nug_g, valid, length, nugget, extra_jitter)
    return Xg, yg, diag


def gather_raw_t(X, y, NNarray, nugget_diag):
    """Index-only block gather in the kernels' transposed layout.

    Returns (Xg_raw (m1, d, n), yg (m1, n), nug_g (m1, n), valid (m1, n));
    see `gather_scale_t` for why the transposed layout matters.
    """
    rev = jnp.flip(NNarray, axis=1)
    validT = (rev >= 0).T
    safeT = jnp.where(validT, rev.T, 0)
    Xg_raw = jnp.swapaxes(X.T[:, safeT], 0, 1)   # (m1, d, n)
    yg = jnp.where(validT, y[safeT], 0.0)
    nug_g = jnp.where(validT, nugget_diag[safeT], 0.0)
    return Xg_raw, yg, nug_g, validT


def scale_blocks_t(Xg_raw, nug_g, valid, length, nugget, extra_jitter):
    """Per-evaluation transform in transposed layout.

    Returns (Xg (m1, d, n), diag (m1, n), dnug (m1, n))."""
    m1, d, n = Xg_raw.shape
    Xg = Xg_raw / length[None, :, None]
    sent = (1e7 + jnp.arange(n, dtype=Xg.dtype)[None, :] * 1e3
            + jnp.arange(m1, dtype=Xg.dtype)[:, None] * 7e2)
    Xg = jnp.where(valid[:, None, :], Xg, sent[:, None, :])
    diag = jnp.where(valid, 1.0 + nugget * nug_g + extra_jitter, 1.0)
    dnug = nugget * nug_g
    return Xg, diag, dnug
