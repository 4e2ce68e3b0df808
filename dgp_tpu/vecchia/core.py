"""Vecchia-approximation compute kernels as batched XLA ops.

The reference implements these as Numba prange loops over points, each doing
an m x m Cholesky (`dgpsi/vecchia.py:164-242, 635-907`).  Here every
per-point block is gathered into one (n, m+1, m+1) tensor and factorised by a
single batched Cholesky -- the shape TPUs are built for.  Padded rows
(points with fewer than m predecessors, marked -1 in NNarray) are decoupled
by masking their kernel-matrix rows/columns to the identity, which leaves
the final-element conditionals exactly equal to the unpadded computation.

Gradients (reference's hand-derived `vecchia_nllik` gradient) come from
autodiff through the batched factorisation.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import kernels as kops
from ..ops import linalg


def _f32_jitter(dtype):
    """Fixed diagonal jitter for float32 Vecchia blocks.

    Near-ones correlation blocks lose positive definiteness under float32
    Cholesky; a 3e-5 diagonal floor (small against the usual 1e-4..1e-2
    estimated nuggets, invisible in float64) keeps the batched
    factorisations finite without a data-dependent retry loop."""
    return 3e-5 if dtype == jnp.float32 else 0.0


def _blocks(X, y, NNarray, length, nugget, name, nugget_diag):
    """Gather masked (n, m+1, m+1) kernel blocks in ascending order
    (self last) plus masked targets.

    Returns (K, y_blk, valid) where invalid lanes are identity-decoupled.
    """
    rev = jnp.flip(NNarray, axis=1)          # ascending, -1 first
    valid = rev >= 0                          # (n, m+1)
    safe = jnp.where(valid, rev, 0)
    Xi = X[safe]                              # (n, m+1, d)
    yi = jnp.where(valid, y[safe], 0.0)       # (n, m+1)
    nug_i = nugget * nugget_diag[safe]        # (n, m+1)

    K = kops.k_cross(Xi, Xi, length, name)    # (n, m+1, m+1)
    both = valid[:, :, None] & valid[:, None, :]
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)
    K = jnp.where(both, K, eye)
    diag = jnp.where(valid, 1.0 + nug_i + _f32_jitter(K.dtype), 1.0)
    K = kops.set_diag(K, diag)
    return K, yi, valid


def _chol_chunked(K, chunk=8192):
    """Batched Cholesky of small blocks: column-unrolled and vectorised over
    the batch (linalg.chol_small), which beats XLA's batched lowering by
    1-2 orders of magnitude for the (n, m+1, m+1) Vecchia shapes on TPU."""
    if K.shape[0] <= chunk:
        return linalg.chol_small(K)
    return jax.lax.map(linalg.chol_small, K, batch_size=chunk)


def vecchia_llik(X, y, NNarray, scale, length, nugget, nugget_diag, name):
    """Vecchia log-likelihood at fixed params (reference vecchia_llik).

    Note: as in the reference, the scale enters only through quad/scale (the
    parameter-constant normalisation is dropped -- ESS compares candidates at
    identical parameters, so constants cancel).

    On TPU/float32 the per-block pipeline runs as one fused Pallas kernel
    (ops.pallas_vecchia); elsewhere as batched XLA ops."""
    from ..ops import pallas_vecchia as pv

    if pv.use_pallas(X.dtype, NNarray.shape[1]):
        Xg, yg, diag = pv.gather_scale_t(X, y, NNarray, length, nugget,
                                         nugget_diag, _f32_jitter(X.dtype))
        logdet_i, quad_i = pv.block_loglik_parts_t(Xg, yg, diag, name=name)
        quad = linalg.sum64(quad_i)
        logdet = linalg.sum64(logdet_i)
        return -0.5 * (logdet + quad / jnp.asarray(scale, jnp.float64))
    K, yi, _ = _blocks(X, y, NNarray, length, nugget, name, nugget_diag)
    L = _chol_chunked(K)
    Ly = linalg.fwd_solve_small(L, yi)
    quad = linalg.sum64(Ly[:, -1] ** 2)
    logdet = linalg.sum64(2.0 * jnp.log(jnp.abs(L[:, -1, -1])))
    return -0.5 * (logdet + quad / jnp.asarray(scale, jnp.float64))


def vecchia_nllik(log_theta, X, y, NNarray, nugget_diag, *, name, scale_est,
                  nugget_est, fixed_scale, fixed_nugget, n_orig, sum_residual):
    """Profiled Vecchia negative log-lik (reference vecchia_nllik semantics;
    gradient via autodiff).  Returns (nllik, scale)."""
    if nugget_est:
        length = jnp.exp(log_theta[:-1])
        nugget = jnp.exp(log_theta[-1])
    else:
        length = jnp.exp(log_theta)
        nugget = fixed_nugget
    n = X.shape[0]
    K, yi, _ = _blocks(X, y, NNarray, length, nugget, name, nugget_diag)
    L = _chol_chunked(K)
    Ly = linalg.fwd_solve_small(L, yi)
    quad = linalg.sum64(Ly[:, -1] ** 2)
    logdet = linalg.sum64(2.0 * jnp.log(jnp.abs(L[:, -1, -1])))
    nugget = jnp.asarray(nugget, jnp.float64)
    has_rep = sum_residual is not None
    N = n_orig if has_rep else n
    if scale_est:
        if has_rep:
            scale = (quad + sum_residual / nugget) / N
        else:
            scale = quad / n
        nllik = 0.5 * (logdet + N * jnp.log(scale))
        if has_rep and nugget_est:
            nllik += 0.5 * (N - n) * jnp.log(nugget)
    else:
        scale = fixed_scale
        nllik = 0.5 * (logdet + quad / scale)
        if has_rep and nugget_est:
            nllik += 0.5 * (sum_residual / (scale * nugget) + (N - n) * jnp.log(nugget))
    return nllik, scale


def vecchia_nllik_fg(log_theta, X, y, NNarray, nugget_diag, *, name, n_length,
                     scale_est, nugget_est, fixed_scale, fixed_nugget, n_orig,
                     sum_residual, prior_name=None, prior_coef=None, raw=None):
    """Profiled Vecchia negative log-lik AND its gradient w.r.t. log-params,
    through the fused Pallas kernel with the reference's analytic gradient
    (dgpsi/vecchia.py:182-242).  Returns (nll, grad, scale).

    Only used on the Pallas path; the XLA path differentiates vecchia_nllik
    by autodiff.  `raw` optionally carries the parameter-independent block
    gathers from `pv.gather_raw` so repeated objective evaluations (L-BFGS)
    skip the gather."""
    from ..ops import pallas_vecchia as pv
    from .. import gp_core

    if nugget_est:
        length = jnp.exp(log_theta[:-1])
        nugget = jnp.exp(log_theta[-1])
    else:
        length = jnp.exp(log_theta)
        nugget = fixed_nugget
    n = X.shape[0]
    if raw is None:
        raw = pv.gather_raw(X, y, NNarray, nugget_diag)
    Xg_raw, yg, nug_g, valid = raw
    Xg, diag, dnug = pv.scale_blocks(Xg_raw, nug_g, valid, length, nugget,
                                     _f32_jitter(X.dtype))
    logdet_i, quad_i, dlogdet_i, dquad_i = pv.block_nllik_grad_parts(
        Xg, yg, diag, dnug, name=name, n_length=n_length, nugget_est=nugget_est)
    quad = linalg.sum64(quad_i)
    logdet = linalg.sum64(logdet_i)
    dquad = linalg.sum64(dquad_i, axis=1)
    dlogdet = linalg.sum64(dlogdet_i, axis=1)
    nugget64 = jnp.asarray(nugget, jnp.float64)
    has_rep = sum_residual is not None
    N = n_orig if has_rep else n
    if scale_est:
        if has_rep:
            scale = (quad + sum_residual / nugget64) / N
        else:
            scale = quad / n
        nll = 0.5 * (logdet + N * jnp.log(scale))
        g = 0.5 * (dlogdet - dquad / scale)
        if has_rep and nugget_est:
            nll += 0.5 * (N - n) * jnp.log(nugget64)
            g = g.at[-1].add(0.5 * (-sum_residual / (scale * nugget64) + (N - n)))
    else:
        scale = jnp.asarray(fixed_scale, jnp.float64)
        nll = 0.5 * (logdet + quad / scale)
        g = 0.5 * (dlogdet - dquad / scale)
        if has_rep and nugget_est:
            nll += 0.5 * (sum_residual / (scale * nugget64) + (N - n) * jnp.log(nugget64))
            g = g.at[-1].add(0.5 * (-sum_residual / (scale * nugget64) + (N - n)))
    if prior_name is not None:
        def neg_log_prior(lt):
            if nugget_est:
                ln, nu = jnp.exp(lt[:-1]), jnp.exp(lt[-1])
            else:
                ln, nu = jnp.exp(lt), fixed_nugget
            cl = (gp_core.compute_cl(X, X.shape[0], n_length, True)
                  if prior_name == 'ref' else None)
            return -gp_core.log_prior(ln, nu, prior_name=prior_name,
                                      prior_coef=prior_coef,
                                      nugget_est=nugget_est, cl=cl)

        pv_val, pv_grad = jax.value_and_grad(neg_log_prior)(log_theta)
        nll = nll + pv_val
        g = g + pv_grad
    return nll, g.astype(log_theta.dtype), scale


def cond_weights(X, NNarray, length, nugget, name, nugget_diag=None,
                 pre=None):
    """Per-point conditional weights for ancestral Vecchia sampling.

    For each ordered point i with ascending neighbour set N(i):
        x_i | x_N(i) ~ N(w_i . x_N(i), scale * sigma_i^2)
    Returns (w (n, m), sigma (n,), idx_asc (n, m), valid (n, m)).

    ``pre`` optionally carries the parameter-independent gathered blocks
    (Xg_raw (m1, d, n), nug_g (m1, n), validT (m1, n)) from
    pallas_vecchia.gather_raw_t.  Inside a training scan the NN gather is
    loop-invariant while length/nugget are not; hoisting it to the caller
    avoids re-gathering every iteration (gathers of carry-dependent sources
    lower to slow loop fusions on TPU)."""
    from ..ops import pallas_vecchia as pv

    n = X.shape[0]
    nd = jnp.ones(n, X.dtype) if nugget_diag is None else nugget_diag
    rev = jnp.flip(NNarray, axis=1)
    valid = rev >= 0
    if pv.use_pallas(X.dtype, NNarray.shape[1]):
        if pre is not None:
            Xg_raw, nug_g, validT = pre
            Xg, diag, _ = pv.scale_blocks_t(Xg_raw, nug_g, validT, length,
                                            nugget, _f32_jitter(X.dtype))
        else:
            Xg, _, diag = pv.gather_scale_t(X, jnp.zeros(n, X.dtype), NNarray,
                                            length, nugget, nd,
                                            _f32_jitter(X.dtype))
        w_t, sigma = pv.cond_weights_t(Xg, diag, name=name)
        w = w_t.T
    else:
        K, _, _ = _blocks(X, jnp.zeros(n, X.dtype), NNarray, length, nugget,
                          name, nd)
        L = _chol_chunked(K)
        # w^T = L[-1,:-1] @ inv(L[:-1,:-1]) => w = solve(L[:-1,:-1]^T, L[-1,:-1])
        w = linalg.bwd_solve_small(L[:, :-1, :-1], L[:, -1, :-1])
        sigma = L[:, -1, -1]
    idx_asc = jnp.where(valid, rev, 0)[:, :-1]
    w = jnp.where(valid[:, :-1], w, 0.0)
    return w, sigma, idx_asc, valid


def _unitri_inverse(W):
    """(..., B, B) inverse of (I - W) for strictly-lower-triangular W via
    Neumann doubling: (I-W)^{-1} = prod_k (I + W^{2^k}).  W is nilpotent
    (W^B = 0), so ceil(log2(B)) doubling steps are exact.  All work is
    batched (B, B) matmuls -- MXU-native, unlike a sequential substitution."""
    B = W.shape[-1]
    eye = jnp.eye(B, dtype=W.dtype)
    M = eye + W
    A = W
    steps = max(1, int(np.ceil(np.log2(max(B, 2)))))
    for _ in range(steps - 1):
        A = A @ A
        M = M + M @ A
    return M


def ancestral_sample(eps, w, idx_asc, block=512):
    """Vecchia ancestral pass x_i = w_i . x_{N(i)} + eps_i, solved in
    O(n/block) sequential steps instead of n.

    The recursion is x = (I - W)^{-1} eps with W the (n, n) strictly-lower
    weight matrix (rows = w at columns idx_asc).  Split the ordering into
    blocks of size `block`: cross-block terms are sparse gathers from
    already-computed entries; within-block coupling is solved by a
    precomputed dense per-block inverse (batched over blocks).  Replaces the
    reference's O(n) sequential loop (dgpsi/vecchia.py:122-140) with a few
    MXU matmuls per block.

    Args:
        eps: (S, n) independent noise, already scaled by the conditional sd.
        w: (n, m) conditional weights (0 on padded lanes).
        idx_asc: (n, m) ascending neighbour indices (0 on padded lanes).
    Returns:
        (S, n) samples.
    """
    S, n = eps.shape
    m = w.shape[1]
    if n > 32768:
        block = min(block, 256)  # doubling FLOPs grow as n * B^2 * log B
    elif block == 512:
        # default tuning: at moderate n the per-step launch cost of ~n/B
        # sequential scan steps is cheap, while the block-inverse doubling
        # matmuls scale as B^2 per point -- smaller blocks win (measured
        # ~2.2x faster at n=2000 with B=128 vs 512 on v5e)
        block = 128
    B = min(block, max(64, 1 << int(np.ceil(np.log2(max(n, 2))))))
    n_pad = ((n + B - 1) // B) * B
    nb = n_pad // B
    if n_pad != n:
        eps = jnp.pad(eps, ((0, 0), (0, n_pad - n)))
        w = jnp.pad(w, ((0, n_pad - n), (0, 0)))
        idx_asc = jnp.pad(idx_asc, ((0, n_pad - n), (0, 0)))

    # dense within-block weight matrices (nb, B, B): scatter each row's
    # in-block neighbour weights to local columns
    base = (jnp.arange(n_pad, dtype=idx_asc.dtype) // B) * B
    rel = idx_asc - base[:, None]                       # (n_pad, m)
    in_blk = (rel >= 0) & (w != 0)
    # masked lanes -> index B, which matches no column in [0, B) below and
    # drops out naturally.  Built as a compare-select reduction over the m
    # neighbour lanes rather than a scatter: the scatter form measured
    # ~15 ms/iter at n=1e5 on v5e, the fused one-hot reduction ~2 ms.
    rel_safe = jnp.where(in_blk, rel, B)
    cols_r = jnp.arange(B, dtype=rel.dtype)
    w_in = jnp.where(in_blk, w, 0.0)
    Wflat = jnp.sum(jnp.where(rel_safe[:, :, None] == cols_r[None, None, :],
                              w_in[:, :, None], 0.0), axis=1)
    W_bb = Wflat.reshape(nb, B, B)
    M = _unitri_inverse(W_bb)                           # (nb, B, B)

    w_cross = jnp.where(in_blk, 0.0, w)                 # only earlier-block terms
    idx_b = idx_asc.reshape(nb, B, m)
    w_cross_b = w_cross.reshape(nb, B, m)
    eps_b = eps.reshape(S, nb, B)

    def body(x, b):
        gathered = x[:, b['idx']]                       # (S, B, m)
        c = b['eps'] + jnp.einsum('sbm,bm->sb', gathered, b['wc'])
        xb = jnp.einsum('ij,sj->si', b['M'], c)
        x = jax.lax.dynamic_update_slice(x, xb, (0, b['off']))
        return x, None

    blocks = {'idx': idx_b, 'wc': w_cross_b, 'M': M,
              'eps': jnp.moveaxis(eps_b, 1, 0),
              'off': jnp.arange(nb) * B}
    x, _ = jax.lax.scan(body, jnp.zeros((S, n_pad), eps.dtype), blocks)
    return x[:, :n]


def fmvn_sp(key, X, NNarray, scale, length, nugget, name, S=None):
    """Draw S samples (default: one, shape (n,)) from the Vecchia-approximated
    N(0, scale*K) (reference fmvn_sp) by blocked ancestral sampling."""
    n = X.shape[0]
    squeeze = S is None
    S_ = 1 if squeeze else S
    w, sigma, idx_asc, _ = cond_weights(X, NNarray, length, nugget, name)
    eps = (jax.random.normal(key, (S_, n), X.dtype)
           * jnp.sqrt(scale) * sigma[None, :])
    x = ancestral_sample(eps, w, idx_asc)
    return x[0] if squeeze else x


def post_het_vecch(key, X, impNN, Gamma, y_eff, scale, length, nugget, name):
    """One draw from the exact conditional posterior of the Hetero mean under
    the Vecchia approximation (reference `U_matrix_sp` + `post_het_vecch`,
    dgpsi/vecchia.py:612-622, likelihood_class.py:153-182), fully batched.

    Model: f ~ N(0, scale*K) (Vecchia-approximated), y_i = f_i + N(0, Gamma_i).
    The reference stacks (observations, latents) into a 2n sequence and
    Vecchia-factorises the joint: column i conditions latent f_i on its own
    observation y_i, the PRIOR latents among its m-1 nearest neighbours, and
    the observations of its FUTURE neighbours.  With u_i = L_i^{-T} e_last
    the sparse factor satisfies  f | y ~ N(-U_l^{-T} U_o^T y, U_l^{-T}U_l^{-1}).
    The upper-triangular solve has the ancestral-recursion form, so it runs
    through the blocked `ancestral_sample` (a few MXU matmuls per block)
    instead of a sequential sparse substitution.

    All inputs in Vecchia order; returns an (n,) sample in the same order.

    Args:
        X: (n, d) ordered inputs.  impNN: (n, m-1) self-excluded NN indices.
        Gamma: (n,) noise variances.  y_eff: (n,) effective observations.
    """
    n = X.shape[0]
    dt = X.dtype
    ar = jnp.arange(n)
    is_prev = impNN < ar[:, None]
    idx = jnp.concatenate([impNN, ar[:, None], ar[:, None]], axis=1)  # (n, m+1)
    m1 = idx.shape[1]
    # slot s is a latent copy if it's a PRIOR neighbour, or the final self slot
    is_lat = jnp.concatenate(
        [is_prev, jnp.zeros((n, 1), bool), jnp.ones((n, 1), bool)], axis=1)
    Xi = X[idx]
    K = scale * kops.k_cross(Xi, Xi, length, name)
    jitter = jnp.maximum(1e-10, _f32_jitter(dt) * scale)
    diag = (jnp.diagonal(K, axis1=-2, axis2=-1)
            + jnp.where(is_lat, 0.0, Gamma[idx]) + jitter)
    K = kops.set_diag(K, diag)
    L = _chol_chunked(K)
    e_last = jnp.zeros((n, m1), dt).at[:, -1].set(1.0)
    u = linalg.bwd_solve_small(L, e_last)           # (n, m+1) = L^{-T} e_last

    # b_i = -(U_o^T y)_i + eps_i  over observation slots
    obs_contrib = jnp.sum(jnp.where(is_lat, 0.0, u * y_eff[idx]), axis=1)
    eps = jax.random.normal(key, (n,), dt)
    u_self = u[:, -1]
    b = (-obs_contrib + eps) / u_self
    # prior-latent slots (the first m-1 NN entries) drive the recursion
    u_nn = u[:, :impNN.shape[1]]
    w = jnp.where(is_prev, -u_nn / u_self[:, None], 0.0)
    idx_prev = jnp.where(is_prev, impNN, 0)
    return ancestral_sample(b[None, :], w, idx_prev)[0]


# ----------------------------------------------------------------------
# predictions
# ----------------------------------------------------------------------
def _pred_blocks(x, w_train, NNarray, y, length, nugget, nugget_diag, name):
    """(M, m+1, m+1) blocks: [train NN ascending..., test point last]."""
    valid = NNarray >= 0
    safe = jnp.where(valid, NNarray, 0)
    Wi = w_train[safe]                       # (M, m, d)
    Xi = jnp.concatenate([Wi, x[:, None, :]], axis=1)
    yi = jnp.where(valid, y[safe], 0.0)
    nug = jnp.concatenate([nugget * nugget_diag[safe],
                           jnp.full((x.shape[0], 1), nugget, x.dtype)], axis=1)
    K = kops.k_cross(Xi, Xi, length, name)
    valid_full = jnp.concatenate([valid, jnp.ones((x.shape[0], 1), bool)], axis=1)
    both = valid_full[:, :, None] & valid_full[:, None, :]
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)
    K = jnp.where(both, K, eye)
    K = kops.set_diag(K, jnp.where(valid_full, 1.0 + nug + _f32_jitter(K.dtype), 1.0))
    return K, yi


def gp_vecch(x, w_train, NNarray, y, scale, length, nugget, nugget_diag, name,
             extra_jit=0.0):
    """Batched Vecchia GP prediction (reference gp_vecch).

    ``extra_jit`` is an additional diagonal used by the callers' host-level
    jitter-escalation retry (prediction blocks can be much larger than the
    training m, where the fixed f32 floor may not suffice); it is a traced
    scalar so the retry reuses the same compiled program."""
    K, yi = _pred_blocks(x, w_train, NNarray, y, length, nugget, nugget_diag, name)
    K = K + extra_jit * jnp.eye(K.shape[-1], dtype=K.dtype)
    L = _chol_chunked(K)
    Ly = linalg.fwd_solve_small(L[:, :-1, :-1], yi)
    mean = jnp.einsum('ij,ij->i', L[:, -1, :-1], Ly)
    var = scale * L[:, -1, -1] ** 2
    return mean, var


def loo_gp_vecch(x, NNarray, y, scale, length, nugget, nugget_diag, name,
                 extra_jit=0.0):
    """Batched LOO under Vecchia (reference loo_gp_vecch): NNarray rows are
    self-inclusive NN (self first); the block is reversed so self sits last
    and is predicted from the others."""
    rev = jnp.flip(NNarray, axis=1)
    valid = rev >= 0
    safe = jnp.where(valid, rev, 0)
    Xi = x[safe]
    yi = jnp.where(valid, y[safe], 0.0)
    nug = nugget * nugget_diag[safe]
    K = kops.k_cross(Xi, Xi, length, name)
    both = valid[:, :, None] & valid[:, None, :]
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)
    K = jnp.where(both, K, eye)
    K = kops.set_diag(K, jnp.where(valid, 1.0 + nug + _f32_jitter(K.dtype), 1.0))
    K = K + extra_jit * jnp.eye(K.shape[-1], dtype=K.dtype)
    L = _chol_chunked(K)
    Ly = linalg.fwd_solve_small(L[:, :-1, :-1], yi[:, :-1])
    mean = jnp.einsum('ij,ij->i', L[:, -1, :-1], Ly)
    var = scale * L[:, -1, -1] ** 2
    return mean, var


def link_gp_vecch(m, v, z, w1, global_w1, NNarray, y, scale, length, nugget,
                  nugget_diag, name, extra_jit=0.0):
    """Batched linked-GP prediction under Vecchia (reference link_gp_vecch):
    per test point, closed-form I/J moments over its conditioning set."""
    from ..ops import moments

    Dw = w1.shape[1]
    Dz = 0 if z is None else z.shape[1]
    full_len = jnp.broadcast_to(length, (Dw + Dz,))
    length_w, length_z = full_len[:Dw], full_len[Dw:]

    valid = NNarray >= 0
    safe = jnp.where(valid, NNarray, 0)

    def one(i):
        idx = safe[i]
        ok = valid[i]
        wi = w1[idx]
        yi = jnp.where(ok, y[idx], 0.0)
        nug_i = nugget * nugget_diag[idx] + extra_jit
        I, J = moments.IJ(wi, m[i], v[i], length_w, name)
        if z is not None:
            gwi = global_w1[idx]
            Iz = kops.k_vec(gwi, z[i], length_z, name)
            I = I * Iz
            J = J * jnp.outer(Iz, Iz)
            Xi = jnp.concatenate([wi, gwi], axis=1)
        else:
            Xi = wi
        I = jnp.where(ok, I, 0.0)
        J = jnp.where(ok[:, None] & ok[None, :], J, 0.0)
        K = kops.k_cross(Xi, Xi, full_len, name)
        both = ok[:, None] & ok[None, :]
        eye = jnp.eye(K.shape[-1], dtype=K.dtype)
        K = jnp.where(both, K, eye)
        K = kops.set_diag(K, jnp.where(ok, 1.0 + nug_i + _f32_jitter(K.dtype), 1.0))
        L = linalg.chol_small(K)
        Rinv_y = linalg.bwd_solve_small(L, linalg.fwd_solve_small(L, yi))
        # tr(K^-1 J) = tr(L^-1 J L^-T) via two column-unrolled solves:
        # A = (L^-1 J)^T, then diag(L^-1 J L^-T)_i = (L^-1 A^T[., i])_i
        A = linalg.fwd_solve_small(L, J)
        N = linalg.fwd_solve_small(L, A.T)
        tr = jnp.trace(N)
        mu = jnp.dot(I, Rinv_y)
        var = jnp.abs(linalg.quad_form(J, Rinv_y) - mu**2
                      + scale * (1.0 + nugget - tr))
        return mu, var

    # vmapped (not lax.map'ed) so the row axis stays data-parallel and can be
    # sharded across devices by GSPMD; intermediates are (M, m+1, m+1).
    return jax.vmap(one)(jnp.arange(m.shape[0]))
