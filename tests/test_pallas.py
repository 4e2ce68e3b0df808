"""Pallas fused Vecchia kernels, run in interpret mode on CPU against the
batched-XLA reference path (values AND analytic gradients, sexp + matern,
padded rows, nugget_est on/off, isotropic + per-dim lengthscales), plus a
float32 tolerance check of the fused pipeline.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgp_tpu.ops import pallas_vecchia as pv
from dgp_tpu.vecchia import core as vcore
from dgp_tpu.vecchia import nn as vnn


def _setup(n=70, d=2, m=9, dtype=np.float64, seed=0):
    rs = np.random.RandomState(seed)
    X = rs.uniform(size=(n, d)).astype(dtype)
    y = np.sin(3 * X[:, 0]).astype(dtype) + X[:, -1].astype(dtype)
    NN = vnn.nn(X, m)
    nd = np.ones(n, dtype)
    return jnp.asarray(X), jnp.asarray(y), jnp.asarray(NN), jnp.asarray(nd)


@pytest.mark.parametrize("name", ["sexp", "matern2.5"])
def test_block_loglik_parts_matches_xla(name):
    X, y, NN, nd = _setup()
    length = jnp.asarray([0.4, 0.7])
    nugget, scale = 1e-3, 1.3

    Xg, yg, diag = pv.gather_blocks(X, y, NN, length, nugget, nd, 0.0)
    logdet_p, quad_p = pv.block_loglik_parts(Xg, yg, diag, name=name)

    K, yi, _ = vcore._blocks(X, y, NN, length, nugget, name, nd)
    from dgp_tpu.ops import linalg
    L = linalg.chol_small(K)
    Ly = linalg.fwd_solve_small(L, yi)
    quad_x = Ly[:, -1] ** 2
    logdet_x = 2.0 * jnp.log(jnp.abs(L[:, -1, -1]))

    np.testing.assert_allclose(np.asarray(logdet_p), np.asarray(logdet_x),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(quad_p), np.asarray(quad_x),
                               rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("name", ["sexp", "matern2.5"])
@pytest.mark.parametrize("nugget_est", [True, False])
@pytest.mark.parametrize("n_length", [1, 2])
def test_block_grad_matches_autodiff(name, nugget_est, n_length):
    X, y, NN, nd = _setup(seed=1)
    length = np.array([0.5] if n_length == 1 else [0.5, 0.8])
    nugget = 2e-3
    lt = jnp.asarray(np.log(np.concatenate([length, [nugget]]) if nugget_est
                            else np.log(length) * 0 + np.log(length)))
    if nugget_est:
        lt = jnp.asarray(np.log(np.concatenate([length, [nugget]])))
    else:
        lt = jnp.asarray(np.log(length))
    kw = dict(name=name, scale_est=True, nugget_est=nugget_est,
              fixed_scale=jnp.asarray(2.0), fixed_nugget=jnp.asarray(nugget),
              n_orig=jnp.asarray(float(X.shape[0])), sum_residual=None)

    nll_p, g_p, scale_p = vcore.vecchia_nllik_fg(
        lt, X, y, NN, nd, n_length=n_length, **kw)

    def f(t):
        return vcore.vecchia_nllik(t, X, y, NN, nd, **kw)[0]

    nll_x, scale_x = vcore.vecchia_nllik(lt, X, y, NN, nd, **kw)
    g_x = jax.grad(f)(lt)
    np.testing.assert_allclose(float(nll_p), float(nll_x), rtol=1e-9)
    np.testing.assert_allclose(float(scale_p), float(scale_x), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-7, atol=1e-10)


def test_block_grad_with_replicates_and_prior():
    """Replicate weights (W_diag semantics) + half-Cauchy-style prior grads."""
    X, y, NN, _ = _setup(seed=2)
    n = X.shape[0]
    rs = np.random.RandomState(3)
    nd = jnp.asarray(1.0 / rs.randint(1, 4, size=n).astype(np.float64))
    sum_res = jnp.asarray(0.37)
    n_orig = jnp.asarray(float(n) * 1.8)
    lt = jnp.asarray(np.log([0.6, 0.9, 5e-3]))
    kw = dict(name='sexp', scale_est=True, nugget_est=True,
              fixed_scale=jnp.asarray(1.0), fixed_nugget=jnp.asarray(5e-3),
              n_orig=n_orig, sum_residual=sum_res)
    prior_coef = jnp.asarray([1.2, 0.3])

    nll_p, g_p, _ = vcore.vecchia_nllik_fg(
        lt, X, y, NN, nd, n_length=2, prior_name='ga', prior_coef=prior_coef, **kw)

    from dgp_tpu import gp_core

    def f(t):
        nll, _ = vcore.vecchia_nllik(t, X, y, NN, nd, **kw)
        nll -= gp_core.log_prior(jnp.exp(t[:-1]), jnp.exp(t[-1]), prior_name='ga',
                                 prior_coef=prior_coef, nugget_est=True, cl=None)
        return nll

    np.testing.assert_allclose(float(nll_p), float(f(lt)), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(jax.grad(f)(lt)),
                               rtol=1e-7, atol=1e-10)


def test_fused_pipeline_float32_tolerance():
    """The f32 path (fixed jitter, sentinel padding, f64 accumulation) stays
    within float32-appropriate tolerance of the f64 XLA computation."""
    X64, y64, NN, nd64 = _setup(n=300, d=1, m=12, seed=4)
    length = jnp.asarray([0.3])
    nugget, scale = 1e-3, 1.0

    ll64 = float(vcore.vecchia_llik(X64, y64, NN, scale, length, nugget,
                                    nd64, 'sexp'))

    X32 = X64.astype(jnp.float32)
    y32 = y64.astype(jnp.float32)
    nd32 = nd64.astype(jnp.float32)
    Xg, yg, diag = pv.gather_blocks(X32, y32, NN, length.astype(jnp.float32),
                                    np.float32(nugget), nd32,
                                    vcore._f32_jitter(jnp.float32))
    logdet_i, quad_i = pv.block_loglik_parts(Xg, yg, diag, name='sexp')
    from dgp_tpu.ops import linalg
    ll32 = float(-0.5 * (linalg.sum64(logdet_i)
                         + linalg.sum64(quad_i) / np.float64(scale)))
    # |llik| is O(n); f32 per-block noise + 3e-5 jitter shift the total by a
    # relative amount ~1e-4
    assert abs(ll32 - ll64) / abs(ll64) < 5e-3, (ll32, ll64)


@pytest.mark.parametrize("name", ["sexp", "matern2.5"])
def test_transposed_layout_matches_row_layout(name):
    """The (m1, d, n) transposed gather/kernel path must reproduce the
    (n, m1, d) path exactly (values and gradients)."""
    X, y, NN, nd = _setup(seed=6)
    length = jnp.asarray([0.5, 0.9])
    nugget = 1e-3

    Xg, yg, diag = pv.gather_blocks(X, y, NN, length, nugget, nd, 0.0)
    ld0, q0 = pv.block_loglik_parts(Xg, yg, diag, name=name)
    Xt, yt, dt_ = pv.gather_scale_t(X, y, NN, length, nugget, nd, 0.0)
    ld1, q1 = pv.block_loglik_parts_t(Xt, yt, dt_, name=name)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q0), rtol=1e-12)

    Xg_r, yg_r, nug_r, val_r = pv.gather_raw(X, y, NN, nd)
    Xg2, diag2, dnug2 = pv.scale_blocks(Xg_r, nug_r, val_r, length, nugget, 0.0)
    out0 = pv.block_nllik_grad_parts(Xg2, yg_r, diag2, dnug2, name=name,
                                     n_length=2, nugget_est=True)
    Xt_r, yt_r, nugt_r, valt_r = pv.gather_raw_t(X, y, NN, nd)
    Xt2, diagt2, dnugt2 = pv.scale_blocks_t(Xt_r, nugt_r, valt_r, length,
                                            nugget, 0.0)
    out1 = pv.block_nllik_grad_parts_t(Xt2, yt_r, diagt2, dnugt2, name=name,
                                       n_length=2, nugget_est=True)
    for a, b in zip(out1, out0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


@pytest.mark.parametrize("name", ["sexp", "matern2.5"])
def test_cond_weights_pallas_matches_xla(name, monkeypatch):
    """The fused conditional-weights kernel (ancestral sampling precompute)
    must reproduce the batched-XLA solve."""
    X, y, NN, nd = _setup(n=90, seed=7)
    length = jnp.asarray([0.5, 0.8])
    nugget = 1e-3
    w0, s0, i0, v0 = vcore.cond_weights(X, NN, length, nugget, name)
    monkeypatch.setattr(pv, "use_pallas", lambda *a: True)
    w1, s1, i1, v1 = vcore.cond_weights(X, NN, length, nugget, name)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w0), rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-9)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))


@pytest.mark.parametrize("name", ["sexp", "matern2.5"])
def test_multi_candidate_factored_static_dims(name):
    """block_loglik_multi_t with dl < d (candidate-invariant trailing global
    dims factored into a once-per-slab correlation scratch) must reproduce
    the full per-candidate build, including sentinel-padded invalid lanes
    (mirrors CompiledDGP._build_angle_plan's view construction)."""
    rs = np.random.RandomState(11)
    m1, dl, dg, n, K = 6, 2, 2, 300, 7
    d = dl + dg
    A = np.zeros((m1, d, n))
    B = np.zeros((m1, d, n))
    A[:, :dl] = rs.uniform(-1, 1, (m1, dl, n))
    B[:, :dl] = rs.uniform(-1, 1, (m1, dl, n))
    C = np.zeros((m1, d, n))
    C[:, dl:] = rs.uniform(-1, 1, (m1, dg, n))
    # invalid lanes: sentinel coordinates on ALL dims, unit diag, zero target
    valid = rs.uniform(size=(m1, n)) > 0.15
    valid[-1] = True
    sent = 1e7 + rs.uniform(0, 1e3, (m1, n))
    for t in range(d):
        C[:, t] = np.where(valid, C[:, t], sent)
        A[:, t] = np.where(valid, A[:, t], 0.0)
        B[:, t] = np.where(valid, B[:, t], 0.0)
    yg = np.where(valid, rs.uniform(-1, 1, (m1, n)), 0.0)
    diag = np.where(valid, 1.0 + 1e-3, 1.0)
    ang = np.linspace(0.1, 2 * np.pi, K)
    cosv, sinv = jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))
    args = (jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
            jnp.asarray(yg), jnp.asarray(diag), cosv, sinv)

    ld_full, q_full = pv.block_loglik_multi_t(*args, name=name)
    ld_fac, q_fac = pv.block_loglik_multi_t(*args, name=name, dl=dl)
    np.testing.assert_allclose(np.asarray(ld_fac), np.asarray(ld_full),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(q_fac), np.asarray(q_full),
                               rtol=1e-9, atol=1e-11)


def test_grid_covers_multiple_slabs():
    """n larger than one slab exercises the grid path with padding."""
    X, y, NN, nd = _setup(n=1100, d=1, m=5, seed=5)
    length = jnp.asarray([0.4])
    Xg, yg, diag = pv.gather_blocks(X, y, NN, length, 1e-3, nd, 0.0)
    logdet_p, quad_p = pv.block_loglik_parts(Xg, yg, diag, name='sexp')

    K, yi, _ = vcore._blocks(X, y, NN, length, 1e-3, 'sexp', nd)
    from dgp_tpu.ops import linalg
    L = vcore._chol_chunked(K)
    Ly = linalg.fwd_solve_small(L, yi)
    np.testing.assert_allclose(np.asarray(quad_p), np.asarray(Ly[:, -1] ** 2),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(logdet_p),
        np.asarray(2.0 * jnp.log(jnp.abs(L[:, -1, -1]))), rtol=1e-8, atol=1e-12)
