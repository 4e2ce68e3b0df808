"""Real-TPU tests of the Mosaic-lowered Pallas kernels (run with
``DGP_TPU_TESTS=1 python -m pytest tests/test_tpu.py -m tpu -q``).

The default suite exercises these kernels in interpret mode only (semantics,
not lowering — tests/test_pallas.py).  Here each kernel runs twice on the
chip with identical inputs: once Mosaic-compiled, once in interpret mode
(pure-XLA execution of the same program), and the outputs must agree to
float32 tolerance.  A final integration check compares the auto-selected
fused f32 pipeline against the batched-XLA fallback path for both the
log-lik value and the analytic gradient (ref: dgpsi/vecchia.py:164-242).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        not os.environ.get("DGP_TPU_TESTS")
        or jax.default_backend() != "tpu",
        reason="needs DGP_TPU_TESTS=1 and a real TPU backend"),
]

from dgp_tpu.ops import pallas_vecchia as pv  # noqa: E402
from dgp_tpu.vecchia import core as vcore  # noqa: E402
from dgp_tpu.vecchia import nn as vnn  # noqa: E402


def _setup(n=300, d=2, m=9, seed=0):
    rs = np.random.RandomState(seed)
    X = rs.uniform(size=(n, d)).astype(np.float32)
    y = (np.sin(3 * X[:, 0]) + X[:, -1]).astype(np.float32)
    NN = vnn.nn(np.float64(X), m)
    nd = np.ones(n, np.float32)
    return jnp.asarray(X), jnp.asarray(y), jnp.asarray(NN), jnp.asarray(nd)


def _mosaic_vs_interpret(fn, monkeypatch):
    """Run fn() Mosaic-compiled and in interpret mode; return both pytrees."""
    monkeypatch.setattr(pv, "_interpret", lambda: False)
    mosaic = jax.tree.map(np.asarray, fn())
    monkeypatch.setattr(pv, "_interpret", lambda: True)
    interp = jax.tree.map(np.asarray, fn())
    return mosaic, interp


@pytest.mark.parametrize("name", ["sexp", "matern2.5"])
@pytest.mark.parametrize("n", [300, 1100])
def test_forward_kernels_mosaic(name, n, monkeypatch):
    X, y, NN, nd = _setup(n=n)
    length = jnp.asarray([0.4, 0.7], jnp.float32)
    nugget = np.float32(1e-3)
    jit = vcore._f32_jitter(jnp.float32)

    Xg, yg, diag = pv.gather_blocks(X, y, NN, length, nugget, nd, jit)
    Xt, yt, dt_ = pv.gather_scale_t(X, y, NN, length, nugget, nd, jit)

    (m0, i0) = _mosaic_vs_interpret(
        lambda: pv.block_loglik_parts(Xg, yg, diag, name=name), monkeypatch)
    np.testing.assert_allclose(m0, i0, rtol=2e-4, atol=1e-5)

    (m1_, i1) = _mosaic_vs_interpret(
        lambda: pv.block_loglik_parts_t(Xt, yt, dt_, name=name), monkeypatch)
    np.testing.assert_allclose(m1_, i1, rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("name", ["sexp", "matern2.5"])
def test_multi_candidate_kernel_mosaic(name, monkeypatch):
    """The K-candidate ESS evaluator (cos*A + sin*B + C) on the chip."""
    X, y, NN, nd = _setup(n=300, d=1, seed=1)
    length = jnp.asarray([0.4], jnp.float32)
    nugget = np.float32(1e-3)
    jit = vcore._f32_jitter(jnp.float32)
    A, yt, dt_ = pv.gather_scale_t(X, y, NN, length, nugget, nd, jit)
    rs = np.random.RandomState(2)
    B = jnp.asarray(rs.uniform(-.5, .5, A.shape), jnp.float32)
    C = jnp.zeros_like(A)
    K = 8
    ang = np.linspace(0.1, 2 * np.pi, K, dtype=np.float32)
    cosv, sinv = jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))

    mo, it = _mosaic_vs_interpret(
        lambda: pv.block_loglik_multi_t(A, B, C, yt, dt_, cosv, sinv,
                                        name=name), monkeypatch)
    # Elementwise: Mosaic vs interpret differ by f32 accumulation order
    # (verified no candidate-row misalignment: shifted-candidate error is
    # O(1) while same-candidate error is ~1e-4).  The consumed quantity is
    # the per-candidate f64-reduced sum, which must agree tightly.
    np.testing.assert_allclose(mo, it, rtol=1e-2, atol=5e-4)
    for a, b in zip(mo, it):
        np.testing.assert_allclose(a.astype(np.float64).sum(axis=1),
                                   b.astype(np.float64).sum(axis=1),
                                   rtol=5e-4)


@pytest.mark.parametrize("name", ["sexp", "matern2.5"])
@pytest.mark.parametrize("nugget_est", [True, False])
def test_gradient_kernel_mosaic(name, nugget_est, monkeypatch):
    X, y, NN, nd = _setup(n=300, seed=3)
    length = jnp.asarray([0.5, 0.8], jnp.float32)
    nugget = np.float32(2e-3)
    jit = vcore._f32_jitter(jnp.float32)

    Xt_r, yt_r, nugt_r, valt_r = pv.gather_raw_t(X, y, NN, nd)
    Xt2, diagt2, dnugt2 = pv.scale_blocks_t(Xt_r, nugt_r, valt_r, length,
                                            nugget, jit)
    mo, it = _mosaic_vs_interpret(
        lambda: pv.block_nllik_grad_parts_t(
            Xt2, yt_r, diagt2, dnugt2, name=name, n_length=2,
            nugget_est=nugget_est), monkeypatch)
    for a, b in zip(mo, it):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=1e-4)


@pytest.mark.parametrize("name", ["sexp", "matern2.5"])
def test_cond_weights_kernel_mosaic(name, monkeypatch):
    X, y, NN, nd = _setup(n=300, seed=4)
    length = jnp.asarray([0.5, 0.8], jnp.float32)
    nugget = np.float32(1e-3)
    jit = vcore._f32_jitter(jnp.float32)
    Xt, _, dt_ = pv.gather_scale_t(X, X[:, 0], NN, length, nugget, nd, jit)

    mo, it = _mosaic_vs_interpret(
        lambda: pv.cond_weights_t(Xt, dt_, name=name), monkeypatch)
    for a, b in zip(mo, it):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=5e-4)


@pytest.mark.parametrize("name", ["sexp", "matern2.5"])
def test_fused_vs_xla_loglik_and_grad(name, monkeypatch):
    """Integration: the auto-selected fused f32 path (use_pallas -> Mosaic on
    TPU) agrees with the batched-XLA fallback for the Vecchia log-lik and
    the analytic nllik gradient."""
    X, y, NN, nd = _setup(n=300, seed=5)
    length = jnp.asarray([0.5, 0.8], jnp.float32)
    nugget, scale = np.float32(2e-3), np.float32(1.3)

    assert pv.use_pallas(X.dtype, NN.shape[1])
    ll_fused = float(vcore.vecchia_llik(X, y, NN, scale, length, nugget,
                                        nd, name))
    lt = jnp.log(jnp.concatenate([length, jnp.asarray([nugget])]))
    kw = dict(name=name, scale_est=True, nugget_est=True,
              fixed_scale=jnp.asarray(2.0, jnp.float32),
              fixed_nugget=jnp.asarray(nugget),
              n_orig=jnp.asarray(float(X.shape[0]), jnp.float32),
              sum_residual=None)
    nll_f, g_f, sc_f = vcore.vecchia_nllik_fg(lt, X, y, NN, nd,
                                              n_length=2, **kw)

    monkeypatch.setattr(pv, "use_pallas", lambda *a: False)
    ll_x = float(vcore.vecchia_llik(X, y, NN, scale, length, nugget, nd, name))
    nll_x, sc_x = vcore.vecchia_nllik(lt, X, y, NN, nd, **kw)
    g_x = jax.grad(lambda t: vcore.vecchia_nllik(t, X, y, NN, nd, **kw)[0])(lt)

    assert abs(ll_fused - ll_x) / abs(ll_x) < 5e-3
    np.testing.assert_allclose(float(nll_f), float(nll_x), rtol=5e-3)
    np.testing.assert_allclose(float(sc_f), float(sc_x), rtol=5e-3)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x),
                               rtol=2e-2, atol=5e-3)
