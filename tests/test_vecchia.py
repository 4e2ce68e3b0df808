"""Vecchia subsystem tests.

The central golden property: with a full conditioning set (m = n-1) the
Vecchia approximation is EXACT, so every Vecchia op must match its dense
counterpart to numerical precision.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgp_tpu import rng, gp_core
from dgp_tpu.vecchia import nn as vnn
from dgp_tpu.vecchia import core as vcore
from dgp_tpu.models.node import kernel, combine
from dgp_tpu.models.gp import gp
from dgp_tpu.models.dgp import dgp
from dgp_tpu.models.emulation import emulator
from dgp_tpu.ops import kernels as kops
from dgp_tpu.ops import linalg


def _seed(s):
    np.random.seed(s)
    rng.seed(s)


def test_nn_ordered_against_bruteforce():
    _seed(0)
    X = np.random.normal(size=(40, 2))
    m = 6
    NN = vnn.nn(X, m)
    assert NN.shape == (40, m + 1)
    for i in range(40):
        d = np.sum((X[:i + 1] - X[i]) ** 2, axis=1)
        order = np.argsort(d)[:min(m + 1, i + 1)]
        expected = set(order.tolist())
        got = set(int(j) for j in NN[i] if j >= 0)
        assert got == expected, (i, got, expected)
        # descending order with -1 padding at the tail
        vals = NN[i][NN[i] >= 0]
        assert np.all(np.diff(vals) < 0)


def test_get_pred_nn_against_bruteforce():
    _seed(1)
    X = np.random.normal(size=(30, 2))
    Q = np.random.normal(size=(7, 2))
    NN = vnn.get_pred_nn(Q, X, 5)
    for i in range(7):
        d = np.sum((X - Q[i]) ** 2, axis=1)
        expected = np.argsort(d)[:5]
        np.testing.assert_array_equal(np.sort(NN[i]), np.sort(expected))
        assert NN[i][0] == expected[0]  # nearest first


@pytest.mark.parametrize("name", ["sexp", "matern2.5"])
def test_vecchia_llik_exact_with_full_conditioning(name):
    _seed(2)
    n = 20
    X = np.random.uniform(size=(n, 1))
    y = np.sin(4 * X[:, 0])
    length = np.array([0.4])
    scale, nugget = 1.7, 1e-4
    ordv = np.random.permutation(n)
    NN = vnn.nn(X[ordv], n - 1)
    ll_v = float(vcore.vecchia_llik(jnp.asarray(X[ordv]), jnp.asarray(y[ordv]),
                                    jnp.asarray(NN), scale, jnp.asarray(length),
                                    nugget, jnp.ones(n), name))
    # dense equivalent with the same constant convention:
    K = np.asarray(kops.k_matrix(jnp.asarray(X), jnp.asarray(length), nugget, name))
    L = np.linalg.cholesky(K)
    alpha = np.linalg.solve(K, y)
    ll_d = -0.5 * (2 * np.sum(np.log(np.diag(L))) + y @ alpha / scale)
    np.testing.assert_allclose(ll_v, ll_d, rtol=1e-8)


@pytest.mark.parametrize("scale_est", [pytest.param(True, marks=pytest.mark.slow), False])
def test_vecchia_nllik_exact_with_full_conditioning(scale_est):
    _seed(3)
    n = 15
    X = np.random.uniform(size=(n, 2))
    y = np.sin(3 * X[:, 0]) + X[:, 1]
    length = np.array([0.5, 0.8])
    nugget = 1e-3
    lt = np.log(np.concatenate([length, [nugget]]))
    ordv = np.random.permutation(n)
    NN = vnn.nn(X[ordv], n - 1)
    nll_v, scale_v = vcore.vecchia_nllik(
        jnp.asarray(lt), jnp.asarray(X[ordv]), jnp.asarray(y[ordv]),
        jnp.asarray(NN), jnp.ones(n), name='sexp', scale_est=scale_est,
        nugget_est=True, fixed_scale=jnp.asarray(2.0), fixed_nugget=jnp.asarray(nugget),
        n_orig=jnp.asarray(float(n)), sum_residual=None)
    nll_d, scale_d = gp_core.neg_log_lik(
        jnp.asarray(lt), jnp.asarray(X), jnp.asarray(y), name='sexp', n_length=2,
        scale_est=scale_est, nugget_est=True, fixed_scale=jnp.asarray(2.0),
        fixed_nugget=jnp.asarray(nugget), prior_name=None, prior_coef=None)
    np.testing.assert_allclose(float(nll_v), float(nll_d), rtol=1e-8)
    np.testing.assert_allclose(float(scale_v), float(scale_d), rtol=1e-8)
    # gradients agree too (autodiff through both paths)
    gv = jax.grad(lambda t: vcore.vecchia_nllik(
        t, jnp.asarray(X[ordv]), jnp.asarray(y[ordv]), jnp.asarray(NN),
        jnp.ones(n), name='sexp', scale_est=scale_est, nugget_est=True,
        fixed_scale=jnp.asarray(2.0), fixed_nugget=jnp.asarray(nugget),
        n_orig=jnp.asarray(float(n)), sum_residual=None)[0])(jnp.asarray(lt))
    gd = jax.grad(lambda t: gp_core.neg_log_lik(
        t, jnp.asarray(X), jnp.asarray(y), name='sexp', n_length=2,
        scale_est=scale_est, nugget_est=True, fixed_scale=jnp.asarray(2.0),
        fixed_nugget=jnp.asarray(nugget), prior_name=None, prior_coef=None)[0])(jnp.asarray(lt))
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gd), rtol=1e-6, atol=1e-8)


def test_gp_vecch_prediction_exact_with_full_conditioning():
    _seed(4)
    n = 18
    X = np.random.uniform(size=(n, 1))
    y = np.sin(5 * X)
    xt = np.random.uniform(size=(9, 1))
    length = np.array([0.3])
    scale, nugget = 1.2, 1e-5
    NN = vnn.get_pred_nn(xt, X, n)
    mv, vv = vcore.gp_vecch(jnp.asarray(xt), jnp.asarray(X), jnp.asarray(NN),
                            jnp.asarray(y[:, 0]), scale, jnp.asarray(length), nugget,
                            jnp.ones(n), 'sexp')
    Rinv, Rinv_y = gp_core.compute_stats(jnp.asarray(X), jnp.asarray(y[:, 0]),
                                         jnp.asarray(length), nugget, name='sexp')
    md, vd = gp_core.gp_predict(jnp.asarray(xt), jnp.asarray(X), Rinv, Rinv_y,
                                scale, jnp.asarray(length), nugget, name='sexp')
    np.testing.assert_allclose(np.asarray(mv), np.asarray(md), rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(vv), np.asarray(vd), rtol=1e-5, atol=1e-10)


def test_link_gp_vecch_exact_with_full_conditioning():
    _seed(5)
    n = 14
    W = np.random.uniform(size=(n, 1))
    y = np.cos(3 * W)
    m_in = np.random.uniform(size=(6, 1))
    v_in = 0.05 * np.random.uniform(size=(6, 1))
    length = np.array([0.5])
    scale, nugget = 0.9, 1e-5
    NN = vnn.get_pred_nn(m_in, W, n)
    mv, vv = vcore.link_gp_vecch(jnp.asarray(m_in), jnp.asarray(v_in), None,
                                 jnp.asarray(W), None, jnp.asarray(NN),
                                 jnp.asarray(y[:, 0]), scale, jnp.asarray(length),
                                 nugget, jnp.ones(n), 'sexp')
    Rinv, Rinv_y = gp_core.compute_stats(jnp.asarray(W), jnp.asarray(y[:, 0]),
                                         jnp.asarray(length), nugget, name='sexp')
    md, vd = gp_core.linkgp_predict(jnp.asarray(m_in), jnp.asarray(v_in), None,
                                    jnp.asarray(W), None, Rinv, Rinv_y, scale,
                                    jnp.asarray(length), nugget, name='sexp')
    np.testing.assert_allclose(np.asarray(mv), np.asarray(md), rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(vv), np.asarray(vd), rtol=1e-4, atol=1e-9)


def test_fmvn_sp_moments():
    """Ancestral Vecchia samples with full conditioning reproduce N(0, sK)."""
    _seed(6)
    n = 10
    X = np.random.uniform(size=(n, 1))
    length = np.array([0.5])
    scale, nugget = 2.0, 1e-4
    NN = vnn.nn(X, n - 1)
    keys = jax.random.split(jax.random.PRNGKey(0), 3000)
    f = jax.jit(lambda k: vcore.fmvn_sp(k, jnp.asarray(X), jnp.asarray(NN),
                                        scale, jnp.asarray(length), nugget, 'sexp'))
    samples = np.asarray(jax.vmap(f)(keys))
    K = scale * np.asarray(kops.k_matrix(jnp.asarray(X), jnp.asarray(length),
                                         nugget, 'sexp'))
    emp = np.cov(samples.T)
    np.testing.assert_allclose(emp, K, atol=0.25)


@pytest.mark.parametrize("block", [16, 64, 512])
def test_blocked_ancestral_matches_sequential(block):
    """The blocked (I-W)^{-1} solve must equal the sequential ancestral
    recursion exactly (same eps, same weights), including cross-block
    dependencies and padded lanes."""
    _seed(9)
    n, m = 150, 12
    X = np.random.uniform(size=(n, 2))
    NN = vnn.nn(X, m)
    length = jnp.asarray(np.array([0.4, 0.6]))
    w, sigma, idx_asc, _ = vcore.cond_weights(jnp.asarray(X), jnp.asarray(NN),
                                              length, 1e-4, 'sexp')
    S = 3
    eps = np.random.normal(size=(S, n)) * np.asarray(sigma)[None, :]
    w_np, idx_np = np.asarray(w), np.asarray(idx_asc)
    x_seq = np.zeros((S, n))
    for i in range(n):
        x_seq[:, i] = x_seq[:, idx_np[i]] @ w_np[i] + eps[:, i]
    x_blk = np.asarray(vcore.ancestral_sample(jnp.asarray(eps), w, idx_asc,
                                              block=block))
    np.testing.assert_allclose(x_blk, x_seq, rtol=5e-6, atol=1e-8)


def test_angle_loglik_matches_generic(monkeypatch):
    """The angle-combine ESS evaluator (cos*A + sin*B + C blocks) must equal
    the generic candidate log-lik for arbitrary angles."""
    from dgp_tpu.ops import pallas_vecchia as pv
    _seed(13)
    n = 40
    X = np.random.uniform(size=(n, 1))
    Y = np.sin(5 * X)
    model = dgp(X, Y, vecchia=True, m=6)
    eng = model.imp._engine()
    monkeypatch.setattr(pv, "use_pallas", lambda *a: True)  # interpret mode
    nn_state = eng.get_nn_state()
    latents, params = eng.get_state()
    nu = jnp.asarray(np.random.normal(size=np.asarray(latents[0]).shape))
    assert eng._angle_applicable(0)
    plan = eng._build_angle_plan(0, latents, params, nn_state, None, 1)
    A_list = [nd_['A0'] for nd_ in plan['nodes']]
    B_list = [eng._gather_latent_view(nd_, nu) for nd_ in plan['nodes']]
    ll_angles = eng._plan_ll(plan, 0, latents, nu, A_list, B_list)
    thetas = np.array([0.0, 0.3, 2.0, -1.2])
    lls = np.asarray(ll_angles(jnp.cos(jnp.asarray(thetas)),
                               jnp.sin(jnp.asarray(thetas))))

    f = latents[0]
    for t, got in zip(thetas, lls):
        fp = f * np.cos(t) + nu * np.sin(t)
        lat2 = (fp,) + tuple(latents[1:])
        want = float(eng._upper_loglik(0, lat2, params, nn_state))
        np.testing.assert_allclose(got, want, rtol=1e-8)

    # maintained views after an accepted angle equal a fresh gather
    c, s = np.cos(0.7), np.sin(0.7)
    f2 = c * f + s * nu
    A2 = [c * A + s * B for A, B in zip(A_list, B_list)]
    A2_fresh = [eng._gather_latent_view(nd_, f2) for nd_ in plan['nodes']]
    for a, b in zip(A2, A2_fresh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10,
                                   atol=1e-12)


def test_approx_nn_recall():
    """IVF approximate NN (method='approx') must recover almost all of the
    exact ordered neighbour sets on n=4096."""
    _seed(12)
    n, m = 4096, 10
    X = np.random.normal(size=(n, 2))
    exact = vnn.nn(X, m, method='exact')
    approx = vnn.nn(X, m, method='approx')
    hits = total = 0
    for i in range(0, n, 7):
        e = set(int(j) for j in exact[i] if j >= 0)
        a = set(int(j) for j in approx[i] if j >= 0)
        hits += len(e & a)
        total += len(e)
    recall = hits / total
    assert recall > 0.95, recall
    # unconstrained prediction-NN variant
    Q = np.random.normal(size=(300, 2))
    exact_p = vnn.get_pred_nn(Q, X, m, method='exact')
    approx_p = vnn.get_pred_nn(Q, X, m, method='approx')
    hits = sum(len(set(e) & set(a)) for e, a in zip(exact_p, approx_p))
    assert hits / exact_p.size > 0.95


def test_post_het_vecch_matches_dense_posterior():
    """With full conditioning sets the stacked-Vecchia Hetero-mean sampler is
    exact: its draws must reproduce the closed-form Gaussian posterior
    N((S^-1+G^-1)^-1 G^-1 y, (S^-1+G^-1)^-1), S = scale*corr."""
    _seed(10)
    n = 12
    X = np.random.uniform(size=(n, 1))
    scale, length = 1.4, np.array([0.4])
    Gamma = 0.05 + 0.1 * np.random.uniform(size=n)
    y = np.sin(5 * X[:, 0]) + np.sqrt(Gamma) * np.random.normal(size=n)

    impNN = vnn.get_pred_nn(X, X, n)[:, 1:]  # all others, self excluded
    f = jax.jit(lambda k: vcore.post_het_vecch(
        k, jnp.asarray(X), jnp.asarray(impNN), jnp.asarray(Gamma),
        jnp.asarray(y), scale, jnp.asarray(length), 1e-6, 'sexp'))
    keys = jax.random.split(jax.random.PRNGKey(3), 4000)
    draws = np.asarray(jax.vmap(f)(keys))

    S = scale * np.asarray(kops.k_cross(jnp.asarray(X), jnp.asarray(X),
                                        jnp.asarray(length), 'sexp')) + 1e-10 * np.eye(n)
    P = np.linalg.inv(np.linalg.inv(S) + np.diag(1.0 / Gamma))
    mu = P @ (y / Gamma)
    mc_tol = float(4 * np.sqrt(np.max(np.diag(P)) / 4000) + 0.02)
    np.testing.assert_allclose(draws.mean(0), mu, atol=mc_tol)
    np.testing.assert_allclose(np.cov(draws.T), P, atol=0.05)


@pytest.mark.slow
def test_hetero_vecchia_training():
    """Hetero DGP under Vecchia: the exact-posterior Gibbs step runs through
    the sparse stacked-Vecchia sampler and training converges."""
    from dgp_tpu import likelihoods
    _seed(11)
    n = 120
    X = np.linspace(0, 1, n).reshape(-1, 1)
    sd = 0.05 + 0.25 * X[:, 0]
    Y = (np.sin(2 * np.pi * X[:, 0]) + sd * np.random.normal(size=n)).reshape(-1, 1)
    layer1 = [kernel(length=np.array([0.3]), name='sexp', nugget=1e-6,
                     scale_est=True),
              kernel(length=np.array([0.3]), name='sexp', nugget=1e-6,
                     scale_est=True)]
    layer2 = [likelihoods.Hetero()]
    m = dgp(X, Y, combine(layer1, layer2), vecchia=True, m=15)
    m.train(N=40, disable=True, chunk_size=20)
    emu = emulator(m.estimate(), N=3)
    mu, var = emu.predict(X)
    rmse = np.sqrt(np.mean((mu[:, 0] - np.sin(2 * np.pi * X[:, 0])) ** 2))
    assert rmse < 0.25, rmse


@pytest.mark.slow
def test_gp_class_vecchia_mode():
    _seed(7)
    n = 120
    X = np.random.uniform(size=(n, 1))
    Y = np.sin(4 * np.pi * X)
    m = gp(X, Y, kernel(length=np.array([0.5]), name='matern2.5', scale_est=True,
                        nugget_est=True, nugget=1e-4), vecchia=True, m=20)
    m.train()
    xt = np.linspace(0.05, 0.95, 60).reshape(-1, 1)
    mu, var = m.predict(xt)
    rmse = np.sqrt(np.mean((mu - np.sin(4 * np.pi * xt)) ** 2))
    assert rmse < 0.05, rmse
    mu_l, var_l = m.loo()
    assert mu_l.shape == Y.shape
    # to/from vecchia round trip
    m.remove_vecchia()
    mu2, _ = m.predict(xt)
    assert np.sqrt(np.mean((mu2 - np.sin(4 * np.pi * xt)) ** 2)) < 0.05


@pytest.mark.slow
def test_dgp_vecchia_training():
    _seed(8)
    n = 100
    X = np.random.uniform(size=(n, 1))
    Y = np.sign(X - 0.5) * np.abs(X - 0.5) ** 0.4
    m = dgp(X, Y, vecchia=True, m=15)
    m.train(N=60, disable=True, chunk_size=30)
    emu = emulator(m.estimate(), N=5)
    xt = np.linspace(0.02, 0.98, 50).reshape(-1, 1)
    yt = np.sign(xt - 0.5) * np.abs(xt - 0.5) ** 0.4
    mu, var = emu.predict(xt)
    rmse = np.sqrt(np.mean((mu - yt) ** 2))
    assert rmse < 0.25, rmse


def test_approx_nn_device_matches_host():
    """The jit-traceable device IVF build (used by the engine's in-program
    NN refresh) must reproduce the host `_nn_approx` exactly; its fused
    imputation-pointer variant must be a valid self-excluding unconstrained
    m-NN with high recall vs the exact search."""
    import jax
    import jax.numpy as jnp

    _seed(13)
    n, m = 3000, 15
    X = np.random.uniform(size=(n, 2)).astype(np.float32)
    host = vnn._nn_approx(X, m, ordered=True)
    dev, imp = jax.jit(
        lambda xs: vnn.nn_approx_dev(xs, m, impute=True))(jnp.asarray(X))
    np.testing.assert_array_equal(host, np.asarray(dev))
    imp = np.asarray(imp)
    # (n, m-1): same layout as the host path get_pred_nn(.., m)[:, 1:] and
    # the exact device path _pred_nn_impl(.., m)[:, 1:]
    assert imp.shape == (n, m - 1)
    assert (imp != np.arange(n)[:, None]).all()  # self excluded
    assert ((imp >= 0) & (imp < n)).all()
    exact = np.asarray(vnn._pred_nn_impl(jnp.asarray(X), jnp.asarray(X),
                                         m))[:, 1:]
    rows = np.arange(0, n, 7)
    hits = sum(len(set(imp[i]) & set(exact[i])) for i in rows)
    assert hits / (len(rows) * (m - 1)) > 0.95


def test_device_refresh_supports_approx():
    """An approx-NN model must take the device refresh path and produce a
    consistent nn_state (ordered layout, valid prefix structure)."""
    import jax

    _seed(14)
    n = 1200  # > 4 * _BLOCK so the approx path engages
    X = np.random.rand(n, 1) * 2 - 1
    Y = np.sin(4 * X) + 0.05 * np.random.randn(n, 1)
    from dgp_tpu.models.dgp import dgp
    from dgp_tpu.models.node import kernel, combine
    m = dgp(X, Y, combine(
        [kernel(length=np.array([0.5]), name='sexp', nugget=1e-4)],
        [kernel(length=np.array([0.5]), name='sexp', nugget=1e-4,
                nugget_est=True, scale_est=True, connect=np.arange(1))]),
        vecchia=True, m=10)
    for layer in m.all_layer:
        for nd in layer:
            if getattr(nd, 'vecch', False):
                nd.nn_method = 'approx'
    eng = m.imp._engine()
    assert eng.supports_device_refresh()
    state = eng.get_state()
    nn_state = eng.refresh_nn(state, jax.random.PRNGKey(0))
    for l, layer in enumerate(nn_state):
        for d in layer:
            if d is None:
                continue
            NN = np.asarray(d['NN'])
            ordv = np.asarray(d['ord'])
            assert NN.shape == (n, 11)
            assert sorted(ordv.tolist()) == list(range(n))
            # reference layout: row i leads with i, descending, -1 padded
            assert (NN[:, 0] == np.arange(n)).all()
            valid = NN >= 0
            assert (NN[valid] <= np.arange(n).repeat(valid.sum(1))).all()


def test_host_jitter_retry_merges_failed_rows():
    """The host-level jitter escalation must re-dispatch with escalating
    extra_jit and keep healthy rows from the first pass."""
    from dgp_tpu.vecchia import api

    calls = []

    def fake_prog(x, extra):
        calls.append(float(extra))
        mean = np.array([1.0, np.nan, 3.0])
        var = np.array([0.1, 0.2, 0.3])
        if float(extra) > 0:
            mean = np.array([-1.0, 2.0, -3.0])  # healthy rows must NOT take these
        return mean, var

    g = api._with_jitter_retry(fake_prog)
    mean, var = g(np.zeros((3, 1), np.float32))
    np.testing.assert_array_equal(mean, [1.0, 2.0, 3.0])
    np.testing.assert_array_equal(var, [0.1, 0.2, 0.3])
    assert calls == [0.0, pytest.approx(3e-4)]

    def healthy_prog(x, extra):
        calls.append(float(extra))
        return np.ones(3), np.ones(3)

    calls.clear()
    g2 = api._with_jitter_retry(healthy_prog)
    g2(np.zeros((3, 1), np.float32))
    assert calls == [0.0]  # no escalation dispatches on the healthy path


def test_nn_approx_dev_chunked_matches_fused():
    """The bounded-chunk IVF self-query (used by the NN refresh above
    DEVICE_REFRESH_MAX_FUSED_N) must reproduce the single-program build
    exactly: same k-means (deterministic init), same global-offset ordered
    masking across chunk boundaries."""
    import jax
    import jax.numpy as jnp

    _seed(15)
    n, m = 3000, 12
    X = np.random.uniform(size=(n, 2)).astype(np.float32)
    fo, fi = jax.jit(
        lambda xs: vnn.nn_approx_dev(xs, m, impute=True))(jnp.asarray(X))
    co, ci = vnn.nn_approx_dev_chunked(jnp.asarray(X), m, impute=True,
                                       chunk=700)
    np.testing.assert_array_equal(np.asarray(fo), np.asarray(co))
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(ci))
    # and the non-impute variant
    fo2, _ = jax.jit(lambda xs: vnn.nn_approx_dev(xs, m))(jnp.asarray(X))
    co2, _ = vnn.nn_approx_dev_chunked(jnp.asarray(X), m, chunk=700)
    np.testing.assert_array_equal(np.asarray(fo2), np.asarray(co2))


def test_refresh_nn_eager_matches_fused(monkeypatch):
    """Engine NN refresh above the fused-program cap (the former 200k host
    fallback) must produce the identical nn_state via the chunked eager
    path, keeping n=1e6 ptrain on-device end to end."""
    import jax

    _seed(16)
    n = 1500
    X = np.random.rand(n, 1) * 2 - 1
    Y = np.sin(4 * X) + 0.05 * np.random.randn(n, 1)
    from dgp_tpu.models.dgp import dgp
    m = dgp(X, Y, vecchia=True, m=10)
    for layer in m.all_layer:
        for nd in layer:
            if nd.type == 'gp':
                nd.nn_method = 'approx'
    eng = m.imp._engine()
    state = eng.get_state()
    key = jax.random.PRNGKey(7)
    fused = eng.refresh_nn(state, key)
    from dgp_tpu.models import compiled as cmod
    assert eng.supports_device_refresh()
    monkeypatch.setattr(cmod, 'DEVICE_REFRESH_MAX_FUSED_N', 100)
    assert eng.supports_device_refresh()  # approx nodes stay on-device
    eager = eng.refresh_nn(state, key)
    for lf, le in zip(fused, eager):
        for df, de in zip(lf, le):
            assert (df is None) == (de is None)
            if df is None:
                continue
            for kk in df:
                np.testing.assert_array_equal(np.asarray(df[kk]),
                                              np.asarray(de[kk]))
