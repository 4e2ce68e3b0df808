"""End-to-end DGP tests on the reference demo configurations
(BASELINE.json configs 1-3)."""
import numpy as np
import pytest

from dgp_tpu import rng
from dgp_tpu.models.dgp import dgp
from dgp_tpu.models.node import kernel, combine
from dgp_tpu.models.emulation import emulator
from dgp_tpu.likelihoods import Poisson, Hetero, NegBin, Categorical, ZIP, ZINB


def _seed(s):
    np.random.seed(s)
    rng.seed(s)


def test_step_fct_3layer():
    """3-layer DGP on the 1-D step function (demo/step_fct.ipynb)."""
    _seed(0)
    X = np.linspace(0, 1, 10).reshape(-1, 1)
    Y = np.where(X > 0.5, 1.0, 0.0)
    layers = combine([kernel(length=np.array([1.0]), name='sexp')],
                     [kernel(length=np.array([1.0]), name='sexp')],
                     [kernel(length=np.array([1.0]), name='sexp', scale_est=True)])
    m = dgp(X, Y, layers)
    m.train(N=200, disable=True, chunk_size=100)
    emu = emulator(m.estimate(), N=10)
    xt = np.linspace(0, 1, 100).reshape(-1, 1)
    yt = np.where(xt > 0.5, 1.0, 0.0)
    mu, var = emu.predict(xt)
    rmse = np.sqrt(np.mean((mu - yt) ** 2))
    assert rmse < 0.2, rmse
    assert np.all(var >= 0)


def test_2d_fct_2layer_default():
    """Default 2-layer DGP on a 2-D function (demo/2d_fct.ipynb style)."""
    _seed(1)
    X = np.random.uniform(size=(24, 2))
    Y = np.sin(2 * np.pi * X[:, [0]]) * np.cos(2 * np.pi * X[:, [1]])
    m = dgp(X, Y)
    m.train(N=150, disable=True, chunk_size=75)
    emu = emulator(m.estimate(), N=10)
    xt = np.random.uniform(size=(100, 2))
    yt = np.sin(2 * np.pi * xt[:, [0]]) * np.cos(2 * np.pi * xt[:, [1]])
    mu, var = emu.predict(xt)
    rmse = np.sqrt(np.mean((mu - yt) ** 2))
    assert rmse < 0.35, rmse


def test_hetero_likelihood_with_replicates():
    """2-layer DGP + Hetero on replicated data
    (demo/non_Gaussian_likelihood.ipynb config)."""
    _seed(2)
    Xu = np.linspace(0, 1, 12).reshape(-1, 1)
    X = np.repeat(Xu, 6, axis=0)
    true_mean = 2 * np.sin(2 * np.pi * X)
    true_sd = 0.2 + 0.8 * X
    Y = true_mean + true_sd * np.random.randn(*X.shape)
    layers = combine([kernel(length=np.array([0.5]), name='sexp', scale_est=True),
                      kernel(length=np.array([0.5]), name='sexp', scale_est=True)],
                     [Hetero()])
    m = dgp(X, Y, layers)
    assert m.indices is not None  # replicates detected
    m.train(N=100, disable=True, chunk_size=50)
    emu = emulator(m.estimate(), N=10)
    xt = np.linspace(0.02, 0.98, 40).reshape(-1, 1)
    mu, var = emu.predict(xt)
    rmse = np.sqrt(np.mean((mu.reshape(-1, 1) - 2 * np.sin(2 * np.pi * xt)) ** 2))
    assert rmse < 0.5, rmse
    # predictive variance should grow with x (heteroskedasticity recovered)
    assert np.mean(var[-10:]) > np.mean(var[:10])


def test_poisson_likelihood():
    _seed(3)
    X = np.linspace(0, 1, 30).reshape(-1, 1)
    rate = np.exp(1.5 + np.sin(2 * np.pi * X))
    Y = np.random.poisson(rate).astype(float)
    layers = combine([kernel(length=np.array([0.5]), name='sexp', scale_est=True)],
                     [Poisson()])
    m = dgp(X, Y, layers)
    m.train(N=100, disable=True, chunk_size=50)
    emu = emulator(m.estimate(), N=10)
    mu, var = emu.predict(X)
    corr = np.corrcoef(mu.flatten(), rate.flatten())[0, 1]
    assert corr > 0.9, corr


def test_categorical_binary():
    _seed(4)
    X = np.random.uniform(-2, 2, size=(40, 1))
    Y = (X > 0).astype(int)
    layers = combine([kernel(length=np.array([1.0]), name='sexp', scale_est=True)],
                     [Categorical()])
    m = dgp(X, Y, layers)
    assert m.all_layer[-1][0].num_classes == 2
    m.train(N=80, disable=True, chunk_size=40)
    emu = emulator(m.estimate(), N=5)
    xt = np.array([[-1.5], [-0.5], [0.5], [1.5]])
    mu, var = emu.predict(xt)
    prob = np.asarray(mu).reshape(-1)
    assert prob[0] < 0.3 and prob[1] < 0.6
    assert prob[2] > 0.4 and prob[3] > 0.7


def test_categorical_multiclass_softmax():
    _seed(5)
    n = 60
    X = np.random.uniform(-1, 1, size=(n, 2))
    lab = (X[:, 0] > 0).astype(int) + 2 * (X[:, 1] > 0).astype(int)
    Y = lab.reshape(-1, 1)
    layers = combine(
        [kernel(length=np.array([1.0]), name='sexp', scale_est=True) for _ in range(4)],
        [Categorical()])
    m = dgp(X, Y, layers)
    assert m.all_layer[-1][0].link == 'softmax'
    m.train(N=50, disable=True, chunk_size=25)
    emu = emulator(m.estimate(), N=5)
    mu, var = emu.predict(X)
    acc = np.mean(np.argmax(mu, axis=1) == lab)
    assert acc > 0.8, acc


def test_negbin_runs():
    _seed(6)
    X = np.linspace(0, 1, 25).reshape(-1, 1)
    Y = np.random.negative_binomial(5, 0.4, size=(25, 1)).astype(float)
    layers = combine([kernel(length=np.array([0.6]), name='sexp', scale_est=True),
                      kernel(length=np.array([0.6]), name='sexp', scale_est=True)],
                     [NegBin()])
    m = dgp(X, Y, layers)
    m.train(N=30, disable=True, chunk_size=30)
    emu = emulator(m.estimate(), N=3)
    mu, var = emu.predict(X)
    assert np.all(np.isfinite(mu)) and np.all(var >= 0)


@pytest.mark.parametrize("lik_cls,n_nodes", [(ZIP, 2), (ZINB, 3)])
def test_zero_inflated_runs(lik_cls, n_nodes):
    _seed(7)
    X = np.linspace(0, 1, 25).reshape(-1, 1)
    lam = np.exp(1 + np.sin(2 * np.pi * X.flatten()))
    y = np.random.poisson(lam)
    y[np.random.rand(25) < 0.3] = 0
    Y = y.reshape(-1, 1).astype(float)
    layers = combine([kernel(length=np.array([0.6]), name='sexp', scale_est=True)
                      for _ in range(n_nodes)],
                     [lik_cls()])
    m = dgp(X, Y, layers)
    m.train(N=30, disable=True, chunk_size=30)
    emu = emulator(m.estimate(), N=3)
    mu, var = emu.predict(X)
    assert np.all(np.isfinite(mu)) and np.all(var >= 0)


def test_dgp_nllik_and_metrics():
    _seed(8)
    X = np.linspace(0, 1, 20).reshape(-1, 1)
    rate = np.exp(1 + np.sin(2 * np.pi * X))
    Y = np.random.poisson(rate).astype(float)
    layers = combine([kernel(length=np.array([0.5]), name='sexp', scale_est=True)],
                     [Poisson()])
    m = dgp(X, Y, layers)
    m.train(N=30, disable=True, chunk_size=30)
    emu = emulator(m.estimate(), N=3)
    avg_nll, nll = emu.nllik(X, Y)
    assert np.isfinite(avg_nll)
    x_cand = np.linspace(0, 1, 15).reshape(-1, 1)
    idx, val = emu.metric(x_cand, method='ALM')
    assert 0 <= idx[0] < 15
    scores = emu.metric(x_cand, method='MICE', score_only=True)
    assert scores.shape[0] == 15
    idx, val = emu.metric(x_cand, method='VIGF', obj=m)
    assert 0 <= idx[0] < 15


def test_dgp_update_xy():
    _seed(9)
    X = np.linspace(0, 1, 15).reshape(-1, 1)
    Y = np.sin(2 * np.pi * X)
    m = dgp(X, Y)
    m.train(N=20, disable=True, chunk_size=20)
    # superset update
    X2 = np.linspace(0, 1, 20).reshape(-1, 1)
    X2[:15] = X  # ensure old points included
    X2 = np.unique(np.vstack([X, X2]), axis=0).reshape(-1, 1)
    Y2 = np.sin(2 * np.pi * X2)
    m.update_xy(X2, Y2)
    assert m.n_data == len(X2)
    m.train(N=10, disable=True, chunk_size=10)
    # subset update
    m.update_xy(X, Y)
    assert m.n_data == 15
    m.train(N=10, disable=True, chunk_size=10)


def test_update_all_layer():
    """Swap a trained structure into a fresh dgp and continue training
    (reference dgp.py:760-823)."""
    _seed(31)
    n = 30
    X = np.random.uniform(size=(n, 1))
    Y = np.sin(4 * X)
    a = dgp(X, Y)
    a.train(N=20, disable=True, chunk_size=10)
    struct = a.estimate()

    b = dgp(X, Y)
    b.update_all_layer(struct)
    assert b.N == 0
    # hyper-params carried over
    np.testing.assert_allclose(b.all_layer[0][0].length,
                               struct[0][0].length)
    b.train(N=10, disable=True, chunk_size=10)
    assert b.N == 10
    emu = emulator(b.estimate(), N=3)
    xt = np.linspace(0, 1, 20).reshape(-1, 1)
    mu, var = emu.predict(xt)
    assert np.all(np.isfinite(mu)) and np.all(np.isfinite(var))
    rmse = np.sqrt(np.mean((mu - np.sin(4 * xt)) ** 2))
    assert rmse < 0.3, rmse


def test_aggregate_r2():
    _seed(10)
    X = np.random.uniform(size=(15, 2))
    Y = np.sin(2 * np.pi * X[:, [0]])
    m = dgp(X, Y)
    m.train(N=20, disable=True, chunk_size=10)
    r2 = m.aggregate_r2()
    assert len(r2) == 2
    assert r2[1][0] is not None


def test_train_restarts_on_nan_latents():
    """A NaN in the latent state must trigger the restart path (reference
    dgp.py:1402-1412 restarts on LinAlgError), even when the para traces
    stay finite (mstep falls back to previous params on non-finite
    objectives, so para alone cannot be trusted)."""
    _seed(11)
    X = np.linspace(0, 1, 15).reshape(-1, 1)
    Y = np.sin(2 * np.pi * X)
    m = dgp(X, Y)
    m.train(N=5, disable=True, chunk_size=5)
    assert m.N == 5
    # poison the hidden-layer latents; the engine reads state from the nodes
    node = m.all_layer[0][0]
    node.output = np.full_like(node.output, np.nan)
    m.all_layer[1][0].input = np.full_like(m.all_layer[1][0].input, np.nan)
    m.imp.invalidate()
    m.train(N=5, disable=True, chunk_size=5)
    # restart discards the poisoned attempt, reinitialises, and retrains
    assert m.N == 10
    for layer in m.all_layer:
        for nd in layer:
            if nd.type == 'gp':
                assert np.all(np.isfinite(nd.output)), 'NaN latents survived'
                assert np.all(np.isfinite(nd.para_path)), 'NaN para recorded'


def test_latent_nan_restarts_midflight(monkeypatch):
    """A latent-only NaN (para stays finite via mstep's ok-fallback) must be
    caught by the every-8-chunks probe -- which fetches an r2 snapshot
    computed FROM the latents -- and restart before the call runs all its
    chunks (the reference restarts immediately, dgp.py:1402-1412)."""
    _seed(13)
    X = np.linspace(0, 1, 15).reshape(-1, 1)
    Y = np.sin(2 * np.pi * X)
    m = dgp(X, Y)
    m.train(N=2, disable=True, chunk_size=1)
    node = m.all_layer[0][0]
    node.output = np.full_like(node.output, np.nan)
    m.all_layer[1][0].input = np.full_like(m.all_layer[1][0].input, np.nan)
    m.imp.invalidate()

    from dgp_tpu.models import compiled as C
    calls = []
    orig = C.CompiledDGP.train_chunk

    def spy(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    monkeypatch.setattr(C.CompiledDGP, 'train_chunk', spy)
    m.train(N=20, disable=True, chunk_size=1)
    assert m.N == 22
    # poisoned attempt aborts at the 8th chunk probe (8 calls) + one clean
    # retrain (20 calls); running the poisoned attempt to completion would
    # make it 40
    assert len(calls) <= 30, len(calls)
    for layer in m.all_layer:
        for nd in layer:
            if nd.type == 'gp':
                assert np.all(np.isfinite(nd.output))


def test_vecchia_update_xy():
    """update_xy in Vecchia mode: the conditional-mean latent extension must
    use the Vecchia path (reference cond_mean_vecch, vecchia.py:624-633) and
    every node's ordering/NN must be rebuilt at the new n (reference
    update_all_layer_larger/smaller)."""
    _seed(12)
    n = 300
    X = np.random.rand(n, 1) * 2 - 1
    Y = np.sin(3 * X) + 0.05 * np.random.randn(n, 1)
    m = dgp(X, Y, vecchia=True, m=10)
    m.train(N=8, disable=True, chunk_size=4)

    # superset: add 60 new points
    X2 = np.vstack([X, np.random.rand(60, 1) * 2 - 1])
    Y2 = np.sin(3 * X2) + 0.05 * np.random.randn(len(X2), 1)
    m.update_xy(X2, Y2)
    assert m.n_data == len(X2)
    for layer in m.all_layer:
        for nd in layer:
            if nd.type == 'gp' and nd.vecch:
                assert nd.ord.shape[0] == len(X2)
                assert nd.NNarray.shape[0] == len(X2)
                assert np.all(np.isfinite(nd.output))
    m.train(N=4, disable=True, chunk_size=4)

    # subset: back to the original design
    m.update_xy(X, Y)
    assert m.n_data == n
    for layer in m.all_layer:
        for nd in layer:
            if nd.type == 'gp' and nd.vecch:
                assert nd.ord.shape[0] == n
                assert nd.NNarray.shape[0] == n
    m.train(N=4, disable=True, chunk_size=4)
    emu = emulator(m.estimate(), N=3)
    xt = np.linspace(-1, 1, 50).reshape(-1, 1)
    mu, var = emu.predict(xt)
    rmse = np.sqrt(np.mean((mu - np.sin(3 * xt)) ** 2))
    assert rmse < 0.3, rmse


@pytest.mark.slow
def test_vecchia_update_xy_large_n():
    """Superset update_xy at n=5e4 in Vecchia mode: materialising any dense
    (n, n) matrix here (the pre-fix behaviour: compute_stats() built Rinv)
    would allocate 10-20 GB and fail; passing proves the extension stays
    O(n*m^3)."""
    _seed(13)
    n = 50_000
    X = np.random.rand(n, 1) * 2 - 1
    Y = np.sin(3 * X) + 0.05 * np.random.randn(n, 1)
    m = dgp(X, Y, vecchia=True, m=15)
    m.train(N=2, disable=True, chunk_size=2)
    X2 = np.vstack([X, np.random.rand(500, 1) * 2 - 1])
    Y2 = np.sin(3 * X2) + 0.05 * np.random.randn(len(X2), 1)
    m.update_xy(X2, Y2)
    assert m.n_data == len(X2)
    for layer in m.all_layer:
        for nd in layer:
            if nd.type == 'gp' and nd.vecch:
                assert nd.NNarray.shape[0] == len(X2)
    m.train(N=1, disable=True, chunk_size=1)
