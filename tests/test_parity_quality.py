"""Quality-gate tests on the reference's real-data demo configurations.

These are reduced-budget versions of the PARITY_r02.json configs (the full
runs live in tools/parity.py): the motorcycle heteroskedastic fit
(ref demo/non_Gaussian_likelihood.ipynb cells 12-17) and the wine 3-class
classification (ref demo/DGP_classification.ipynb).  Gates are loose enough
for the shortened training budget but tight enough to catch a broken
likelihood path or a diverged fit.
"""
import os

import numpy as np
import pytest

from dgp_tpu import rng
from dgp_tpu.models.dgp import dgp
from dgp_tpu.models.node import kernel, combine
from dgp_tpu.models.emulation import emulator
from dgp_tpu.likelihoods import Hetero, Categorical

MC_IN = "/root/reference/demo/mc_input.txt"
MC_OUT = "/root/reference/demo/mc_output.txt"


def _seed(s):
    np.random.seed(s)
    rng.seed(s)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(MC_IN),
                    reason="reference motorcycle data not mounted")
def test_motorcycle_hetero_quality():
    """Hetero DGP on the motorcycle-crash data: the fitted noise level must
    vary strongly along the input (the dataset's defining feature) and the
    predictive NLL must beat a constant-variance Gaussian baseline."""
    _seed(99)
    X = np.loadtxt(MC_IN).reshape(-1, 1)
    Y = np.loadtxt(MC_OUT).reshape(-1, 1)
    X = (X - X.min()) / (X.max() - X.min())
    Y = (Y - Y.mean()) / Y.std()
    layer1 = [kernel(length=np.array([0.5]), name='sexp')]
    layer2 = [kernel(length=np.array([0.2]), name='sexp', scale_est=True,
                     connect=np.arange(1)) for _ in range(2)]
    m = dgp(X, [Y], combine(layer1, layer2, [Hetero()]))
    m.train(N=150, disable=True, chunk_size=50)
    emu = emulator(m.estimate())
    nll = float(np.asarray(emu.nllik(X, Y)[0]))
    # unit-variance N(0,1) baseline NLL = 0.5*log(2*pi) + 0.5 = 1.419
    assert nll < 1.1, nll
    z = np.linspace(0, 1, 100)[:, None]
    _, var = emu.predict(z, method='mean_var')
    # heteroskedasticity: fitted variance must span at least a decade
    assert float(var.max()) / max(float(var.min()), 1e-12) > 10.0, (
        var.min(), var.max())


@pytest.mark.slow
def test_wine_classification_quality():
    """3-layer DGP classifier on the wine data (13 GP / 3 GP / Categorical),
    80/20 split: accuracy must be high and log-loss well below chance."""
    from sklearn.datasets import load_wine
    from sklearn.preprocessing import MinMaxScaler
    from sklearn.model_selection import train_test_split
    from sklearn.metrics import log_loss, accuracy_score

    _seed(99)
    Xw, yw = load_wine(return_X_y=True)
    Xw = MinMaxScaler().fit_transform(Xw)
    Xtr, Xte, ytr, yte = train_test_split(Xw, yw, test_size=0.2,
                                          random_state=99)
    layer1 = [kernel(length=np.array([1]), name='matern2.5', nugget=1e-6)
              for _ in range(Xtr.shape[1])]
    layer2 = [kernel(length=np.array([1]), name='matern2.5', scale_est=True,
                     nugget=1e-4, nugget_est=True) for _ in range(3)]
    m = dgp(Xtr, ytr.reshape(-1, 1), combine(layer1, layer2, [Categorical()]))
    m.train(N=100, disable=True, chunk_size=50)
    emu = emulator(m.estimate())
    prob = emu.predict(Xte)[0]
    acc = accuracy_score(yte, np.argmax(prob, axis=1))
    ll = log_loss(yte, prob, labels=[0, 1, 2])
    assert acc >= 0.9, acc
    assert ll < 0.35, ll  # chance = log(3) = 1.10; ref full-budget = 0.059
