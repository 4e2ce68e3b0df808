"""Quality-gate tests on the reference's real-data demo configurations.

Two layers of gating:

1. Live reference-anchored gates (slow): the cheap demo configs run at
   FULL budget through the exact tools/parity.py code path and must pass
   the same gates recorded in PARITY_r05.json -- thresholds anchored to
   dgpsi run on the identical draw (REF_ANCHORS.json).
2. Reduced-budget smoke gates (slow): the two expensive configs
   (motorcycle Hetero, wine classification) at shortened budgets with
   correspondingly looser thresholds.
3. Artifact gate (fast): every recorded PARITY_r05.json row must carry a
   reference anchor (where one exists) and a passing gate, so a regression
   in the recorded parity matrix fails the suite even when the slow live
   runs are deselected.
"""
import json
import os
import sys

import numpy as np
import pytest

from dgp_tpu import rng
from dgp_tpu.models.dgp import dgp
from dgp_tpu.models.node import kernel, combine
from dgp_tpu.models.emulation import emulator
from dgp_tpu.likelihoods import Hetero, Categorical

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, "tools"))

MC_IN = "/root/reference/demo/mc_input.txt"
MC_OUT = "/root/reference/demo/mc_output.txt"


def _seed(s):
    np.random.seed(s)
    rng.seed(s)


def _live_gate(name):
    """Run a tools/parity.py config live and assert its anchored gate."""
    import parity as par
    r = par.CONFIGS[name]()
    anchors = {}
    if os.path.exists(par.ANCHORS):
        with open(par.ANCHORS) as fh:
            anchors = json.load(fh)
    a = anchors.get(name)
    if a and "error" not in a:
        r["reference_on_same_draw"] = {
            k: v for k, v in a.items() if k not in ("wall_s", "source")}
    par.apply_gate(name, r)
    assert "gate" in r, r
    assert r["gate"]["pass"], r["gate"]


@pytest.mark.slow
@pytest.mark.parametrize("name", ["step", "poisson", "dgp_poisson",
                                  "linked", "2d", "negbin",
                                  "multioutput"])
def test_parity_config_live(name):
    """Full-budget live run of a demo config through tools/parity.py,
    gated against the reference-on-same-draw anchor."""
    _live_gate(name)


def test_parity_artifact_gated():
    """Every recorded parity row has a passing reference-anchored gate."""
    path = os.path.join(_ROOT, "PARITY_r05.json")
    if not os.path.exists(path):
        pytest.skip("no recorded parity matrix")
    with open(path) as fh:
        results = json.load(fh)
    assert len(results) >= 10, sorted(results)
    for name, r in results.items():
        assert isinstance(r, dict) and "error" not in r, (name, r)
        g = r.get("gate")
        assert g is not None and g["pass"], (name, g)
        if name not in ("vecchia", "wine"):  # no same-draw anchor possible
            assert "reference_on_same_draw" in r, name


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
