"""Run the ACTUAL reference library (dgpsi at /root/reference, pure-Python
under tools/refshim since numba/pathos aren't installed) on the parity
configs, scoring on the identical data draws from tools/parity_data.py.

Writes REF_ANCHORS.json at the repo root: per-config reference quality
numbers that tools/parity.py merges into PARITY_r05.json rows and
tests/test_parity_quality.py gates against.  The one config the pure-Python
reference cannot finish in reasonable time (vecchia: n=5000) keeps its
published-notebook anchor instead; wine is slow (~1-2 h: 16 nodes x
O(n^2 d) derivative loops) but feasible and anchored at the notebook's
exact N=200 protocol.

Usage: python tools/ref_anchor.py [config ...]   (default: all feasible)
"""
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
sys.path.insert(0, _HERE)          # parity_data
OUT = os.path.join(_ROOT, "REF_ANCHORS.json")

import parity_data as pdata  # noqa: E402

T0 = time.time()


def _log(msg):
    print(f"[ref_anchor +{time.time()-T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _load_reference():
    sys.path.insert(0, os.path.join(_HERE, "refshim"))
    sys.path.insert(0, "/root/reference")
    import dgpsi
    return dgpsi


def step():
    """step_fct.ipynb cells 2-7 run by the reference itself."""
    d = _load_reference()
    d.nb_seed(99); np.random.seed(99)
    X, Y, z, truth = pdata.step_data()
    all_layer = d.combine(
        [d.kernel(length=np.array([1.]), name='sexp')],
        [d.kernel(length=np.array([1.]), name='sexp')],
        [d.kernel(length=np.array([1.]), name='sexp', scale_est=True)])
    m = d.dgp(X, [Y], all_layer)
    m.train(N=500, disable=True)
    emu = d.emulator(m.estimate())
    mu, var = emu.predict(z, method='mean_var')
    rmse = float(np.sqrt(np.mean((mu - truth) ** 2)))
    rmse_train = float(np.sqrt(np.mean(
        (emu.predict(X, method='mean_var')[0] - Y) ** 2)))
    return {"rmse_vs_truth": round(rmse, 4),
            "rmse_at_train_pts": round(rmse_train, 4)}


def twod():
    """2d_fct.ipynb cells 2-6 run by the reference itself."""
    d = _load_reference()
    d.nb_seed(99); np.random.seed(99)
    X, Y, z, truth = pdata.twod_data()
    k = lambda **kw: d.kernel(length=np.array([1]), name='sexp', **kw)
    all_layer = d.combine(
        [k(), k()],
        [k(connect=np.arange(2)), k(connect=np.arange(2))],
        [k(connect=np.arange(2)), k(connect=np.arange(2))],
        [k(scale_est=True, connect=np.arange(2))])
    m = d.dgp(X, [Y], all_layer)
    m.train(N=500, disable=True)
    emu = d.emulator(m.estimate(), N=50)
    mu, var = emu.predict(z, method='mean_var')
    rmse = float(np.sqrt(np.mean((mu.flatten() - truth.flatten()) ** 2)))
    return {"rmse_vs_truth_diag": round(rmse, 4)}


def motorcycle():
    """non_Gaussian_likelihood.ipynb cells 12-17 run by the reference."""
    d = _load_reference()
    d.nb_seed(99); np.random.seed(99)
    X, Y = pdata.motorcycle_data()
    layer1 = [d.kernel(length=np.array([0.5]), name='sexp')]
    layer2 = [d.kernel(length=np.array([0.2]), name='sexp', scale_est=True,
                       connect=np.arange(1)) for _ in range(2)]
    m = d.dgp(X, [Y], d.combine(layer1, layer2, [d.Hetero()]))
    m.train(N=500, disable=True)
    emu = d.emulator(m.estimate())
    nll = float(np.asarray(emu.nllik(X, Y)[0]))
    z = np.linspace(0, 1, 100)[:, None]
    mu, var = emu.predict(z, method='mean_var')
    return {"train_nllik": round(nll, 4),
            "pred_var_range": [round(float(np.min(var)), 4),
                               round(float(np.max(var)), 4)]}


def poisson():
    """non_Gaussian_likelihood.ipynb cells 19-21 (GP + Poisson) run by the
    reference on OUR draw (its published 1.827 was its own draw)."""
    d = _load_reference()
    d.nb_seed(99); np.random.seed(99)
    X, Y, z, test_Yz, f = pdata.poisson_data()
    layer1 = [d.kernel(length=np.array([0.5]), name='matern2.5',
                       scale_est=True)]
    m = d.dgp(X, [Y], d.combine(layer1, [d.Poisson()]))
    m.train(N=500, disable=True)
    emu = d.emulator(m.estimate())
    nll = float(np.asarray(emu.nllik(z, test_Yz)[0]))
    return {"test_nllik": round(nll, 4), "published_own_draw": 1.8274}


def dgp_poisson():
    """non_Gaussian_likelihood.ipynb cells 22-23 (2-layer DGP + Poisson)
    run by the reference on OUR draw (published own-draw NLL: 1.779)."""
    d = _load_reference()
    d.nb_seed(99); np.random.seed(99)
    X, Y, z, test_Yz, f = pdata.poisson_data()
    all_layer = d.combine(
        [d.kernel(length=np.array([0.5]), name='matern2.5')],
        [d.kernel(length=np.array([0.1]), name='matern2.5', scale_est=True,
                  connect=np.arange(1))],
        [d.Poisson()])
    m = d.dgp(X, [Y], all_layer)
    m.train(N=500, disable=True)
    emu = d.emulator(m.estimate())
    nll = float(np.asarray(emu.nllik(z, test_Yz)[0]))
    return {"test_nllik": round(nll, 4), "published_own_draw": 1.7790}


def negbin():
    """non_Gaussian_likelihood.ipynb cells 25-27 (2-layer DGP + NegBin,
    n=180) run by the reference on OUR draw."""
    d = _load_reference()
    d.nb_seed(99); np.random.seed(99)
    X, Y, Xt, Yt, test_Yt = pdata.negbin_data()
    all_layer = d.combine(
        [d.kernel(length=np.array([0.5]), name='matern2.5')],
        [d.kernel(length=np.array([0.02]), name='matern2.5', scale_est=True,
                  connect=np.arange(1)),
         d.kernel(length=np.array([0.02]), name='matern2.5', scale_est=True,
                  connect=np.arange(1))],
        [d.NegBin()])
    m = d.dgp(X, [Y], all_layer)
    m.train(N=500, disable=True)
    emu = d.emulator(m.estimate())
    mu, var = emu.predict(Xt, method='mean_var')
    rmse_mean = float(np.sqrt(np.mean((np.asarray(mu).flatten()
                                       - Yt.flatten()) ** 2)))
    nll = float(np.asarray(emu.nllik(Xt, test_Yt)[0]))
    return {"rmse_mean_vs_truth": round(rmse_mean, 4),
            "test_nllik": round(nll, 4)}


def zip_anchor():
    """tools/parity_data.zip_data run by the reference itself (same-draw
    anchor for the synthetic ZIP parity row; reference dgp.py:337-380 +
    likelihood_class.py:470)."""
    d = _load_reference()
    d.nb_seed(99); np.random.seed(99)
    X, Y, Xt, Yt_mean, test_Yt = pdata.zip_data()
    all_layer = d.combine(
        [d.kernel(length=np.array([0.5]), name='matern2.5')],
        [d.kernel(length=np.array([0.2]), name='matern2.5', scale_est=True,
                  connect=np.arange(1)),
         d.kernel(length=np.array([0.2]), name='matern2.5', scale_est=True,
                  connect=np.arange(1))],
        [d.ZIP()])
    m = d.dgp(X, [Y], all_layer)
    m.train(N=500, disable=True)
    emu = d.emulator(m.estimate())
    mu, var = emu.predict(Xt, method='mean_var')
    rmse_mean = float(np.sqrt(np.mean((np.asarray(mu).flatten()
                                       - Yt_mean.flatten()) ** 2)))
    nll = float(np.asarray(emu.nllik(Xt, test_Yt)[0]))
    return {"rmse_mean_vs_truth": round(rmse_mean, 4),
            "test_nllik": round(nll, 4)}


def wine():
    """DGP_classification.ipynb cells 2-10 run by the reference on the
    identical 80/20 split (notebook protocol: train N=200, emulator N=50).
    16 GP nodes at d=13 make this the slowest anchor (~1-2 h pure-Python)."""
    d = _load_reference()
    np.random.seed(99)
    d.nb_seed(99)
    Xtr, Xte, ytr, yte = pdata.wine_data()
    layer1 = [d.kernel(length=np.array([1]), name='matern2.5', nugget=1e-6)
              for _ in range(Xtr.shape[1])]
    layer2 = [d.kernel(length=np.array([1]), name='matern2.5', scale_est=True,
                       nugget=1e-4, nugget_est=True) for _ in range(3)]
    m = d.dgp(Xtr, ytr.reshape(-1, 1), d.combine(layer1, layer2,
                                                 [d.Categorical()]))
    m.train(N=200, disable=True)
    emu = d.emulator(m.estimate())
    from sklearn.metrics import log_loss, accuracy_score
    prob = emu.predict(Xte)[0]
    return {"dgp_log_loss": round(float(log_loss(yte, prob)), 4),
            "dgp_accuracy": round(float(accuracy_score(
                yte, np.argmax(prob, axis=1))), 4)}


def wine_reduced():
    """Reduced-budget wine anchor: identical draws/protocol to wine() but
    train N=25 / emulator N=10.  The full notebook protocol (N=200) costs
    ~19 h under the pure-Python refshim (346 s/iter measured) -- beyond any
    driver budget -- so the same-draw gate anchors this reduced run on BOTH
    sides; the published notebook number (log-loss 0.059, N=200) remains the
    full-protocol target."""
    d = _load_reference()
    np.random.seed(99)
    d.nb_seed(99)
    Xtr, Xte, ytr, yte = pdata.wine_data()
    layer1 = [d.kernel(length=np.array([1]), name='matern2.5', nugget=1e-6)
              for _ in range(Xtr.shape[1])]
    layer2 = [d.kernel(length=np.array([1]), name='matern2.5', scale_est=True,
                       nugget=1e-4, nugget_est=True) for _ in range(3)]
    m = d.dgp(Xtr, ytr.reshape(-1, 1), d.combine(layer1, layer2,
                                                 [d.Categorical()]))
    m.train(N=25, disable=True)
    emu = d.emulator(m.estimate(), N=10)
    from sklearn.metrics import log_loss, accuracy_score
    prob = emu.predict(Xte)[0]
    return {"dgp_log_loss": round(float(log_loss(yte, prob)), 4),
            "dgp_accuracy": round(float(accuracy_score(
                yte, np.argmax(prob, axis=1))), 4)}


def linked():
    """model_linking.ipynb cells 16-28 run by the reference."""
    d = _load_reference()
    d.nb_seed(99); np.random.seed(99)
    X1, Y1, X2, Y2, z, truth = pdata.linked_data()
    m1 = d.gp(X1, Y1, d.kernel(length=np.array([1.]), name='matern2.5',
                               scale_est=True))
    m1.train()
    c1 = d.container(m1.export(), local_input_idx=np.array([0]))
    all_layer = d.combine(
        [d.kernel(length=np.array([1.]), name='matern2.5')],
        [d.kernel(length=np.array([1.]), name='matern2.5', scale_est=True,
                  connect=np.arange(1))])
    m2 = d.dgp(X2, [Y2], all_layer)
    m2.train(N=500, disable=True)
    c2 = d.container(m2.estimate(), local_input_idx=np.array([0]))
    lm = d.lgp([[c1], [c2]])
    ml, vl = lm.predict(z)
    rmse = float(np.sqrt(np.mean((np.asarray(ml[0]).flatten()
                                  - truth.flatten()) ** 2)))
    return {"rmse_vs_composed_truth": round(rmse, 4)}


def multioutput():
    """multi-output.ipynb cells 2-6 run by the reference."""
    d = _load_reference()
    d.nb_seed(99); np.random.seed(99)
    X, Y, z, truth = pdata.multioutput_data()
    all_layer = d.combine(
        [d.kernel(length=np.array([.5]), name='sexp')],
        [d.kernel(length=np.array([.5]), name='sexp', connect=np.arange(1),
                  scale_est=True),
         d.kernel(length=np.array([.5]), name='sexp', connect=np.arange(1),
                  scale_est=True)])
    m = d.dgp(X, [Y], all_layer)
    m.train(N=500, disable=True)
    emu = d.emulator(m.estimate())
    mu, var = emu.predict(z, method='mean_var')
    mu = np.asarray(mu)
    rmse = float(np.sqrt(np.mean((mu - truth) ** 2)))
    return {"rmse_vs_truth": round(rmse, 4),
            "rmse_out1": round(float(np.sqrt(np.mean(
                (mu[:, 0] - truth[:, 0]) ** 2))), 4),
            "rmse_out2": round(float(np.sqrt(np.mean(
                (mu[:, 1] - truth[:, 1]) ** 2))), 4)}


CONFIGS = {"step": step, "2d": twod, "motorcycle": motorcycle,
           "poisson": poisson, "dgp_poisson": dgp_poisson,
           "negbin": negbin, "zip": zip_anchor, "linked": linked,
           "wine": wine, "wine_reduced": wine_reduced,
           "multioutput": multioutput}
TIMEOUTS = {"motorcycle": 14400, "negbin": 14400, "wine": 21600,
            "wine_reduced": 18000, "zip": 10800}


def _run_one(name):
    t0 = time.time()
    r = CONFIGS[name]()
    r["wall_s"] = round(time.time() - t0, 1)
    r["source"] = "reference dgpsi v2.6.0 run pure-Python (tools/refshim)"
    print("ANCHOR_RESULT " + json.dumps(r))


def main():
    import subprocess
    names = sys.argv[1:] or list(CONFIGS)
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            results = json.load(fh)
    for name in names:
        _log(f"running reference config {name}")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run", name],
                capture_output=True, text=True,
                timeout=TIMEOUTS.get(name, 7200))
        except subprocess.TimeoutExpired:
            results[name] = {"error": "timeout"}
            _log(f"{name} TIMED OUT")
            continue
        out = {}
        for line in proc.stdout.splitlines():
            if line.startswith("ANCHOR_RESULT "):
                out = json.loads(line[len("ANCHOR_RESULT "):])
        if out:
            results[name] = out
            _log(f"{name}: {out}")
        else:
            tail = (proc.stderr or proc.stdout or "").strip().splitlines()
            msg = tail[-1] if tail else f"rc={proc.returncode}"
            results[name] = {"error": msg[:300]}
            _log(f"{name} FAILED: {msg[:300]}")
        with open(OUT, "w") as fh:
            json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--run":
        _run_one(sys.argv[2])
    else:
        main()
