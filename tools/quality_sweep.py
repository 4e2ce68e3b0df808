"""Lever sweep for the two Poisson-family parity gaps (VERDICT r04 #4).

Runs the dgp_poisson / negbin parity configs (identical draws to
tools/parity.py) across inference-protocol levers that do NOT change the
model or the data: M-step budget cap, estimate() burn-in fraction, and
emulator imputation count N.  Each variant prints one JSON line; the
winning protocol (if any beats the recorded row) is promoted into
tools/parity.py with the sweep recorded here.

Usage: python tools/quality_sweep.py {dgp_poisson|negbin} [variant ...]
"""
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
sys.path.insert(0, _ROOT)
sys.path.insert(0, _HERE)

import parity_data as pdata  # noqa: E402


def _setup():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import dgp_tpu
    dgp_tpu.set_default_dtype("float64")


def wine(burnin=None, emu_n=50, train_n=500):
    """Full-protocol wine row (tools/parity.py::wine DGP side only; the
    sklearn GPC baseline is protocol-invariant and skipped here)."""
    from sklearn.metrics import log_loss, accuracy_score
    from dgp_tpu import dgp, kernel, combine, emulator, Categorical, nb_seed
    np.random.seed(99)
    nb_seed(99)
    Xtr, Xte, ytr, yte = pdata.wine_data()
    layer1 = [kernel(length=np.array([1]), name='matern2.5', nugget=1e-6)
              for _ in range(Xtr.shape[1])]
    layer2 = [kernel(length=np.array([1]), name='matern2.5', scale_est=True,
                     nugget=1e-4, nugget_est=True) for _ in range(3)]
    m = dgp(Xtr, ytr.reshape(-1, 1), combine(layer1, layer2, [Categorical()]))
    m.train(N=train_n, disable=True)
    emu = emulator(m.estimate(burnin=burnin), N=emu_n)
    prob = emu.predict(Xte)[0]
    return {"dgp_log_loss": round(float(log_loss(yte, prob)), 4),
            "dgp_accuracy": round(float(accuracy_score(
                yte, np.argmax(prob, axis=1))), 4)}


def dgp_poisson(burnin=None, emu_n=10, train_n=500):
    from dgp_tpu import dgp, kernel, combine, emulator, Poisson, nb_seed
    nb_seed(99)
    X, Y, z, test_Yz, f = pdata.poisson_data()
    all_layer = combine(
        [kernel(length=np.array([0.5]), name='matern2.5')],
        [kernel(length=np.array([0.1]), name='matern2.5', scale_est=True,
                connect=np.arange(1))],
        [Poisson()])
    m = dgp(X, [Y], all_layer)
    m.train(N=train_n, disable=True)
    emu = emulator(m.estimate(burnin=burnin), N=emu_n)
    nll = float(np.asarray(emu.nllik(z, test_Yz)[0]))
    return {"test_nllik": round(nll, 4)}


def negbin(burnin=None, emu_n=10, train_n=500):
    from dgp_tpu import dgp, kernel, combine, emulator, NegBin, nb_seed
    nb_seed(99)
    X, Y, Xt, Yt, test_Yt = pdata.negbin_data()
    all_layer = combine(
        [kernel(length=np.array([0.5]), name='matern2.5')],
        [kernel(length=np.array([0.02]), name='matern2.5', scale_est=True,
                connect=np.arange(1)),
         kernel(length=np.array([0.02]), name='matern2.5', scale_est=True,
                connect=np.arange(1))],
        [NegBin()])
    m = dgp(X, [Y], all_layer)
    m.train(N=train_n, disable=True)
    emu = emulator(m.estimate(burnin=burnin), N=emu_n)
    mu, var = emu.predict(Xt, method='mean_var')
    rmse_mean = float(np.sqrt(np.mean((np.asarray(mu).flatten()
                                       - Yt.flatten()) ** 2)))
    nll = float(np.asarray(emu.nllik(Xt, test_Yt)[0]))
    return {"rmse_mean_vs_truth": round(rmse_mean, 4),
            "test_nllik": round(nll, 4)}


VARIANTS = {
    "base": {},
    "nocap": {"_cap": "none"},
    "burn_half": {"burnin": 250},
    "burn_short": {"burnin": 375},
    "emu25": {"emu_n": 25},
    "emu50": {"emu_n": 50},
    "nocap_emu50": {"_cap": "none", "emu_n": 50},
    "burn_half_emu50": {"burnin": 250, "emu_n": 50},
    "train1000": {"train_n": 1000},
    "train1000_emu50": {"train_n": 1000, "emu_n": 50},
}


def main():
    config = sys.argv[1]
    names = sys.argv[2:] or list(VARIANTS)
    fn = {"dgp_poisson": dgp_poisson, "negbin": negbin, "wine": wine}[config]
    for name in names:
        kw = dict(VARIANTS[name])
        cap = kw.pop("_cap", None)
        import subprocess
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        if cap is not None:
            env["DGP_TPU_MSTEP_CAP"] = cap
        code = (f"import sys; sys.path.insert(0, {_HERE!r}); "
                f"import quality_sweep as q; q._setup(); "
                f"import json, time; t0=time.time(); "
                f"r = q.{config}(**{kw!r}); r['wall_s']=round(time.time()-t0,1); "
                f"print('SWEEP', {name!r}, json.dumps(r))")
        t0 = time.time()
        p = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=3600)
        for line in p.stdout.splitlines():
            if line.startswith("SWEEP"):
                print(line, flush=True)
                break
        else:
            tail = (p.stderr or "").strip().splitlines()
            print(f"SWEEP {name} FAILED: "
                  f"{tail[-1][:200] if tail else p.returncode}", flush=True)


if __name__ == "__main__":
    main()
