"""SEM-seed noise floor of a parity metric, on either side.

Runs a parity configuration (tools/parity.py) on the IDENTICAL data draw
(tools/parity_data.py pins the data RNG internally) while varying only the
SEM seed, for dgp_tpu or for the actual reference (dgpsi under
tools/refshim).  Quantifies how much of a same-draw anchor gap is seed noise
rather than algorithmic quality.

Round-4 measurements (test_nllik, identical data):

    side       seed 99   seed 7   seed 42
    reference   1.8689   1.9782      --       (spread 0.109 nats)
    dgp_tpu     1.9056   1.9508   1.8621      (mean 1.906 vs ref mean 1.924)

At seed 7 dgp_tpu beats the reference on the same draw; at seed 42 dgp_tpu
beats the reference's seed-99 anchor outright.  The dgp_poisson gate slack
(+0.05, tools/parity.py) sits well inside the reference's own 0.109-nat
seed spread.

Usage: python tools/seed_spread.py {ours|ref} SEED [SEED ...]
"""
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
sys.path.insert(0, _HERE)

import parity_data as pdata  # noqa: E402


def _lib(side):
    if side == "ours":
        sys.path.insert(0, _ROOT)
        import dgp_tpu
        return dgp_tpu
    sys.path.insert(0, os.path.join(_HERE, "refshim"))
    sys.path.insert(0, "/root/reference")
    import dgpsi
    return dgpsi


def dgp_poisson(side, seed):
    d = _lib(side)
    d.nb_seed(seed)
    np.random.seed(seed)
    X, Y, z, test_Yz, f = pdata.poisson_data()
    all_layer = d.combine(
        [d.kernel(length=np.array([0.5]), name='matern2.5')],
        [d.kernel(length=np.array([0.1]), name='matern2.5', scale_est=True,
                  connect=np.arange(1))],
        [d.Poisson()])
    m = d.dgp(X, [Y], all_layer)
    m.train(N=500, disable=True)
    emu = d.emulator(m.estimate())
    return {"test_nllik": float(np.asarray(emu.nllik(z, test_Yz)[0]))}


def negbin(side, seed):
    d = _lib(side)
    d.nb_seed(seed)
    np.random.seed(seed)
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
    return {"rmse_mean_vs_truth": rmse_mean,
            "test_nllik": float(np.asarray(emu.nllik(Xt, test_Yt)[0]))}


CONFIGS = {"dgp_poisson": dgp_poisson, "negbin": negbin}


if __name__ == "__main__":
    side = sys.argv[1]
    cfg = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].isdigit() \
        else "dgp_poisson"
    seeds = [int(x) for x in sys.argv[2:] if x.isdigit()] or [99]
    for s in seeds:
        out = CONFIGS[cfg](side, s)
        metrics = " ".join(f"{k}={v:.4f}" for k, v in out.items())
        print(f"{side} semseed={s} {cfg} {metrics}", flush=True)
