"""SEM-seed noise floor of a parity metric, on either side.

Runs the dgp_poisson parity configuration (tools/parity.py) on the IDENTICAL
data draw (tools/parity_data.py pins the data RNG internally) while varying
only the SEM seed, for dgp_tpu or for the actual reference (dgpsi under
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


def run_ours(seed):
    sys.path.insert(0, _ROOT)
    from dgp_tpu import dgp, kernel, combine, emulator, Poisson, nb_seed
    nb_seed(seed)
    X, Y, z, test_Yz, f = pdata.poisson_data()
    all_layer = combine(
        [kernel(length=np.array([0.5]), name='matern2.5')],
        [kernel(length=np.array([0.1]), name='matern2.5', scale_est=True,
                connect=np.arange(1))],
        [Poisson()])
    m = dgp(X, [Y], all_layer)
    m.train(N=500, disable=True)
    emu = emulator(m.estimate())
    return float(np.asarray(emu.nllik(z, test_Yz)[0]))


def run_ref(seed):
    sys.path.insert(0, os.path.join(_HERE, "refshim"))
    sys.path.insert(0, "/root/reference")
    import dgpsi as d
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
    return float(np.asarray(emu.nllik(z, test_Yz)[0]))


if __name__ == "__main__":
    side = sys.argv[1]
    for s in [int(x) for x in sys.argv[2:]] or [99]:
        nll = (run_ours if side == "ours" else run_ref)(s)
        print(f"{side} semseed={s} dgp_poisson test_nllik={nll:.4f}",
              flush=True)
