"""Headline benchmark: 2-layer DGP stochastic-imputation training at n=2000
under the Vecchia approximation (BASELINE.json north-star config; model/data
shape mirrors demo/vecchia_SI.ipynb).

Baseline: the reference (Numba + OpenBLAS, CPU) runs this Vecchia-SI config
at 0.48 it/s for n=5000 (demo/vecchia_SI.ipynb cell 7).  Its per-iteration
cost is ~linear in n (n independent m^3 blocks), giving an extrapolated
baseline of 0.48 * 5000/2000 = 1.2 it/s at n=2000.  vs_baseline is the
measured speedup over that.

Runs in float32 on TPU (the compute path is batched (n, m+1, m+1) masked
Cholesky + column-unrolled solves, float64 log-lik accumulation); quality is
gated by an RMSE check against the noiseless truth, reported in the JSON.
"""
import json
import time

import numpy as np


def func(x):
    y1 = (np.sin(7.5 * x) + 1) / 2
    return (2 / 3 * np.sin(2 * (2 * y1 - 1))
            + 4 / 3 * np.exp(-30 * (2 * (2 * y1 - 1)) ** 2) - 1 / 3)


def main():
    import jax
    import dgp_tpu
    if jax.default_backend() != "cpu":
        dgp_tpu.set_default_dtype("float32")
    from dgp_tpu import dgp, kernel, combine, emulator, nb_seed

    nb_seed(123)
    rng = np.random.RandomState(123)
    n = 2000
    X = rng.rand(n, 1) * 2 - 1
    Y = func(X) + 0.05 * rng.randn(n, 1)

    layer1 = [kernel(length=np.array([0.5]), name='sexp', nugget=1e-4)]
    layer2 = [kernel(length=np.array([0.5]), name='sexp', nugget=1e-4,
                     nugget_est=True, scale_est=True, connect=np.arange(1))]
    m = dgp(X, Y, combine(layer1, layer2), vecchia=True, m=25)

    # warm-up through iteration 24 (compiles every power-of-2 chunk size)
    m.train(N=24, disable=True, chunk_size=16)
    # timed run
    n_iters = 104
    t0 = time.time()
    m.train(N=n_iters, disable=True, chunk_size=16)
    dt = time.time() - t0
    it_s = n_iters / dt

    emu = emulator(m.estimate(), N=5)
    z = np.linspace(-1, 1, 1000).reshape(-1, 1)
    mu, var = emu.predict(z, m=50)
    rmse = float(np.sqrt(np.mean((mu - func(z)) ** 2)))

    baseline_it_s = 0.48 * 5000 / 2000  # reference extrapolated to n=2000
    print(json.dumps({
        "metric": "vecchia_SI_train_iters_per_sec_n2000",
        "value": round(it_s, 3),
        "unit": "it/s",
        "vs_baseline": round(it_s / baseline_it_s, 2),
        "rmse": round(rmse, 4),
        "platform": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
