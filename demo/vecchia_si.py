"""Vecchia-approximated Stochastic Imputation at n=5000: 2-layer DGP vs a
plain Vecchia GP (ref: demo/vecchia_SI.ipynb; the reference trains this DGP
at 0.48 it/s on CPU)."""
import time

import numpy as np
from _common import plt, save

from dgp_tpu import dgp, gp, kernel, combine, emulator, nb_seed

nb_seed(123)
rng = np.random.RandomState(123)


def func(x):
    y1 = (np.sin(7.5 * x) + 1) / 2
    return (2 / 3 * np.sin(2 * (2 * y1 - 1))
            + 4 / 3 * np.exp(-30 * (2 * (2 * y1 - 1)) ** 2) - 1 / 3)


N = 5000
X = rng.rand(N, 1) * 2 - 1
Y = func(X) + 0.05 * rng.randn(N, 1)
z = np.linspace(-1, 1, 2000)[:, None]

# --- 2-layer Vecchia-SI DGP ---
m_dgp = dgp(X, Y, combine(
    [kernel(length=np.array([0.5]), name='sexp')],
    [kernel(length=np.array([0.5]), name='sexp', nugget_est=True,
            scale_est=True, connect=np.arange(1))]), vecchia=True)
t0 = time.time()
m_dgp.train(N=100, chunk_size=16)
print(f'DGP training: {100 / (time.time() - t0):.2f} it/s '
      '(reference CPU: 0.48 it/s)')
emu = emulator(m_dgp.estimate())
mu, var = emu.predict(z, method='mean_var', m=200)
print('DGP rmse vs truth:', float(np.sqrt(np.mean((mu - func(z)) ** 2))))
plt.figure(figsize=(12, 4))
plt.plot(X, Y, "x", alpha=0.1)
plt.plot(z, func(z), c="k", lw=1.5)
plt.plot(z, mu, lw=1.4)
plt.fill_between(z[:, 0], (mu - 2 * var ** 0.5)[:, 0],
                 (mu + 2 * var ** 0.5)[:, 0], alpha=0.6)
save('vecchia_si_dgp.png')

# --- plain Vecchia GP comparison ---
m_gp = gp(X, Y, kernel(length=np.array([1.]), name='sexp', nugget_est=True,
                       scale_est=True), vecchia=True)
m_gp.train()
mu_gp, var_gp = m_gp.predict(z, method='mean_var', m=200)
print('GP rmse vs truth:', float(np.sqrt(np.mean((mu_gp - func(z)) ** 2))))
plt.figure(figsize=(12, 4))
plt.plot(X, Y, "x", alpha=0.1)
plt.plot(z, func(z), c="k", lw=1.5)
plt.plot(z, mu_gp, lw=1.4)
plt.fill_between(z[:, 0], (mu_gp - 2 * var_gp ** 0.5)[:, 0],
                 (mu_gp + 2 * var_gp ** 0.5)[:, 0], alpha=0.6)
save('vecchia_si_gp.png')
