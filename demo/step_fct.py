"""3-layer DGP on the 1-D step function (ref: demo/step_fct.ipynb).

Part 1: exact observations, n=10, sexp kernels.
Part 2: noisy observations, n=40, Matérn-2.5 with nugget estimation.
"""
import numpy as np
from _common import plt, save, band

from dgp_tpu import dgp, kernel, combine, emulator, nb_seed

nb_seed(99)

# --- part 1: exact step, n=10 (notebook cells 2-7) ---
n = 10
X = np.linspace(0, 1., n)[:, None]
f = lambda x: np.where(x < 0.5, -1., 1.)
Y = f(X)
m = dgp(X, [Y], combine(
    [kernel(length=np.array([1.]), name='sexp')],
    [kernel(length=np.array([1.]), name='sexp')],
    [kernel(length=np.array([1.]), name='sexp', scale_est=True)]))
m.train(N=500)
emu = emulator(m.estimate())
z = np.linspace(0, 1, 300)[:, None]
mu, var = emu.predict(z, method='mean_var')
print('rmse (exact, n=10):', float(np.sqrt(np.mean((mu - f(z)) ** 2))))
band(z, mu, var)
plt.plot(z, f(z), color='black', lw=1)
plt.scatter(X, Y, color='black')
save('step_fct_exact.png')

# --- part 2: noisy step, n=40, Matérn + nugget_est (cells 9-14) ---
rs = np.random.RandomState(99)
n = 40
X = np.linspace(0, 1., n)[:, None]
Y = f(X) + rs.randn(*X.shape) * 0.02
m = dgp(X, [Y], combine(
    [kernel(length=np.array([0.5]), name='matern2.5', nugget_est=True)],
    [kernel(length=np.array([0.5]), name='matern2.5', nugget_est=True)],
    [kernel(length=np.array([0.5]), name='matern2.5', nugget_est=True,
            scale_est=True)]))
m.train(N=1000)
emu = emulator(m.estimate())
z = np.linspace(0, 1, 100)[:, None]
mu, var = emu.predict(z, method='mean_var')
print('rmse (noisy, n=40):', float(np.sqrt(np.mean((mu - f(z)) ** 2))))
band(z, mu, var)
plt.plot(z, f(z), color='black', lw=1, alpha=0.8)
plt.scatter(X, Y, color='black', alpha=0.8)
save('step_fct_noisy.png')
