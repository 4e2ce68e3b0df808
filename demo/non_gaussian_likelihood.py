"""Non-Gaussian likelihood layers: heteroskedastic Gaussian (synthetic +
motorcycle data), Poisson (GP and DGP), and NegBin
(ref: demo/non_Gaussian_likelihood.ipynb)."""
import os

import numpy as np
from _common import plt, save, band

from dgp_tpu import dgp, kernel, combine, emulator, Poisson, Hetero, NegBin, nb_seed

nb_seed(99)
rs = np.random.RandomState(99)

# --- Hetero on synthetic replicated data (cells 2-10) ---
n = 12
X = np.linspace(0, 1, n)[:, None]
for _ in range(5):
    X = np.concatenate((X, np.linspace(0, 1, n)[:, None]), axis=0)
f1 = lambda x: np.where(x < 0.5, -1., 1.)
f2 = lambda x: np.exp(1.5 * np.sin((x - 0.3) * 7.) - 6.5)
Y = rs.normal(f1(X), np.sqrt(f2(X)))
z = np.linspace(0, 1., 200)[:, None]

m = dgp(X, [Y], combine(
    [kernel(length=np.array([0.5]), name='matern2.5')],
    [kernel(length=np.array([0.2]), name='matern2.5', scale_est=True,
            connect=np.arange(1)),
     kernel(length=np.array([0.2]), name='matern2.5', scale_est=True,
            connect=np.arange(1))],
    [Hetero()]))
m.train(N=500)
emu = emulator(m.estimate())
mu, var = emu.predict(z, method='mean_var', full_layer=True)
print('hetero synthetic: rmse(mean) =',
      float(np.sqrt(np.mean((np.asarray(mu[-1]).flatten() - f1(z).flatten()) ** 2))))
band(z, np.asarray(mu[-1]), np.asarray(var[-1]))
plt.scatter(X, Y, color='black', s=8)
plt.plot(z, f1(z))
save('hetero_synthetic.png')

# --- Hetero on the motorcycle data (cells 12-17) ---
mc_in = '/root/reference/demo/mc_input.txt'
if os.path.exists(mc_in):
    X = np.loadtxt(mc_in).reshape(-1, 1)
    Y = np.loadtxt(mc_in.replace('input', 'output')).reshape(-1, 1)
    X = (X - np.min(X)) / (np.max(X) - np.min(X))
    Y = (Y - Y.mean()) / Y.std()
    m = dgp(X, [Y], combine(
        [kernel(length=np.array([0.5]), name='sexp')],
        [kernel(length=np.array([0.2]), name='sexp', scale_est=True,
                connect=np.arange(1)) for _ in range(2)],
        [Hetero()]))
    m.train(N=500)
    emu = emulator(m.estimate())
    z = np.linspace(0, 1, 100)[:, None]
    mu, var = emu.predict(z, method='mean_var')
    print('motorcycle: train nllik =', float(np.asarray(emu.nllik(X, Y)[0])))
    band(z, mu, var)
    plt.scatter(X, Y, color='black', s=8)
    save('hetero_motorcycle.png')

# --- GP + Poisson (cells 19-21; reference NLL 1.827) ---
n = 10
X = np.linspace(0, .3, n)[:, None]
for _ in range(4):
    X = np.concatenate((X, np.linspace(0, .3, n)[:, None]), axis=0)
    X = np.concatenate((X, np.linspace(0.35, 1, n)[:, None]), axis=0)
f = lambda x: np.exp(np.exp(-1.5 * np.sin(1 / ((0.7 * 0.8 * (1.5 * x + 0.1)
                                                + 0.3) ** 2))))
Y = rs.poisson(f(X))
z = np.linspace(0, 1., 200)[:, None]
test_Yz = rs.poisson(f(z))

m = dgp(X, [Y], combine(
    [kernel(length=np.array([0.5]), name='matern2.5', scale_est=True)],
    [Poisson()]))
m.train(N=500)
emu = emulator(m.estimate())
mu, var = emu.predict(z, method='mean_var', full_layer=True)
print('GP+Poisson: test nllik =', float(np.asarray(emu.nllik(z, test_Yz)[0])),
      '(reference: 1.827)')
plt.plot(z, f(z), color='black')
plt.plot(z, np.asarray(mu[-1]), '--', color='red', lw=2)
plt.scatter(X, Y, color='r', s=6)
save('poisson_gp.png')

# --- 2-layer DGP + Poisson (cell 22; reference NLL 1.779) ---
m = dgp(X, [Y], combine(
    [kernel(length=np.array([0.5]), name='matern2.5')],
    [kernel(length=np.array([0.1]), name='matern2.5', scale_est=True,
            connect=np.arange(1))],
    [Poisson()]))
m.train(N=500)
emu = emulator(m.estimate())
print('DGP+Poisson: test nllik =', float(np.asarray(emu.nllik(z, test_Yz)[0])),
      '(reference: 1.779)')

# --- 2-layer DGP + NegBin (cells 25-27) ---
n = 30
X = np.linspace(0, 1, n)[:, None]
for _ in range(5):
    X = np.concatenate((X, np.linspace(0, 1, n)[:, None]), axis=0)
g1 = lambda x: np.where(x < 0.5, 1 / np.exp(2), np.exp(2))
g2 = lambda x: np.exp(6 * x ** 2 - 3)
Y = rs.negative_binomial(1 / g2(X), 1 / (1 + g1(X) * g2(X)))
Xt = np.linspace(0, 1., 200)[:, None]

m = dgp(X, [Y], combine(
    [kernel(length=np.array([0.5]), name='matern2.5')],
    [kernel(length=np.array([0.02]), name='matern2.5', scale_est=True,
            connect=np.arange(1)),
     kernel(length=np.array([0.02]), name='matern2.5', scale_est=True,
            connect=np.arange(1))],
    [NegBin()]))
m.train(N=500)
emu = emulator(m.estimate())
mu, var = emu.predict(Xt, method='mean_var', full_layer=True)
plt.plot(Xt, g1(Xt), color='black')
plt.plot(Xt, np.asarray(mu[-1]), '--', color='red', lw=2)
plt.scatter(X, Y, color='r', s=6)
save('negbin.png')
print('done')
