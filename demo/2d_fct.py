"""4-layer DGP on a 2-D function, evaluated along the diagonal trace
(ref: demo/2d_fct.ipynb)."""
import numpy as np
from _common import plt, save, band

from dgp_tpu import dgp, kernel, combine, emulator, nb_seed

nb_seed(99)
f = lambda x, y: np.sin(1 / ((0.7 * x + 0.3) * (0.7 * y + 0.3)))
X1 = np.array([0, .02, .075, .08, .14, .15, .155, .156, .18, .22, .29, .32,
               .36, .37, .42, .5, .57, .63, .72, .785, .8, .84, .925, 1])
X2 = np.array([.29, .02, .12, .58, .38, .87, .01, .12, .22, .08, .34, .185,
               .64, .02, .93, .15, .42, .71, 1, 0, .21, .5, .785, .21])
X = np.stack((X1, X2)).T
Y = f(X1, X2).reshape([-1, 1])

k = lambda **kw: kernel(length=np.array([1]), name='sexp', **kw)
m = dgp(X, [Y], combine(
    [k(), k()],
    [k(connect=np.arange(2)), k(connect=np.arange(2))],
    [k(connect=np.arange(2)), k(connect=np.arange(2))],
    [k(scale_est=True, connect=np.arange(2))]))
m.train(N=500)
emu = emulator(m.estimate(), N=100)

z1 = np.linspace(0, 1, 100)[:, None]
z = np.concatenate((z1, z1), axis=1)
mu, var = emu.predict(x=z, method='mean_var')
print('rmse along diagonal:',
      float(np.sqrt(np.mean((mu.flatten() - f(z1, z1).flatten()) ** 2))))
band(z1, mu, var)
plt.plot(z1, f(z1, z1), lw=1)
save('2d_fct.png')
