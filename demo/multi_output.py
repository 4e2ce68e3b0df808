"""2-layer multi-output DGP: two outputs share one latent layer
(ref: demo/multi-output.ipynb)."""
import numpy as np
from _common import plt, save

from dgp_tpu import dgp, kernel, combine, emulator, nb_seed

nb_seed(99)
X = np.linspace(0, 1, 13).reshape(-1, 1)
Y1 = 3 * np.cos(20 * X - 10)
Y2 = 2 * X * np.cos(20 * X - 10)
z = np.linspace(0, 1, 100).reshape(-1, 1)

m = dgp(X, [np.concatenate((Y1, Y2), 1)], combine(
    [kernel(length=np.array([.5]), name='sexp')],
    [kernel(length=np.array([.5]), name='sexp', connect=np.arange(1),
            scale_est=True),
     kernel(length=np.array([.5]), name='sexp', connect=np.arange(1),
            scale_est=True)]))
m.train(N=500)
emu = emulator(m.estimate())
mu, var = emu.predict(z, method='mean_var')
t1, t2 = 3 * np.cos(20 * z - 10), 2 * z * np.cos(20 * z - 10)
print('rmse out1:', float(np.sqrt(np.mean((mu[:, :1] - t1) ** 2))))
print('rmse out2:', float(np.sqrt(np.mean((mu[:, 1:] - t2) ** 2))))

plt.figure(figsize=(8, 4))
plt.plot(X, Y1, "x", mew=2)
plt.plot(X, Y2, "x", mew=2)
plt.plot(z, t1)
plt.plot(z, t2)
for j, c in ((0, 'blue'), (1, 'lime')):
    s = np.sqrt(var[:, j])
    plt.plot(z, mu[:, j], '--', color=c, lw=1.5)
    plt.fill_between(z.flatten(), mu[:, j] - 2 * s, mu[:, j] + 2 * s,
                     color=c, alpha=0.2)
save('multi_output.png')
