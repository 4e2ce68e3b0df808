"""Linked (D)GP emulation of a feed-forward 2-model system: a GP emulator of
f1 feeding a DGP emulator of f2, composed with `container`/`lgp`
(ref: demo/model_linking.ipynb cells 16-28)."""
import numpy as np
from _common import plt, save

from dgp_tpu import dgp, gp, kernel, combine, container, lgp, nb_seed

nb_seed(99)
f1 = lambda x: (np.sin(7.5 * x) + 1) / 2
f2 = lambda x: (2 / 3 * np.sin(2 * (2 * x - 1))
                + 4 / 3 * np.exp(-30 * (2 * (2 * x - 1)) ** 2) - 1 / 3)

# first model: plain GP on f1
X1 = np.linspace(0, 1., 9)[:, None]
m1 = gp(X1, f1(X1), kernel(length=np.array([1.]), name='matern2.5',
                           scale_est=True))
m1.train()
c1 = container(m1.export(), local_input_idx=np.array([0]))

# second model: 2-layer DGP on f2
X2 = np.linspace(0, 1., 11)[:, None]
m2 = dgp(X2, [f2(X2)], combine(
    [kernel(length=np.array([1.]), name='matern2.5')],
    [kernel(length=np.array([1.]), name='matern2.5', scale_est=True,
            connect=np.arange(1))]))
m2.train(N=500)
c2 = container(m2.estimate(), local_input_idx=np.array([0]))

# linked system prediction
lm = lgp([[c1], [c2]])
z = np.linspace(0, 1, 300)[:, None]
ml, vl = lm.predict(z)
truth = f2(f1(z)).flatten()
print('linked rmse:', float(np.sqrt(np.mean(
    (np.asarray(ml[0]).flatten() - truth) ** 2))))

s = np.sqrt(np.asarray(vl[0])).flatten()
mu = np.asarray(ml[0]).flatten()
plt.fill_between(z.flatten(), mu + 2 * s, mu - 2 * s, facecolor='grey',
                 alpha=0.5)
plt.plot(z, truth, lw=2, alpha=0.9)
plt.plot(z, mu, '--', color='r', lw=1)
plt.scatter(X1, f2(f1(X1)), color='r')
save('model_linking.png')
