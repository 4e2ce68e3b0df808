"""Prior sample paths of DGP structures via `path`
(ref: demo/sample_path.ipynb)."""
import numpy as np
from _common import plt, save

from dgp_tpu import path, kernel, combine, nb_seed

nb_seed(99)

# --- 1-D, 3-layer prior paths ---
layer_all = combine([kernel(length=np.array([1]), name='sexp')],
                    [kernel(length=np.array([1]), name='sexp')],
                    [kernel(length=np.array([1]), name='sexp')])
data = np.linspace(-1, 1, 200)[:, None]
samp = path(data, layer_all).generate(15)
plt.plot(data, np.asarray(samp[0, :]).T)
save('sample_path_1d.png')

# --- 2-D input, anisotropic first layer ---
layer_all = combine([kernel(length=np.array([1, 2]), name='sexp')],
                    [kernel(length=np.array([1]), name='sexp')],
                    [kernel(length=np.array([1]), name='sexp')])
X, Y = np.meshgrid(np.arange(0, 1, 0.02), np.arange(0, 1, 0.02))
data = np.vstack((X.flatten(), Y.flatten())).T
samp = path(data, layer_all).generate(1)
ax = plt.figure().add_subplot(projection='3d')
ax.plot_surface(X, Y, np.reshape(np.asarray(samp[0, :]).flatten(), X.shape),
                cmap='viridis', edgecolor='none', antialiased=False, alpha=0.6)
ax.view_init(elev=40., azim=-60)
save('sample_path_2d.png')
