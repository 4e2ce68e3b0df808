"""3-class DGP classification on the wine dataset vs sklearn's
GaussianProcessClassifier (ref: demo/DGP_classification.ipynb; reference
metrics: DGP log-loss 0.0590 / accuracy 1.000, GPC 0.4563 / 0.9722)."""
import numpy as np
from _common import plt, save  # noqa: F401  (keeps matplotlib headless)
from sklearn.datasets import load_wine
from sklearn.preprocessing import MinMaxScaler
from sklearn.gaussian_process import GaussianProcessClassifier
from sklearn.gaussian_process.kernels import Matern
from sklearn.model_selection import train_test_split
from sklearn.metrics import log_loss, accuracy_score

from dgp_tpu import dgp, kernel, combine, emulator, Categorical, nb_seed

random_state = 99
np.random.seed(random_state)
nb_seed(random_state)

X_wine, y_wine = load_wine(return_X_y=True)
X_wine = MinMaxScaler().fit_transform(X_wine)
Xtr, Xte, ytr, yte = train_test_split(X_wine, y_wine, test_size=0.2,
                                      random_state=random_state)

ker = 1.0 * Matern([1.0] * 13, nu=2.5, length_scale_bounds=(1e-5, 1e8))
m_gp = GaussianProcessClassifier(kernel=ker, random_state=random_state)
m_gp.fit(Xtr, ytr)

layer1 = [kernel(length=np.array([1]), name='matern2.5', nugget=1e-6)
          for _ in range(Xtr.shape[1])]
layer2 = [kernel(length=np.array([1]), name='matern2.5', scale_est=True,
                 nugget=1e-4, nugget_est=True) for _ in range(3)]
m_dgp = dgp(Xtr, ytr.reshape(-1, 1), combine(layer1, layer2, [Categorical()]))
m_dgp.train(N=200)
emu = emulator(m_dgp.estimate())
prob = emu.predict(Xte)[0]

print(f"{'Classifier':<16} {'Log Loss':>9} {'Accuracy':>9}")
print(f"{'GPClassifier':<16} {log_loss(yte, m_gp.predict_proba(Xte)):>9.4f} "
      f"{accuracy_score(yte, m_gp.predict(Xte)):>9.4f}")
print(f"{'DGPClassifier':<16} {log_loss(yte, prob):>9.4f} "
      f"{accuracy_score(yte, np.argmax(prob, axis=1)):>9.4f}")
