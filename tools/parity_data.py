"""Shared data generation for the parity configs.

Both tools/parity.py (our framework) and tools/ref_anchor.py (the actual
reference library running pure-Python under tools/refshim) import these,
so the two sides train and score on IDENTICAL draws -- the anchor numbers
in REF_ANCHORS.json are directly comparable to PARITY_r04.json rows.

Each function reproduces one reference demo notebook's data cells
(file:cell citations inline); stochastic draws use a private RandomState
so global seeding elsewhere cannot desynchronise the two runs.
"""
import numpy as np

MC_IN = "/root/reference/demo/mc_input.txt"
MC_OUT = "/root/reference/demo/mc_output.txt"


def step_data():
    """step_fct.ipynb cell 2: n=10 exact 1-D step."""
    n = 10
    X = np.linspace(0, 1., n)[:, None]
    f = lambda x: -1. if x < 0.5 else 1.
    Y = np.array([f(x) for x in X]).reshape(-1, 1)
    z = np.linspace(0, 1, 300)[:, None]
    truth = np.array([f(x) for x in z]).reshape(-1, 1)
    return X, Y, z, truth


def twod_data():
    """2d_fct.ipynb cell 2: n=24 2-D function; diagonal test path."""
    f = lambda x, y: np.sin(1 / ((0.7 * x + 0.3) * (0.7 * y + 0.3)))
    X1 = np.array([0, .02, .075, .08, .14, .15, .155, .156, .18, .22, .29,
                   .32, .36, .37, .42, .5, .57, .63, .72, .785, .8, .84,
                   .925, 1])
    X2 = np.array([.29, .02, .12, .58, .38, .87, .01, .12, .22, .08, .34,
                   .185, .64, .02, .93, .15, .42, .71, 1, 0, .21, .5,
                   .785, .21])
    X = np.stack((X1, X2)).T
    Y = f(X1, X2).reshape([-1, 1])
    z1 = np.linspace(0, 1, 100)[:, None]
    z = np.concatenate((z1, z1), axis=1)
    truth = f(z1, z1).reshape(-1, 1)
    return X, Y, z, truth


def motorcycle_data():
    """non_Gaussian_likelihood.ipynb cell 12: motorcycle crash, n=133."""
    X = np.loadtxt(MC_IN).reshape(-1, 1)
    Y = np.loadtxt(MC_OUT).reshape(-1, 1)
    X = (X - np.min(X)) / (np.max(X) - np.min(X))
    Y = (Y - Y.mean()) / Y.std()
    return X, Y


def poisson_data():
    """non_Gaussian_likelihood.ipynb cell 19: Poisson counts with reps,
    n=90 train rows, 200 test points; the test NLL is draw-dependent so
    both sides must score this exact draw (seed 99)."""
    rs = np.random.RandomState(99)
    n = 10
    X = np.linspace(0, .3, n)[:, None]
    for _ in range(4):
        X = np.concatenate((X, np.linspace(0, .3, n)[:, None]), axis=0)
        X = np.concatenate((X, np.linspace(0.35, 1, n)[:, None]), axis=0)
    f = lambda x: np.exp(np.exp(-1.5 * np.sin(1 / ((0.7 * 0.8 * (1.5 * x + 0.1)
                                                    + 0.3) ** 2))))
    Y = np.array([rs.poisson(f(x)) for x in X]).reshape(-1, 1)
    z = np.linspace(0, 1., 200)[:, None]
    test_Yz = np.array([rs.poisson(f(x)) for x in z]).reshape(-1, 1)
    return X, Y, z, test_Yz, f


def negbin_data():
    """non_Gaussian_likelihood.ipynb cell 25: NegBin draws, n=180 train
    rows (30 sites x 6 reps), step mean + smooth dispersion."""
    rs = np.random.RandomState(99)
    n = 30
    X = np.linspace(0, 1, n)[:, None]
    for _ in range(5):
        X = np.concatenate((X, np.linspace(0, 1, n)[:, None]), axis=0)
    f1 = lambda x: 1 / np.exp(2) if x < 0.5 else np.exp(2)
    f2 = lambda x: np.exp(6 * x ** 2 - 3)
    Y = np.array([rs.negative_binomial(1 / f2(x), 1 / (1 + f1(x) * f2(x)))
                  for x in X]).reshape(-1, 1)
    Xt = np.linspace(0, 1., 200)[:, None]
    Yt = np.array([f1(x) for x in Xt]).reshape(-1, 1)
    test_Yt = np.array([rs.negative_binomial(1 / f2(x),
                                             1 / (1 + f1(x) * f2(x)))
                        for x in Xt]).reshape(-1, 1)
    return X, Y, Xt, Yt, test_Yt


def linked_data():
    """model_linking.ipynb cells 2/9/16: GP(f1) -> DGP(f2) chain."""
    f1 = lambda x: (np.sin(7.5 * x) + 1) / 2
    f2 = lambda x: (2 / 3 * np.sin(2 * (2 * x - 1))
                    + 4 / 3 * np.exp(-30 * (2 * (2 * x - 1)) ** 2) - 1 / 3)
    X1 = np.linspace(0, 1., 9)[:, None]
    Y1 = f1(X1)
    X2 = np.linspace(0, 1., 11)[:, None]
    Y2 = f2(X2)
    z = np.linspace(0, 1, 300)[:, None]
    truth = f2(f1(z)).reshape(-1, 1)
    return X1, Y1, X2, Y2, z, truth


def wine_data():
    """DGP_classification.ipynb cell 2: wine 80/20 split, seed 99."""
    from sklearn.datasets import load_wine
    from sklearn.preprocessing import MinMaxScaler
    from sklearn.model_selection import train_test_split
    Xw, yw = load_wine(return_X_y=True)
    Xw = MinMaxScaler().fit_transform(Xw)
    return train_test_split(Xw, yw, test_size=0.2, random_state=99)


def zip_data():
    """Synthetic ZIP draw (no reference notebook publishes a ZIP demo; the
    generator mirrors the negbin one: smooth log-rate + smooth inflation
    logit, 40 sites x 4 reps, seed 99, scored on a fresh 200-point draw)."""
    rs = np.random.RandomState(99)
    n = 40
    X = np.linspace(0, 1, n)[:, None]
    for _ in range(3):
        X = np.concatenate((X, np.linspace(0, 1, n)[:, None]), axis=0)
    f_lam = lambda x: np.exp(1.2 * np.sin(2 * np.pi * x) + 1.0)
    f_pi = lambda x: 1.0 / (1.0 + np.exp(-(2.5 * x - 1.0)))
    lam = f_lam(X[:, 0])
    pi = f_pi(X[:, 0])
    Y = np.where(rs.rand(len(X)) < pi, 0,
                 rs.poisson(lam)).reshape(-1, 1).astype(float)
    Xt = np.linspace(0, 1, 200)[:, None]
    lam_t, pi_t = f_lam(Xt[:, 0]), f_pi(Xt[:, 0])
    Yt_mean = ((1 - pi_t) * lam_t).reshape(-1, 1)
    test_Yt = np.where(rs.rand(len(Xt)) < pi_t, 0,
                       rs.poisson(lam_t)).reshape(-1, 1).astype(float)
    return X, Y, Xt, Yt_mean, test_Yt


def vecchia_data():
    """vecchia_SI.ipynb cells 2-4: n=5000 composed function + noise."""
    rng = np.random.RandomState(123)

    def func(x):
        y1 = (np.sin(7.5 * x) + 1) / 2
        return (2 / 3 * np.sin(2 * (2 * y1 - 1))
                + 4 / 3 * np.exp(-30 * (2 * (2 * y1 - 1)) ** 2) - 1 / 3)

    n = 5000
    X = rng.rand(n, 1) * 2 - 1
    Y = func(X) + 0.05 * rng.randn(n, 1)
    z = np.linspace(-1, 1, 2000)[:, None]
    truth = func(z)
    return X, Y, z, truth


def multioutput_data():
    """multi-output.ipynb cell 2: n=13, two outputs sharing one latent."""
    X = np.linspace(0, 1, 13).reshape(-1, 1)
    Y1 = 3 * np.cos(20 * X - 10)
    Y2 = 2 * X * np.cos(20 * X - 10)
    z = np.linspace(0, 1, 100).reshape(-1, 1)
    t1 = 3 * np.cos(20 * z - 10)
    t2 = 2 * z * np.cos(20 * z - 10)
    return (X, np.concatenate((Y1, Y2), 1), z,
            np.concatenate((t1, t2), 1))
