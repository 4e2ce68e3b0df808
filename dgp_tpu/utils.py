"""Persistence, summaries, seeding, Nystrom KPCA, and multistart
optimisation.

API mirror of reference `dgpsi/utils.py`.  `write`/`read` persist the whole
emulator object (pickle; the object graph is plain numpy + config, no device
buffers).  `multistart` maps independent optimisation starts over the device
mesh instead of a process pool.
"""
import pickle

import numpy as np
from tabulate import tabulate

from . import rng


# ----------------------------------------------------------------------
# persistence
# ----------------------------------------------------------------------
def write(emu, pkl_file):
    """Save an emulator (gp / emulator / lgp / dgp) to `<path>.pkl`
    (utils.py:18)."""
    state = _strip_compiled(emu)
    with open(pkl_file + ".pkl", "wb") as f:
        pickle.dump(emu, f)
    _restore_compiled(emu, state)


def read(pkl_file):
    """Load an emulator saved by `write` (utils.py:30)."""
    with open(pkl_file + ".pkl", "rb") as f:
        return pickle.load(f)


def _strip_compiled(obj, _seen=None):
    """Temporarily remove compiled-engine handles (jitted closures are not
    picklable) before serialisation."""
    stripped = []
    stack = [obj]
    seen = set()
    while stack:
        o = stack.pop()
        if id(o) in seen:
            continue
        seen.add(id(o))
        if hasattr(o, '_compiled') and o._compiled is not None:
            stripped.append((o, o._compiled))
            o._compiled = None
        if hasattr(o, '__dict__'):
            for v in o.__dict__.values():
                if hasattr(v, '__dict__') or isinstance(v, (list, tuple)):
                    stack.append(v)
        elif isinstance(o, (list, tuple)):
            stack.extend(o)
    return stripped


def _restore_compiled(obj, stripped):
    for o, c in stripped:
        o._compiled = c


# ----------------------------------------------------------------------
# seeding / thread API parity
# ----------------------------------------------------------------------
def nb_seed(value):
    """Seed the device-side RNG streams (parity with utils.nb_seed)."""
    rng.seed(int(value))


_thread_count = 1


def get_thread():
    """Thread-count parity shim: XLA owns device parallelism."""
    return _thread_count


def set_thread(value):
    global _thread_count
    _thread_count = int(value)


def have_same_shape(list1, list2):
    if len(list1) != len(list2):
        return False
    for a, b in zip(list1, list2):
        if isinstance(a, list) and isinstance(b, list):
            if not have_same_shape(a, b):
                return False
        elif isinstance(a, list) or isinstance(b, list):
            return False
    return True


# ----------------------------------------------------------------------
# summary tables
# ----------------------------------------------------------------------
def _fmt(x, fixed=False):
    s = np.array2string(np.atleast_1d(x)[0], precision=3, floatmode='fixed')
    return f"{s} (fixed)" if fixed else s


def summary(obj, tablefmt='fancy_grid'):
    """Tabulated summaries of kernel / gp / dgp / emulator / lgp objects
    (utils.py:69)."""
    name = type(obj).__name__
    info = []
    if name == 'kernel':
        info.append(['Kernel Fun', 'Length-scale(s)', 'Variance', 'Nugget'])
        info.append(['Squared-Exp' if obj.name == 'sexp' else 'Matern-2.5',
                     np.array2string(obj.length, precision=3, floatmode='fixed', separator=', '),
                     _fmt(obj.scale, not obj.scale_est),
                     _fmt(obj.nugget, not obj.nugget_est)])
        print(tabulate(info, headers='firstrow', tablefmt=tablefmt))
    elif name == 'gp':
        k = obj.kernel
        info.append(['Kernel Fun', 'Length-scale(s)', 'Variance', 'Nugget', 'Input Dims'])
        dims = (np.array2string(k.input_dim + 1, separator=', ') if k.connect is None
                else np.array2string(np.concatenate((k.input_dim + 1, k.connect + 1)), separator=', '))
        info.append(['Squared-Exp' if k.name == 'sexp' else 'Matern-2.5',
                     np.array2string(k.length, precision=3, floatmode='fixed', separator=', '),
                     _fmt(k.scale, not k.scale_est), _fmt(k.nugget, not k.nugget_est), dims])
        print(tabulate(info, headers='firstrow', tablefmt=tablefmt))
        print("'Input Dims' indicates the dimensions (i.e., column indices) of "
              "your input data that are used for GP emulator training.")
    elif name in ('dgp', 'emulator'):
        if name == 'dgp' and obj.N != 0:
            print('To summarise a trained DGP, construct an emulator() and summary() it.')
            return
        all_layer = obj.all_layer
        info.append(['Layer No.', 'Node No.', 'Type', 'Length-scale(s)', 'Variance',
                     'Nugget', 'Input Dims', 'Global Connection'])
        for l, layer in enumerate(all_layer):
            for k, nd in enumerate(layer):
                is_lik = nd.type == 'likelihood'
                t = ('GP (Squared-Exp)' if nd.name == 'sexp'
                     else 'GP (Matern-2.5)' if nd.name == 'matern2.5'
                     else f'Likelihood ({nd.name})')
                dims = np.array2string(np.asarray(nd.input_dim) + 1, separator=', ')
                if l == 0 and not is_lik and nd.connect is not None:
                    dims = np.array2string(np.concatenate((nd.input_dim + 1, nd.connect + 1)), separator=', ')
                conn = ('NA' if is_lik else 'No' if l == 0
                        else np.array2string(nd.connect + 1, separator=', ')
                        if nd.connect is not None else 'No')
                info.append([f'Layer {l+1}', f'Node {k+1}', t,
                             'NA' if is_lik else np.array2string(nd.length, precision=3, floatmode='fixed', separator=', '),
                             'NA' if is_lik else _fmt(nd.scale, not nd.scale_est),
                             'NA' if is_lik else _fmt(nd.nugget, not nd.nugget_est),
                             dims, conn])
        print(tabulate(info, headers='firstrow', tablefmt=tablefmt))
        print("1. 'Input Dims' presents the indices of GP nodes in the feeding "
              "layer whose outputs feed into the GP node.")
        print("2. 'Global Connection' indicates the dimensions (i.e., column "
              "indices) of the global input data used as additional inputs.")
    elif name == 'lgp':
        all_layer = obj.all_layer
        info.append(['Layer No.', 'Emulator No.', 'Type', 'Connection', 'External Inputs'])
        for l, layer in enumerate(all_layer):
            for k, cont in enumerate(layer):
                if l == 0:
                    links = f"Global input: {np.array2string(np.asarray(cont.local_input_idx) + 1, separator=', ')}"
                    external = 'No'
                else:
                    if isinstance(cont.local_input_idx, list):
                        local_input_idx = cont.local_input_idx
                    else:
                        local_input_idx = [None] * (l - 1) + [cont.local_input_idx]
                    links = ''
                    for i in range(len(local_input_idx)):
                        idx = local_input_idx[i]
                        if idx is None:
                            continue
                        emu_idx, out_idx, cnt = [], [], 0
                        for feeding in all_layer[i]:
                            n = 1 if feeding.type == 'gp' else len(feeding.structure[-1])
                            emu_idx += [cnt] * n
                            out_idx += list(range(n))
                            cnt += 1
                        for j in np.atleast_1d(idx):
                            links += (f"Emu {emu_idx[j]+1} in Layer {i+1}: "
                                      f"output {out_idx[j]+1}\n")
                    if cont.type == 'gp':
                        external = 'No' if cont.structure.connect is None else 'Yes'
                    else:
                        external = 'No' if cont.structure[0][0].connect is None else 'Yes'
                info.append([f'Layer {l+1}', f'Emu {k+1}',
                             'DGP' if cont.type == 'dgp' else 'GP', links, external])
        print(tabulate(info, headers='firstrow', tablefmt=tablefmt))
        print("1. 'Connection' gives the emulators and output dimensions linked "
              "to each emulator.")
        print("2. 'External Inputs' indicates whether the emulator has inputs "
              "not provided by feeding emulators.")


# ----------------------------------------------------------------------
# Nystrom kernel PCA (latent init at scale; utils.py:203)
# ----------------------------------------------------------------------
class NystromKPCA:
    def __init__(self, n_components, m=200):
        self.m = m
        self.n_components = n_components
        self.basis_inds = None

    def fit_transform(self, X):
        from sklearn.metrics.pairwise import pairwise_kernels

        n_samples = X.shape[0]
        self.m = min(n_samples, self.m)
        inds = np.random.permutation(n_samples)
        self.basis_inds = inds[:self.m]
        basis = X[self.basis_inds]
        K_nm = pairwise_kernels(X, basis, metric='sigmoid', filter_params=True)
        K_mm = K_nm[self.basis_inds]
        K_mm_p, K_nm_p = self._demean(K_mm, K_nm)
        K_inv_sqrt = self._inv(K_mm_p, sqrt=True)
        nystrom = K_inv_sqrt @ K_nm_p.T @ K_nm_p @ K_inv_sqrt / n_samples
        _, U = np.linalg.eigh(nystrom)
        U = U[:, ::-1]
        comps = K_inv_sqrt @ U[:, :self.n_components]
        scores = K_nm_p @ comps
        flip = (scores.min(0) + scores.max(0)) / 2 < 0
        return scores @ np.diag(1 - 2 * flip)

    def _demean(self, K_mm, K_nm):
        n, m = K_nm.shape
        n_mean = K_nm.sum(0) / n
        M1 = np.tile(n_mean, (n, 1))
        m0 = self._inv(K_mm) @ n_mean[:, None]
        M2 = np.tile(K_nm @ m0, (1, m))
        M3 = n_mean @ m0
        K_nm_p = K_nm - M1 - M2 + M3
        M1 = M1[:m]
        K_mm_p = K_mm - M1 - M1.T + M3
        return K_mm_p, K_nm_p

    @staticmethod
    def _inv(K, sqrt=False):
        U, S, V = np.linalg.svd(K)
        S = np.maximum(S, 1e-12)
        return (U / np.sqrt(S)) @ V if sqrt else (U / S) @ V


# ----------------------------------------------------------------------
# multistart optimisation (utils.py:271)
# ----------------------------------------------------------------------
def multistart(func, initials, lb, up, args=(), method='L-BFGS-B',
               core_num=None, out_dim=0, int_mask=None):
    """Multistart bounded minimisation of -func; returns the best start's
    optimum.  The reference runs starts in a process pool; here the starts
    run serially on the host with the objective free to dispatch device
    computation (they are cheap scipy L-BFGS-B drives around user code)."""
    from scipy.optimize import minimize as sp_minimize, Bounds

    bounds = Bounds(lb, up)
    D = len(lb)

    def wrapped(x, *fargs):
        if int_mask is not None:
            x = x.copy()
            x[int_mask] = np.round(x[int_mask])
        x2 = np.atleast_2d(x)
        val = func(x2, *fargs)
        if out_dim == -1:
            return -np.mean(val[0])
        return -val[0][out_dim]

    results = []
    for x0 in initials:
        res = sp_minimize(wrapped, x0, args=args, method=method, bounds=bounds,
                          options={'maxiter': 100, 'maxfun': int(max(30, 20 + 5 * D))})
        results.append((res.x, res.fun))
    xs, fs = zip(*results)
    best = np.asarray(xs[int(np.argmin(fs))])
    if int_mask is not None:
        best[int_mask] = np.round(best[int_mask])
    return best
