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
    """Thread-count parity shim (reference utils.set_thread): recorded for
    API compatibility; XLA owns device parallelism."""
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
# Nystrom kernel PCA (latent init at scale; role of reference utils.py:203)
# ----------------------------------------------------------------------
class NystromKPCA:
    """Nystrom-approximated kernel PCA with a sigmoid kernel, used to
    initialise wide latent layers at scale (role of reference
    utils.py:203-269; the construction here is the feature-space form).

    With landmarks Z, the Nystrom feature map is phi(x) = W^{-1/2} k(x, Z)
    where W = k(Z, Z).  Kernel PCA of the centered feature matrix
    Phi - mean(Phi) is then an ordinary PCA, computed from its SVD; the
    scores are U_r S_r.  Each component's sign is chosen so its midrange is
    non-negative (the latent initialiser expects that orientation).
    """

    def __init__(self, n_components, m=200):
        self.m = m
        self.n_components = n_components

    def fit_transform(self, X):
        X = np.asarray(X)
        n, d = X.shape
        m = min(self.m, n)
        idx = np.random.permutation(n)[:m]
        Z = X[idx]
        gamma = 1.0 / d  # sklearn's sigmoid-kernel default
        K_nm = np.tanh(gamma * (X @ Z.T) + 1.0)
        W = K_nm[idx]
        W = 0.5 * (W + W.T)
        lam, V = np.linalg.eigh(W)
        lam = np.maximum(lam, 1e-12)
        Phi = K_nm @ ((V / np.sqrt(lam)) @ V.T)
        Phi -= Phi.mean(axis=0)
        U, S, _ = np.linalg.svd(Phi, full_matrices=False)
        r = min(self.n_components, S.shape[0])
        scores = U[:, :r] * S[:r]
        if r < self.n_components:  # rank-deficient input: pad with zeros
            scores = np.pad(scores, ((0, 0), (0, self.n_components - r)))
        flip = (scores.min(axis=0) + scores.max(axis=0)) / 2 < 0
        return scores * np.where(flip, -1.0, 1.0)


# ----------------------------------------------------------------------
# multistart optimisation (role of reference utils.py:271)
# ----------------------------------------------------------------------
def multistart(func, initials, lb, up, args=(), method='L-BFGS-B',
               core_num=None, out_dim=0, int_mask=None):
    """Multistart bounded maximisation of ``func``; returns the best start.

    The reference fans the starts over a process pool of scipy optimisers.
    Here, when ``func`` is jax-traceable, ALL starts run as one vmapped
    bounded L-BFGS program on device (ops.lbfgs) -- every iteration of every
    start shares a single launch.  Non-traceable objectives (host code,
    external simulators) fall back to per-start scipy L-BFGS-B.

    ``int_mask`` marks integer-constrained dimensions, rounded inside the
    objective and in the returned optimum (reference utils.py:311-320).
    """
    initials = np.atleast_2d(np.asarray(initials, np.float64))
    lb = np.asarray(lb, np.float64)
    up = np.asarray(up, np.float64)
    D = len(lb)
    maxfun = int(max(30, 20 + 5 * D))

    def _reduce(val):
        v0 = val[0]
        return -np.mean(v0) if out_dim == -1 else -v0[out_dim]

    try:
        import jax
        import jax.numpy as jnp
        from .ops import lbfgs as jlbfgs

        def obj(x):
            if int_mask is not None:
                x = x.at[np.asarray(int_mask)].set(jnp.round(x[np.asarray(int_mask)]))
            val = func(x[None, :], *args)
            v0 = val[0]
            v = -jnp.mean(v0) if out_dim == -1 else -jnp.ravel(v0)[out_dim]
            return jnp.asarray(v, jnp.float64)

        def one(x0):
            return jlbfgs.minimize(jax.value_and_grad(obj), x0,
                                   jnp.asarray(lb), jnp.asarray(up),
                                   maxiter=100, maxfun=maxfun)

        xs, fs, _ = jax.jit(jax.vmap(one))(jnp.asarray(initials))
        xs, fs = np.asarray(xs), np.asarray(fs)
        if not np.all(np.isfinite(fs)):
            raise FloatingPointError("non-finite multistart objective")
    except (FloatingPointError, TypeError, ValueError) as e:
        # non-jittable user objective (Tracer leaks raise TypeError /
        # ConcretizationTypeError) or a non-finite device result; anything
        # else (a genuine bug) propagates instead of silently degrading
        import warnings
        warnings.warn(f"multistart: device path failed ({type(e).__name__}: "
                      f"{e}); falling back to scipy L-BFGS-B", RuntimeWarning)
        from scipy.optimize import minimize as sp_minimize, Bounds

        def wrapped(x, *fargs):
            if int_mask is not None:
                x = x.copy()
                x[int_mask] = np.round(x[int_mask])
            return _reduce(func(np.atleast_2d(x), *fargs))

        results = [sp_minimize(wrapped, x0, args=args, method=method,
                               bounds=Bounds(lb, up),
                               options={'maxiter': 100, 'maxfun': maxfun})
                   for x0 in initials]
        xs = np.asarray([r.x for r in results])
        fs = np.asarray([r.fun for r in results])

    best = xs[int(np.argmin(fs))].copy()
    if int_mask is not None:
        best[int_mask] = np.round(best[int_mask])
    return best
