"""GP node (`kernel`) class and `combine`.

API mirror of the reference `dgpsi/kernel_class.py` (constructor signature,
attribute names, method names), re-built on jitted JAX ops:

  * gradients of the negative log-likelihood come from autodiff
    (no hand-written derivative stacks),
  * `maximise` runs a compiled bounded L-BFGS on device,
  * predictions are batched XLA ops instead of per-point prange loops.

Compiled callables are cached per static node configuration via lru_cache,
so SEM iterations re-use the same executable.
"""
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .. import config, gp_core
from ..ops import kernels as kops
from ..ops import lbfgs


# ----------------------------------------------------------------------
# jitted factories (cached per static configuration)
# ----------------------------------------------------------------------
@lru_cache(maxsize=None)
def _make_llik(name, n_length, scale_est, nugget_est, prior_name, has_rep, has_cl):
    def f(log_theta, X, y, w_diag, sum_res, n_orig, cl, prior_coef, fscale, fnugget):
        kw = dict(name=name, n_length=n_length, scale_est=scale_est,
                  nugget_est=nugget_est, fixed_scale=fscale, fixed_nugget=fnugget,
                  prior_name=prior_name, prior_coef=prior_coef,
                  w_diag=w_diag if has_rep else None,
                  sum_residual=sum_res if has_rep else None,
                  n_orig=n_orig, cl=cl if has_cl else None)
        return gp_core.neg_log_lik_and_grad(log_theta, X, y, **kw)

    return jax.jit(f)


@lru_cache(maxsize=None)
def _make_maximise(name, n_length, scale_est, nugget_est, prior_name, has_rep,
                   has_cl, maxfun, has_bounds):
    def run(lt0, lb, ub, X, y, w_diag, sum_res, n_orig, cl, prior_coef,
            fscale, fnugget):
        kw = dict(name=name, n_length=n_length, scale_est=scale_est,
                  nugget_est=nugget_est, fixed_scale=fscale, fixed_nugget=fnugget,
                  prior_name=prior_name, prior_coef=prior_coef,
                  w_diag=w_diag if has_rep else None,
                  sum_residual=sum_res if has_rep else None,
                  n_orig=n_orig, cl=cl if has_cl else None)

        def fg(lt):
            nll, g, _ = gp_core.neg_log_lik_and_grad(lt, X, y, **kw)
            return nll, g

        x, _, _ = lbfgs.minimize(fg, lt0,
                                 lb if has_bounds else None,
                                 ub if has_bounds else None,
                                 maxiter=100, maxfun=maxfun)
        _, scale = gp_core.neg_log_lik(x, X, y, **kw)
        return x, scale

    return jax.jit(run)


@lru_cache(maxsize=None)
def _make_log_lik_fixed(name, has_rep, has_ref, n_length, vecch):
    def f(X, y, length, scale, nugget, w_diag, prior_coef):
        return gp_core.log_lik_fixed(
            X, y, length, scale, nugget, name=name,
            w_diag=w_diag if has_rep else None,
            ref_prior_coef=prior_coef if has_ref else None,
            n_length=n_length, vecch=vecch)

    return jax.jit(f)


@lru_cache(maxsize=None)
def _make_compute_stats(name, has_rep):
    def f(X, y, length, nugget, w_diag):
        return gp_core.compute_stats(X, y, length, nugget, name=name,
                                     w_diag=w_diag if has_rep else None)

    return jax.jit(f)


@lru_cache(maxsize=None)
def _make_gp_predict(name):
    def f(x, X, Rinv, Rinv_y, scale, length, nugget):
        return gp_core.gp_predict(x, X, Rinv, Rinv_y, scale, length, nugget,
                                  name=name)

    return jax.jit(f)


@lru_cache(maxsize=None)
def _make_linkgp_predict(name, has_z):
    def f(m, v, z, X, Zglobal, Rinv, Rinv_y, scale, length, nugget):
        return gp_core.linkgp_predict(m, v, z if has_z else None, X,
                                      Zglobal if has_z else None,
                                      Rinv, Rinv_y, scale, length, nugget,
                                      name=name)

    return jax.jit(f)


class kernel:
    """One GP node of a (D)GP hierarchy.  See reference kernel_class.kernel
    (dgpsi/kernel_class.py:9) for the full attribute semantics."""

    def __init__(self, length, scale=1., nugget=1e-6, name='sexp',
                 prior_name='ga', prior_coef=None, bds=None, nugget_est=False,
                 scale_est=False, input_dim=None, connect=None):
        self.type = 'gp'
        dt = np.dtype(config.default_dtype())
        self.length = np.atleast_1d(np.asarray(length, dt))
        self.scale = np.atleast_1d(np.asarray(scale, dt))
        self.nugget = np.atleast_1d(np.asarray(nugget, dt))
        self.name = name
        self.prior_name = prior_name
        if self.prior_name == 'ga':
            self.prior_coef = np.array([1.6, 0.3], dt) if prior_coef is None else np.asarray(prior_coef, dt).copy()
            self.prior_coef[0] -= 1
        elif self.prior_name == 'inv_ga':
            self.prior_coef = np.array([1.6, 0.3], dt) if prior_coef is None else np.asarray(prior_coef, dt).copy()
            self.prior_coef[0] += 1
        elif self.prior_name == 'ref':
            self.prior_coef = np.array([0.2], dt) if prior_coef is None else np.asarray(prior_coef, dt).copy()
            self.cl = None
        elif self.prior_name is None:
            self.prior_coef = None
        else:
            raise ValueError(f"unknown prior_name: {prior_name}")
        self.nugget_est = nugget_est
        self.scale_est = scale_est
        self.input_dim = None if input_dim is None else np.asarray(input_dim)
        self.connect = None if connect is None else np.asarray(connect)
        self.para_path = None
        self.global_input = None
        self.input = None
        self.output = None
        self.rep = None
        self.rep_hetero = None
        self.Rinv = None
        self.Rinv_y = None
        self.vecch = False
        self.D = None
        self.ord = None
        self.rev_ord = None
        self.m = 25
        self.pred_m = None
        self.NNarray = None
        self.imp_NNarray = None
        self.nn_method = 'exact'
        self.ord_fun = None
        self.iter_count = 0
        self.target = 'dgp'
        self.bds = bds
        self.R2 = None
        self.loo_state = False
        self.sum_residual = None
        self.W_diag = None

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------
    def _X(self):
        """Node input with the connected global input appended."""
        if self.global_input is not None:
            return np.concatenate((self.input, self.global_input), axis=1)
        return self.input

    def _has_rep(self):
        return self.W_diag is not None

    def _n_orig(self):
        return float(len(self.rep)) if self.rep is not None else float(len(self.output))

    @property
    def n_length(self):
        return len(self.length)

    def _static_key(self):
        return (self.name, self.n_length, self.scale_est, self.nugget_est,
                self.prior_name, self._has_rep())

    def _dyn_args(self):
        dt = config.default_dtype()
        X = jnp.asarray(self._X(), dt)
        y = jnp.asarray(self.output[:, 0], dt)
        w_diag = jnp.asarray(self.W_diag, dt) if self._has_rep() else None
        sum_res = (jnp.asarray(np.ravel(self.sum_residual)[0], dt)
                   if (self._has_rep() and self.sum_residual is not None) else None)
        cl = jnp.asarray(self.cl, dt) if (self.prior_name == 'ref' and self.cl is not None) else None
        pc = jnp.asarray(self.prior_coef, dt) if self.prior_coef is not None else None
        return X, y, w_diag, sum_res, cl, pc

    # ------------------------------------------------------------------
    # reference-parity methods
    # ------------------------------------------------------------------
    def compute_cl(self):
        """Characteristic length for the 'ref' prior (kernel_class.py:207)."""
        X = self._X()
        n = len(self.output)
        if self.n_length == 1:
            if self.vecch:
                rng = X.max(axis=0) - X.min(axis=0)
                self.cl = np.atleast_1d(np.sqrt(rng @ rng) / n)
            else:
                d2 = np.sum((X[:, None, :] - X[None, :, :]) ** 2, axis=-1)
                self.cl = np.atleast_1d(np.sqrt(d2.max()) / n)
        else:
            rng = X.max(axis=0) - X.min(axis=0)
            self.cl = rng / n ** (1.0 / self.n_length)

    def r2(self, overwritten=False):
        """R^2 of linear regression global_input -> input (kernel_class.py:227)."""
        if self.global_input is None:
            return
        X = np.concatenate((self.global_input, np.ones((len(self.global_input), 1))), axis=1)
        if np.linalg.matrix_rank(self.global_input) == np.linalg.matrix_rank(X):
            X = self.global_input
        N, D = X.shape
        if N == D:
            resids = np.zeros(self.input.shape[1])
        else:
            out = np.linalg.lstsq(X, self.input, rcond=None)
            resids = out[1]
            if len(np.atleast_1d(resids)) != self.input.shape[1]:
                pred = X @ out[0]
                resids = np.sum((self.input - pred) ** 2, axis=0)
        rsq = 1 - resids / (len(self.input) * np.var(self.input, axis=0))
        if overwritten or self.R2 is None:
            self.R2 = np.atleast_2d(rsq)
        else:
            self.R2 = np.vstack((self.R2, rsq))

    def log_t(self):
        if self.nugget_est:
            return np.log(np.concatenate((self.length, self.nugget)))
        return np.log(self.length)

    def update(self, log_theta):
        theta = np.exp(log_theta)
        if self.nugget_est:
            self.length = theta[:-1]
            self.nugget = theta[[-1]]
        else:
            self.length = theta

    def k_matrix(self):
        """Correlation matrix of the node input (no derivative stack: autodiff)."""
        w_diag = self.W_diag if self._has_rep() else None
        return np.asarray(kops.k_matrix(
            jnp.asarray(self._X()), jnp.asarray(self.length),
            float(self.nugget[0]), self.name,
            None if w_diag is None else jnp.asarray(w_diag)))

    def llik(self, x):
        """Negative log-lik and gradient wrt log-params (kernel_class.py:403)."""
        X, y, w_diag, sum_res, cl, pc = self._dyn_args()
        f = _make_llik(*self._static_key(), cl is not None)
        nll, g, scale = f(jnp.asarray(x, config.default_dtype()), X, y, w_diag, sum_res,
                          jnp.asarray(self._n_orig()), cl, pc,
                          jnp.asarray(float(self.scale[0])),
                          jnp.asarray(float(self.nugget[0])))
        jax.block_until_ready(nll)
        if self.scale_est:
            self.scale = np.atleast_1d(np.asarray(scale))
        return np.atleast_1d(np.asarray(nll)), np.asarray(g)

    def _bounds(self):
        """Optimisation bounds in log space (kernel_class.py:522-578)."""
        p = len(self.log_t())
        lb = np.full(p, -np.inf)
        ub = np.full(p, np.inf)
        n_len = p - 1 if self.nugget_est else p
        if self.bds is not None:
            with np.errstate(divide='ignore'):
                lb[:n_len] = np.log(self.bds[0])
                ub[:n_len] = np.log(self.bds[1])
        elif self.prior_name == 'ref':
            ub[:n_len] = 13.0
        if self.nugget_est:
            lb[-1] = np.log(1e-8)
        has_bounds = np.any(np.isfinite(lb)) or np.any(np.isfinite(ub))
        if not has_bounds:
            return None, None, False
        big = np.finfo(np.dtype(config.default_dtype())).max / 4
        return np.clip(lb, -big, big), np.clip(ub, -big, big), True

    def maximise(self, method='L-BFGS-B'):
        """Maximum-a-posteriori update of the hyper-parameters."""
        if self.vecch:
            return self._maximise_vecch()
        if self.prior_name == 'ref' and self.cl is None:
            self.compute_cl()
        lt0 = self.log_t()
        lb, ub, has_bounds = self._bounds()
        maxfun = int(max(30, 20 + 5 * (self.D or self._X().shape[1])))
        X, y, w_diag, sum_res, cl, pc = self._dyn_args()
        dt = config.default_dtype()
        run = _make_maximise(*self._static_key(), cl is not None, maxfun, has_bounds)
        lt, scale = run(jnp.asarray(lt0, dt),
                        None if lb is None else jnp.asarray(lb, dt),
                        None if ub is None else jnp.asarray(ub, dt),
                        X, y, w_diag, sum_res, jnp.asarray(self._n_orig(), dt),
                        cl, pc, jnp.asarray(float(self.scale[0]), dt),
                        jnp.asarray(float(self.nugget[0]), dt))
        lt = np.asarray(lt)
        if np.all(np.isfinite(lt)):
            self.update(lt)
            if self.scale_est and np.isfinite(scale):
                self.scale = np.atleast_1d(np.asarray(scale))
        self.add_to_path()

    def _maximise_vecch(self):
        from ..vecchia import api as vecchia_api
        vecchia_api.maximise_vecch(self)

    def add_to_path(self):
        para = np.concatenate((self.scale, self.length, self.nugget))
        if self.para_path is None:
            self.para_path = np.atleast_2d(para)
        else:
            self.para_path = np.vstack((self.para_path, para))

    def log_likelihood_func(self):
        """Marginal log-lik at current params: the ESS acceptance target."""
        if self.vecch:
            from ..vecchia import api as vecchia_api
            return vecchia_api.log_likelihood_func_vecch(self)
        X, y, w_diag, _, _, pc = self._dyn_args()
        has_ref = self.prior_name == 'ref'
        f = _make_log_lik_fixed(self.name, self._has_rep(), has_ref,
                                self.n_length, bool(self.vecch))
        return float(f(X, y, jnp.asarray(self.length), jnp.asarray(float(self.scale[0])),
                       jnp.asarray(float(self.nugget[0])), w_diag, pc))

    def compute_stats(self):
        """Cache Rinv / Rinv_y for dense prediction (kernel_class.py:735)."""
        X, y, w_diag, _, _, _ = self._dyn_args()
        f = _make_compute_stats(self.name, self._has_rep())
        Rinv, Rinv_y = f(X, y, jnp.asarray(self.length),
                         jnp.asarray(float(self.nugget[0])), w_diag)
        jax.block_until_ready(Rinv)  # no d2h on pending (vecchia/nn._host)
        self.Rinv, self.Rinv_y = np.asarray(Rinv), np.asarray(Rinv_y)

    # ------------------------------------------------------------------
    # predictions
    # ------------------------------------------------------------------
    def gp_prediction(self, x, z, sharded=False):
        """Dense/Vecchia GP prediction; `sharded=True` places the test rows
        across the device mesh (reference ppredict's process-pool chunking,
        gp.py:373-410, as GSPMD data parallelism)."""
        if self.vecch:
            return self._gp_prediction_vecch(x, z, sharded)
        if z is not None:
            x = np.concatenate((x, z), axis=1)
        if self.Rinv is None:
            self.compute_stats()
        f = _make_gp_predict(self.name)
        rest = (jnp.asarray(self._X()), jnp.asarray(self.Rinv),
                jnp.asarray(self.Rinv_y), jnp.asarray(float(self.scale[0])),
                jnp.asarray(self.length), jnp.asarray(float(self.nugget[0])))
        if sharded:
            from ..parallel import mesh
            (xs,), n = mesh.shard_rows(x)
            return mesh.trim_rows(f(xs, *rest), n)
        m, v = f(jnp.asarray(x), *rest)
        return np.asarray(m), np.asarray(v)

    def _gp_prediction_vecch(self, x, z, sharded=False):
        from ..vecchia import api as vecchia_api
        return vecchia_api.gp_prediction_vecch(self, x, z, sharded)

    def linkgp_prediction(self, m, v, z, sharded=False):
        if self.vecch:
            return self._linkgp_prediction_vecch(m, v, z, sharded)
        if self.Rinv is None:
            self.compute_stats()
        f = _make_linkgp_predict(self.name, z is not None)
        rest = (jnp.asarray(self.input),
                None if self.global_input is None else jnp.asarray(self.global_input),
                jnp.asarray(self.Rinv), jnp.asarray(self.Rinv_y),
                jnp.asarray(float(self.scale[0])), jnp.asarray(self.length),
                jnp.asarray(float(self.nugget[0])))
        if sharded:
            from ..parallel import mesh
            if z is None:
                (ms, vs), n = mesh.shard_rows(m, v)
                zs = None
            else:
                (ms, vs, zs), n = mesh.shard_rows(m, v, z)
            return mesh.trim_rows(f(ms, vs, zs, *rest), n)
        mu, var = f(jnp.asarray(m), jnp.asarray(v),
                    None if z is None else jnp.asarray(z), *rest)
        return np.asarray(mu), np.asarray(var)

    def _linkgp_prediction_vecch(self, m, v, z, sharded=False):
        from ..vecchia import api as vecchia_api
        return vecchia_api.linkgp_prediction_vecch(self, m, v, z, sharded)

    def linkgp_prediction_full(self, m, v, m_z, v_z, z):
        """Linked prediction when part of the global input is itself stochastic
        (kernel_class.py:672): fold the stochastic global dims into the
        Gaussian input block and keep the rest deterministic."""
        m_full = np.concatenate((m, m_z), axis=1)
        v_full = np.concatenate((v, v_z), axis=1)
        n_mz = m_z.shape[1]
        idx1 = np.arange(n_mz)
        idx2 = np.arange(n_mz, self.global_input.shape[1])
        overall_input = np.concatenate((self.input, self.global_input[:, idx1]), axis=1)
        if self.Rinv is None:
            self.compute_stats()
        f = _make_linkgp_predict(self.name, z is not None)
        mu, var = f(jnp.asarray(m_full), jnp.asarray(v_full),
                    None if z is None else jnp.asarray(z),
                    jnp.asarray(overall_input),
                    jnp.asarray(self.global_input[:, idx2]),
                    jnp.asarray(self.Rinv), jnp.asarray(self.Rinv_y),
                    jnp.asarray(float(self.scale[0])), jnp.asarray(self.length),
                    jnp.asarray(float(self.nugget[0])))
        return np.asarray(mu), np.asarray(var)

    # Vecchia scaffolding (implemented by the vecchia subsystem) ----------
    def ord_nn(self, ord=None, NNarray=None, pointer=False):
        from ..vecchia import api as vecchia_api
        vecchia_api.ord_nn(self, ord=ord, NNarray=NNarray, pointer=pointer)
        # invalidates compiled engines' cached device NN copies
        self.nn_version = getattr(self, 'nn_version', 0) + 1


def combine(*layers):
    """Combine layers into one list as a DGP / linked (D)GP structure
    (kernel_class.py:766)."""
    return [layer for layer in layers]
