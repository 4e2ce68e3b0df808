"""Vecchia integration with the kernel/model classes.

Ordering + neighbour construction (reference kernel_class.ord_nn), the
Vecchia M-step optimiser, ESS target, and predictions, all through the
batched kernels in `vecchia.core`.
"""
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .. import config, gp_core
from ..ops import lbfgs
from . import core, nn as nnmod


def ord_nn(node, ord=None, NNarray=None, pointer=False):
    """Set the Vecchia ordering and neighbour structure on a GP node
    (reference kernel_class.ord_nn, kernel_class.py:245)."""
    if ord is None:
        if node.ord_fun is None:
            node.ord = np.random.permutation(node.input.shape[0])
        else:
            node.ord = node.ord_fun(_scaled_input(node))
    else:
        node.ord = np.asarray(ord)
    node.rev_ord = np.argsort(node.ord)
    if NNarray is None:
        X = _scaled_input(node)
        if not hasattr(node, '_ivf_cache'):
            node._ivf_cache = {}
        node.NNarray = nnmod.nn(X[node.ord], node.m, method=node.nn_method,
                                cache=node._ivf_cache)
    else:
        node.NNarray = np.asarray(NNarray)
    if pointer:
        # Self-excluded unconstrained NN for the Hetero exact-posterior
        # sampler (reference kernel_class.py:268-277 builds the stacked
        # imp_NNarray + CSR pointers; the batched sampler only needs the raw
        # neighbour indices -- see vecchia.core.post_het_vecch).
        X = _scaled_input(node)
        node.imp_NNarray = nnmod.get_pred_nn(X[node.ord], X[node.ord],
                                             node.m, method=node.nn_method)[:, 1:]


def _scaled_input(node):
    if node.global_input is not None:
        X = np.concatenate((node.input, node.global_input), axis=1)
    else:
        X = node.input
    return X / node.length


def _full_input(node):
    if node.global_input is not None:
        return np.concatenate((node.input, node.global_input), axis=1)
    return node.input


# ----------------------------------------------------------------------
# jitted wrappers
# ----------------------------------------------------------------------
@lru_cache(maxsize=None)
def _make_vecch_llik(name, has_rep, has_ref, n_length):
    def f(X, y, NNarray, length, scale, nugget, nugget_diag, prior_coef):
        ll = core.vecchia_llik(X, y, NNarray, scale, length, nugget,
                               nugget_diag, name)
        if has_ref:
            cl = gp_core.compute_cl(X, X.shape[0], n_length, True)
            ll += gp_core.log_prior(length, nugget, prior_name='ref',
                                    prior_coef=prior_coef, nugget_est=False, cl=cl)
        return ll

    return jax.jit(f)


@lru_cache(maxsize=None)
def _make_vecch_maximise(name, n_length, scale_est, nugget_est, prior_name,
                         has_rep, maxfun, has_bounds):
    def run(lt0, lb, ub, X, y, NNarray, nugget_diag, sum_res, n_orig,
            prior_coef, fscale, fnugget):
        def obj(lt):
            nll, scale = core.vecchia_nllik(
                lt, X, y, NNarray, nugget_diag, name=name, scale_est=scale_est,
                nugget_est=nugget_est, fixed_scale=fscale, fixed_nugget=fnugget,
                n_orig=n_orig, sum_residual=sum_res if has_rep else None)
            if prior_name is not None:
                if nugget_est:
                    length, nugget = jnp.exp(lt[:-1]), jnp.exp(lt[-1])
                else:
                    length, nugget = jnp.exp(lt), fnugget
                cl = (gp_core.compute_cl(X, X.shape[0], n_length, True)
                      if prior_name == 'ref' else None)
                nll -= gp_core.log_prior(length, nugget, prior_name=prior_name,
                                         prior_coef=prior_coef,
                                         nugget_est=nugget_est, cl=cl)
            return nll, scale

        def fg(lt):
            (nll, _), g = jax.value_and_grad(obj, has_aux=True)(lt)
            return nll, g

        lt, _, _ = lbfgs.minimize(fg, lt0,
                                  lb if has_bounds else None,
                                  ub if has_bounds else None,
                                  maxiter=100, maxfun=maxfun)
        _, scale = obj(lt)
        return lt, scale

    return jax.jit(run)


@lru_cache(maxsize=None)
def _make_gp_vecch(name):
    def f(x, w, NNarray, y, scale, length, nugget, nugget_diag, extra_jit):
        return core.gp_vecch(x, w, NNarray, y, scale, length, nugget,
                             nugget_diag, name, extra_jit)

    return _with_jitter_retry(jax.jit(f))


@lru_cache(maxsize=None)
def _make_link_gp_vecch(name, has_z):
    def f(m, v, z, w1, gw1, NNarray, y, scale, length, nugget, nugget_diag,
          extra_jit):
        return core.link_gp_vecch(m, v, z if has_z else None, w1,
                                  gw1 if has_z else None, NNarray, y, scale,
                                  length, nugget, nugget_diag, name, extra_jit)

    return _with_jitter_retry(jax.jit(f))


@lru_cache(maxsize=None)
def _make_loo_vecch(name):
    def f(x, NNarray, y, scale, length, nugget, nugget_diag, extra_jit):
        return core.loo_gp_vecch(x, NNarray, y, scale, length, nugget,
                                 nugget_diag, name, extra_jit)

    return _with_jitter_retry(jax.jit(f))


#: host-level jitter-escalation rungs for f32 prediction blocks whose
#: factorisation comes out non-finite (e.g. pred_m=200 with a nugget at the
#: 1e-6 floor).  Host-side so the healthy fast path pays nothing: escalation
#: re-dispatches the SAME compiled program with a larger traced diagonal and
#: keeps the healthy rows.
_JITTER_RUNGS = (3e-4, 3e-3)


def _with_jitter_retry(f):
    """Wrap a jitted (mean, var) prediction program (last arg: extra_jit)
    with the host-level escalation."""
    def g(*args):
        dt = args[0].dtype
        mean, var = f(*args, jnp.asarray(0.0, dt))
        mean, var = np.asarray(mean), np.asarray(var)
        bad = ~(np.isfinite(mean) & np.isfinite(var))
        for extra in _JITTER_RUNGS:
            if not bad.any():
                break
            m2, v2 = f(*args, jnp.asarray(extra, dt))
            m2, v2 = np.asarray(m2), np.asarray(v2)
            mean = np.where(bad, m2, mean)
            var = np.where(bad, v2, var)
            bad = ~(np.isfinite(mean) & np.isfinite(var))
        return mean, var

    return g


# ----------------------------------------------------------------------
# node-level entry points
# ----------------------------------------------------------------------
def _nugget_diag(node):
    dt = config.default_dtype()
    if node.W_diag is not None:
        return jnp.asarray(node.W_diag, dt)
    return jnp.ones(len(node.output), dt)


def log_likelihood_func_vecch(node):
    dt = config.default_dtype()
    X = _full_input(node)
    f = _make_vecch_llik(node.name, node.W_diag is not None,
                         node.prior_name == 'ref', node.n_length)
    pc = jnp.asarray(node.prior_coef, dt) if node.prior_coef is not None else None
    return float(f(jnp.asarray(X[node.ord], dt),
                   jnp.asarray(node.output[node.ord, 0], dt),
                   jnp.asarray(node.NNarray),
                   jnp.asarray(node.length, dt),
                   jnp.asarray(float(node.scale[0]), dt),
                   jnp.asarray(float(node.nugget[0]), dt),
                   _nugget_diag(node)[jnp.asarray(node.ord)], pc))


def maximise_vecch(node):
    dt = config.default_dtype()
    X = _full_input(node)
    lt0 = node.log_t()
    lb, ub, has_bounds = node._bounds()
    maxfun = int(max(30, 20 + 5 * (node.D or X.shape[1])))
    has_rep = node.W_diag is not None
    run = _make_vecch_maximise(node.name, node.n_length, node.scale_est,
                               node.nugget_est, node.prior_name, has_rep,
                               maxfun, has_bounds)
    sum_res = (jnp.asarray(float(np.ravel(node.sum_residual)[0]), dt)
               if (has_rep and node.sum_residual is not None) else None)
    n_orig = float(len(node.rep)) if node.rep is not None else float(len(node.output))
    pc = jnp.asarray(node.prior_coef, dt) if node.prior_coef is not None else None
    lt, scale = run(jnp.asarray(lt0, dt),
                    None if lb is None else jnp.asarray(lb, dt),
                    None if ub is None else jnp.asarray(ub, dt),
                    jnp.asarray(X[node.ord], dt),
                    jnp.asarray(node.output[node.ord, 0], dt),
                    jnp.asarray(node.NNarray),
                    _nugget_diag(node)[jnp.asarray(node.ord)],
                    sum_res, jnp.asarray(n_orig, dt), pc,
                    jnp.asarray(float(node.scale[0]), dt),
                    jnp.asarray(float(node.nugget[0]), dt))
    lt = np.asarray(lt)
    if np.all(np.isfinite(lt)):
        node.update(lt)
        if node.scale_est and np.isfinite(scale):
            node.scale = np.atleast_1d(np.asarray(scale))
    node.add_to_path()


def gp_prediction_vecch(node, x, z, sharded=False):
    dt = config.default_dtype()
    if z is not None:
        x = np.concatenate((x, z), axis=1)
        w = _full_input(node)
    else:
        w = node.input if node.global_input is None else _full_input(node)
    NNarray = nnmod.get_pred_nn(x / node.length, w / node.length,
                                node.pred_m or 50, method=node.nn_method)
    if node.loo_state:
        NNarray = NNarray[:, 1:]
    f = _make_gp_vecch(node.name)
    rest = (jnp.asarray(node.output[:, 0], dt),
            jnp.asarray(float(node.scale[0]), dt),
            jnp.asarray(node.length, dt),
            jnp.asarray(float(node.nugget[0]), dt), _nugget_diag(node))
    w_j = jnp.asarray(w, dt)
    if sharded:
        from ..parallel import mesh
        (xs, nns), n = mesh.shard_rows(jnp.asarray(x, dt), jnp.asarray(NNarray))
        return mesh.trim_rows(f(xs, w_j, nns, *rest), n)
    mean, var = f(jnp.asarray(x, dt), w_j, jnp.asarray(NNarray), *rest)
    return np.asarray(mean), np.asarray(var)


def linkgp_prediction_vecch(node, m, v, z, sharded=False):
    dt = config.default_dtype()
    if z is not None:
        xq = np.concatenate((m, z), axis=1)
        w = _full_input(node)
    else:
        xq = m
        w = node.input if node.global_input is None else _full_input(node)
    NNarray = nnmod.get_pred_nn(xq / node.length, w / node.length,
                                node.pred_m or 50, method=node.nn_method)
    if node.loo_state:
        NNarray = NNarray[:, 1:]
    f = _make_link_gp_vecch(node.name, z is not None)
    rest = (jnp.asarray(node.input, dt),
            None if node.global_input is None else jnp.asarray(node.global_input, dt),
            jnp.asarray(node.output[:, 0], dt),
            jnp.asarray(float(node.scale[0]), dt),
            jnp.asarray(node.length, dt),
            jnp.asarray(float(node.nugget[0]), dt), _nugget_diag(node))

    def call(ms, vs, zs, nns):
        w1, gw1 = rest[0], rest[1]
        return f(ms, vs, zs, w1, gw1, nns, *rest[2:])

    if sharded:
        from ..parallel import mesh
        if z is None:
            (ms, vs, nns), n = mesh.shard_rows(jnp.asarray(m, dt),
                                               jnp.asarray(v, dt),
                                               jnp.asarray(NNarray))
            zs = None
        else:
            (ms, vs, zs, nns), n = mesh.shard_rows(jnp.asarray(m, dt),
                                                   jnp.asarray(v, dt),
                                                   jnp.asarray(z, dt),
                                                   jnp.asarray(NNarray))
        return mesh.trim_rows(call(ms, vs, zs, nns), n)
    mean, var = call(jnp.asarray(m, dt), jnp.asarray(v, dt),
                     None if z is None else jnp.asarray(z, dt),
                     jnp.asarray(NNarray))
    return np.asarray(mean), np.asarray(var)


def loo_gp(gp_model, m):
    """Vecchia LOO for the gp class (reference gp.loo vecchia path)."""
    dt = config.default_dtype()
    node = gp_model.kernel
    X = gp_model.X
    X_scale = X / node.length
    NNarray = nnmod.get_pred_nn(X_scale, X_scale, m + 1, method=node.nn_method)
    f = _make_loo_vecch(node.name)
    mean, var = f(jnp.asarray(X, dt), jnp.asarray(NNarray),
                  jnp.asarray(node.output[:, 0], dt),
                  jnp.asarray(float(node.scale[0]), dt),
                  jnp.asarray(node.length, dt),
                  jnp.asarray(float(node.nugget[0]), dt), _nugget_diag(node))
    return np.asarray(mean).reshape(-1, 1), np.asarray(var).reshape(-1, 1)
