"""Batched SEM M-step: per-node bounded L-BFGS optimisations, vmapped.

The reference optimises each GP node's hyper-parameters independently and
sequentially (dgpsi/dgp.py:1391-1398; `ptrain` moves the loop into a process
pool, dgp.py:1414-1472).  The node problems are tiny (1-3 parameters) and
mutually independent, so on TPU the natural realisation is ONE vmapped
L-BFGS over all nodes of a compatible group: every objective evaluation of
every node happens in the same kernel launch.

Nodes differ in input dimension, parameter count (isotropic vs per-dim
lengthscales, estimated vs fixed nugget), priors, replicate handling, and
profiling flags.  These are unified so a group shares one traced program:

  * input dims are zero-padded to the group max (zero coordinates at unit
    lengthscale contribute nothing to stationary kernels);
  * the kernel always differentiates w.r.t. ALL padded per-dim log-lengths
    plus the log-nugget; a per-node tying matrix A maps the node's own
    parameter vector lt (p_max, padded with frozen lanes) to the full lane
    vector, and A^T contracts the full gradient back (isotropic length =
    tied lanes, d(iso)/dl = sum of per-dim derivatives);
  * scale profiling / replicate corrections use traced flags -- with
    sum_residual=0 and n_orig=n for replicate-free nodes the replicate
    terms vanish identically;
  * ga / inv_ga / ref priors evaluate all three closed forms and select by a
    traced prior id (the forms are O(p) scalar math).

Groups are keyed by (kernel name, vecchia?, m+1): the only genuinely static
distinctions.  The Vecchia group evaluates objectives through the fused
Pallas forward+analytic-gradient kernel on TPU (ops.pallas_vecchia) and
through batched-XLA autodiff elsewhere; dense groups use autodiff.
"""
import numpy as np
import jax
import jax.numpy as jnp

from .. import config
from ..ops import kernels as kops
from ..ops import linalg, lbfgs
from ..ops import pallas_vecchia as pv
from ..vecchia import core as vcore


def _prior_lp(lt_node, op):
    """Unified log-prior over the node's own (masked) parameter lanes.

    ga / inv_ga apply the same (c0, c1) form to every estimated lane
    (reference kernel_class.py:367-401); 'ref' works on the expanded
    per-dim lengths with zero-padded cl."""
    mask = op['param_mask']
    c0, c1 = op['prior_coef'][0], op['prior_coef'][1]
    lt_safe = lt_node * mask
    ga = jnp.sum(mask * (c0 * lt_safe - c1 * jnp.exp(lt_safe)))
    inv_ga = jnp.sum(mask * (-c0 * lt_safe - c1 * jnp.exp(-lt_safe)))
    lt_full = op['A'] @ lt_node + op['b']
    length_full = jnp.exp(lt_full[:-1])
    nugget = jnp.exp(lt_full[-1])
    t = jnp.sum(op['cl'] / length_full) + nugget
    ref = c0 * jnp.log(t) - c1 * t
    pid = op['prior_id']
    return (jnp.where(pid == 1, ga, 0.0) + jnp.where(pid == 2, inv_ga, 0.0)
            + jnp.where(pid == 3, ref, 0.0))


def _assemble(logdet, quad, nugget64, op, n):
    """Profiled nll and scale from (logdet, quad) block sums (all f64).
    Replicate terms vanish when sum_res == 0 and n_orig == n."""
    N = op['n_orig']
    sr = op['sum_res']
    scale_prof = (quad + sr / nugget64) / N
    scale = jnp.where(op['scale_est'], scale_prof, op['fixed_scale64'])
    nll = jnp.where(op['scale_est'],
                    0.5 * (logdet + N * jnp.log(scale_prof)),
                    0.5 * (logdet + quad / scale))
    extra = jnp.where(op['scale_est'],
                      0.5 * (N - n) * jnp.log(nugget64),
                      0.5 * (sr / (scale * nugget64)
                             + (N - n) * jnp.log(nugget64)))
    nll = nll + op['nug_est_f'] * extra
    return nll, scale


def _lanes(lt_node, op):
    lt_full = op['A'] @ lt_node + op['b']
    length_full = jnp.exp(lt_full[:-1])
    nugget = jnp.exp(lt_full[-1])
    return length_full, nugget


def _vecch_fg_pallas(lt_node, op, *, name, d_max, n):
    """(nll, grad, scale) through the fused Pallas kernel (one launch).
    Operands arrive in the kernels' transposed (m1, ..., n) layout."""
    length_full, nugget = _lanes(lt_node, op)
    Xg, diag, dnug = pv.scale_blocks_t(op['Xg_raw'], op['nug_g'], op['valid'],
                                       length_full, nugget,
                                       vcore._f32_jitter(op['Xg_raw'].dtype))
    ld, q, dld, dq = pv.block_nllik_grad_parts_t(
        Xg, op['yg'], diag, dnug, name=name, n_length=d_max, nugget_est=True)
    logdet, quad = linalg.sum64(ld), linalg.sum64(q)
    dlogdet = linalg.sum64(dld, axis=1)
    dquad = linalg.sum64(dq, axis=1)
    nugget64 = jnp.asarray(nugget, jnp.float64)
    nll, scale = _assemble(logdet, quad, nugget64, op, n)
    g_full = 0.5 * (dlogdet - dquad / scale)
    g_last_extra = op['nug_est_f'] * 0.5 * (-op['sum_res'] / (scale * nugget64)
                                            + (op['n_orig'] - n))
    g_full = g_full.at[-1].add(g_last_extra)
    g_node = (op['A'].T @ g_full).astype(lt_node.dtype)
    p_val, p_grad = jax.value_and_grad(lambda t: -_prior_lp(t, op))(lt_node)
    return nll + p_val, g_node + p_grad, scale


def _vecch_nll_xla(lt_node, op, *, name, n):
    """(nll, scale) via batched-XLA masked blocks (autodiff for grads).
    Operands are stored in the transposed (m1, ..., n) layout; this path
    works on the (n, m1, ...) view."""
    length_full, nugget = _lanes(lt_node, op)
    valid = op['valid'].T
    Xi = op['Xg_raw'].transpose(2, 0, 1) / length_full
    K = kops.k_cross(Xi, Xi, jnp.ones((), Xi.dtype), name)
    both = valid[:, :, None] & valid[:, None, :]
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)
    K = jnp.where(both, K, eye)
    diag = jnp.where(valid, 1.0 + nugget * op['nug_g'].T
                     + vcore._f32_jitter(K.dtype), 1.0)
    K = kops.set_diag(K, diag)
    L = vcore._chol_chunked(K)
    Ly = linalg.fwd_solve_small(L, op['yg'].T)
    quad = linalg.sum64(Ly[:, -1] ** 2)
    logdet = linalg.sum64(2.0 * jnp.log(jnp.abs(L[:, -1, -1])))
    nugget64 = jnp.asarray(nugget, jnp.float64)
    nll, scale = _assemble(logdet, quad, nugget64, op, n)
    return nll - _prior_lp(lt_node, op), scale


def _dense_nll(lt_node, op, *, name, n):
    """(nll, scale) for a dense node (gp_core.neg_log_lik semantics with
    traced flags; autodiff for grads).

    Plain Cholesky (no adaptive-jitter retry loop): a non-finite factor fails
    the L-BFGS Armijo test and, if persistent, triggers the trainer's restart
    path (reference behaviour: LinAlgError -> restart, dgp.py:1402-1412).
    The retry `while_loop` nested inside the vmapped optimiser also crashes
    XLA's memory-space assignment on TPU."""
    length_full, nugget = _lanes(lt_node, op)
    K = kops.k_matrix(op['X'], length_full, nugget, name, op['w_diag'])
    L = linalg.cholesky(K)
    logdet = linalg.sum64(2.0 * jnp.log(jnp.abs(jnp.diagonal(L))))
    Kinv_y = linalg.cho_solve(L, op['y'][:, None])[:, 0]
    quad = linalg.sum64(op['y'] * Kinv_y)
    nugget64 = jnp.asarray(nugget, jnp.float64)
    nll, scale = _assemble(logdet, quad, nugget64, op, n)
    return nll - _prior_lp(lt_node, op), scale


def run_group(ops, lt0, lb, ub, maxfun, *, name, mode, d_max, n, use_pallas):
    """Vmapped bounded L-BFGS over one node group.

    Args:
        ops: pytree of stacked per-node operands (leading axis G).
        lt0/lb/ub: (G, p_max) initial log-params and box bounds.
        maxfun: (G,) per-node function-evaluation budgets (traced).
    Returns:
        (lt (G, p_max), scale (G,), ok (G,)) -- `ok` = finite result.
    """
    if mode == 'vecch' and use_pallas:
        def fg_fn(lt, op):
            return _vecch_fg_pallas(lt, op, name=name, d_max=d_max, n=n)
    else:
        nll_fn = _vecch_nll_xla if mode == 'vecch' else _dense_nll

        def fg_fn(lt, op):
            (nll, scale), g = jax.value_and_grad(
                lambda t: nll_fn(t, op, name=name, n=n), has_aux=True)(lt)
            return nll, g, scale

    def one(lt0_i, lb_i, ub_i, maxfun_i, op):
        def fg(lt):
            return fg_fn(lt, op)

        # history=4: the per-node problems have 1-3 parameters, so a short
        # curvature memory loses nothing and keeps the bookkeeping ops tiny.
        # The profiled scale rides along as the optimiser's aux so the
        # objective (a large fused-kernel graph) is instantiated only once.
        lt, _, _, scale = lbfgs.minimize(fg, lt0_i, lb_i, ub_i,
                                         maxiter=100, maxfun=maxfun_i,
                                         history=4, has_aux=True)
        ok = jnp.all(jnp.isfinite(lt)) & jnp.isfinite(scale)
        return lt, scale, ok

    return jax.vmap(one)(lt0, lb, ub, maxfun, ops)
