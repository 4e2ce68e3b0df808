"""Jit-compatible bounded L-BFGS for the per-node M-step.

The reference drives each GP node's hyper-parameter update with scipy's
L-BFGS-B capped at ~30 function evaluations (`dgpsi/kernel_class.py:516-578`);
inside a compiled SEM step we need the same thing as a pure function.  This is
a projected L-BFGS with Armijo backtracking:

  * two-loop recursion over a fixed-size history (newest row first),
  * curvature-guarded history updates,
  * box bounds handled by projection (clip) of iterates,
  * a function-evaluation budget, matching the reference's `maxfun` cap.

The SEM M-step does not require exact convergence -- a budgeted improvement
step preserves the stochastic-EM semantics -- so parity with scipy is
behavioural (monotone improvement at similar cost), not bitwise.

NaN-robust: a non-finite candidate value simply fails the Armijo test and the
step keeps backtracking; if no progress is possible, the best iterate seen is
returned.

Structure: ONE evaluation-driven `lax.while_loop` whose body calls ``fun``
exactly once -- each iteration is one function evaluation, and the
line-search state (current direction, trial step, backtrack count) lives in
the carry.  The objective here is the fused Vecchia gradient kernel, whose
traced graph is large; the classic nested-loop formulation (initial
evaluation + line-search init + line-search body + final re-evaluation)
inlines it four times and dominated the SEM program's trace/compile time.
"""
import jax
import jax.numpy as jnp


def minimize(fun, x0, lb=None, ub=None, maxiter=100, maxfun=30, history=8,
             gtol=1e-5, c1=1e-4, max_ls=20, has_aux=False):
    """Minimise ``fun`` (returning ``(value, grad)`` or, with ``has_aux``,
    ``(value, grad, aux)``) from ``x0`` in a box.

    Returns:
        (x_best, f_best, nfev) or (x_best, f_best, nfev, aux_best); aux_best
        tracks x_best so callers need no extra objective evaluation to
        recover by-products (e.g. the profiled scale) at the solution.
    """
    p = x0.shape[0]
    dtype = x0.dtype
    big = jnp.asarray(jnp.finfo(dtype).max / 4, dtype)
    lb = jnp.full((p,), -big, dtype) if lb is None else jnp.broadcast_to(jnp.asarray(lb, dtype), (p,))
    ub = jnp.full((p,), big, dtype) if ub is None else jnp.broadcast_to(jnp.asarray(ub, dtype), (p,))

    def project(x):
        return jnp.clip(x, lb, ub)

    def two_loop(g, S, Y, rho, gamma):
        # statically unrolled (history is small); rho==0 rows contribute
        # nothing, so stale slots are no-ops
        q = g
        alphas = []
        for i in range(history):
            a = rho[i] * jnp.dot(S[i], q)
            q = q - a * Y[i]
            alphas.append(a)
        r = gamma * q
        for j in range(history - 1, -1, -1):
            b = rho[j] * jnp.dot(Y[j], r)
            r = r + S[j] * (alphas[j] - b)
        return r

    def active_mask(x, g):
        # zero out gradient components that push outside an active bound
        eps = jnp.asarray(1e-12, dtype)
        at_lb = jnp.logical_and(x - lb <= eps, g > 0)
        at_ub = jnp.logical_and(ub - x <= eps, g < 0)
        return jnp.where(jnp.logical_or(at_lb, at_ub), 0.0, 1.0)

    def direction_mask(x, d):
        # zero out direction components that push outside an active bound
        eps = jnp.asarray(1e-12, dtype)
        out_lb = jnp.logical_and(x - lb <= eps, d < 0)
        out_ub = jnp.logical_and(ub - x <= eps, d > 0)
        return jnp.where(jnp.logical_or(out_lb, out_ub), 0.0, 1.0)

    def new_direction(x, g, S, Y, rho, gamma, first):
        gm = g * active_mask(x, g)
        d = -two_loop(gm, S, Y, rho, gamma)
        d = d * direction_mask(x, d)
        # fall back to steepest descent if the direction is not a descent one
        descent = jnp.dot(gm, d) < 0
        d = jnp.where(descent, d, -gm)
        t0 = jnp.where(first,
                       jnp.minimum(1.0, 1.0 / (1.0 + jnp.linalg.norm(g))),
                       jnp.asarray(1.0, dtype))
        return d, t0

    x0 = project(x0)
    if has_aux:
        fn = fun
    else:
        def fn(x):
            f, g = fun(x)
            return f, g, ()
    f_shape, _, aux_shape = jax.eval_shape(fn, x0)
    aux0 = jax.tree_util.tree_map(lambda a: jnp.zeros(a.shape, a.dtype),
                                  aux_shape)
    inf = jnp.asarray(jnp.inf, f_shape.dtype)
    init = dict(
        # accepted point (f=inf marks "not yet evaluated": the first trial at
        # x0 is then accepted unconditionally and seeds f/g)
        x=x0, f=inf, g=jnp.zeros((p,), dtype),
        S=jnp.zeros((history, p), dtype), Y=jnp.zeros((history, p), dtype),
        rho=jnp.zeros(history, dtype), gamma=jnp.asarray(1.0, dtype),
        # line-search state: current direction, next trial step, backtracks
        d=jnp.zeros((p,), dtype), t=jnp.asarray(0.0, dtype),
        trials=jnp.asarray(0),
        it=jnp.asarray(0), nfev=jnp.asarray(0), done=jnp.asarray(False),
        x_best=x0, f_best=inf, aux_best=aux0,
    )

    def cond(st):
        return jnp.logical_and(
            ~st["done"], jnp.logical_and(st["it"] < maxiter, st["nfev"] < maxfun)
        )

    def body(st):
        x_trial = project(st["x"] + st["t"] * st["d"])
        f_trial, g_trial, aux_trial = fn(x_trial)  # the ONLY evaluation site
        armijo = f_trial <= st["f"] + c1 * jnp.dot(st["g"], x_trial - st["x"])
        accept = jnp.logical_and(armijo, jnp.isfinite(f_trial))
        first = st["nfev"] == 0                  # seeding evaluation at x0

        # ---- accepted branch state -----------------------------------
        s = x_trial - st["x"]
        y = g_trial - st["g"]
        sy = jnp.dot(s, y)
        curv_ok = sy > 1e-10 * jnp.linalg.norm(s) * jnp.linalg.norm(y)
        upd = jnp.logical_and(accept, jnp.logical_and(
            ~first, jnp.logical_and(curv_ok, jnp.all(jnp.isfinite(y)))))
        S = jnp.where(upd, jnp.roll(st["S"], 1, axis=0).at[0].set(s), st["S"])
        Y = jnp.where(upd, jnp.roll(st["Y"], 1, axis=0).at[0].set(y), st["Y"])
        rho = jnp.where(upd, jnp.roll(st["rho"], 1).at[0].set(
            1.0 / jnp.where(upd, sy, 1.0)), st["rho"])
        gamma = jnp.where(upd, sy / jnp.where(upd, jnp.dot(y, y), 1.0),
                          st["gamma"])

        x = jnp.where(accept, x_trial, st["x"])
        f = jnp.where(accept, f_trial, st["f"])
        g = jnp.where(accept, g_trial, st["g"])

        d_new, t_new = new_direction(x, g, S, Y, rho, gamma, first)

        # ---- rejected branch: backtrack ------------------------------
        d = jnp.where(accept, d_new, st["d"])
        t = jnp.where(accept, t_new, st["t"] * 0.5)
        trials = jnp.where(accept, 0, st["trials"] + 1)

        better = jnp.logical_and(accept, f_trial < st["f_best"])
        x_best = jnp.where(better, x_trial, st["x_best"])
        f_best = jnp.where(better, f_trial, st["f_best"])
        aux_best = jax.tree_util.tree_map(
            lambda new, old: jnp.where(better, new, old),
            aux_trial, st["aux_best"])

        pg = project(x - g) - x
        converged = jnp.logical_and(accept, jnp.logical_and(
            ~first, jnp.max(jnp.abs(pg)) < gtol))
        ls_failed = jnp.logical_and(~accept, trials > max_ls)
        return dict(
            x=x, f=f, g=g, S=S, Y=Y, rho=rho, gamma=gamma,
            d=d, t=t, trials=trials,
            it=st["it"] + jnp.where(accept, 1, 0), nfev=st["nfev"] + 1,
            done=jnp.logical_or(converged, ls_failed),
            x_best=x_best, f_best=f_best, aux_best=aux_best,
        )

    st = jax.lax.while_loop(cond, body, init)
    if has_aux:
        return st["x_best"], st["f_best"], st["nfev"], st["aux_best"]
    return st["x_best"], st["f_best"], st["nfev"]
