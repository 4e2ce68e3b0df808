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
"""
from functools import partial

import jax
import jax.numpy as jnp


def minimize(fun, x0, lb=None, ub=None, maxiter=100, maxfun=30, history=8,
             gtol=1e-5, c1=1e-4, max_ls=20):
    """Minimise ``fun`` (returning ``(value, grad)``) from ``x0`` in a box.

    Returns:
        (x_best, f_best, nfev)
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

    x0 = project(x0)
    f0, g0 = fun(x0)

    def line_search(x, f, g, d, nfev, first_iter):
        gd = jnp.dot(g, d)
        t0 = jnp.where(first_iter, jnp.minimum(1.0, 1.0 / (1.0 + jnp.linalg.norm(g))), 1.0)

        def eval_at(t):
            xp = project(x + t * d)
            fp, gp = fun(xp)
            return xp, fp, gp

        xp, fp, gp = eval_at(t0)

        def cond(c):
            t, xp, fp, gp, trials, nfev = c
            armijo = fp <= f + c1 * jnp.dot(g, xp - x)
            return jnp.logical_and(~armijo, jnp.logical_and(trials < max_ls, nfev < maxfun))

        def body(c):
            t, _, _, _, trials, nfev = c
            t = t * 0.5
            xp, fp, gp = eval_at(t)
            return t, xp, fp, gp, trials + 1, nfev + 1

        t, xp, fp, gp, _, nfev = jax.lax.while_loop(
            cond, body, (t0, xp, fp, gp, jnp.asarray(0), nfev + 1)
        )
        ok = jnp.logical_and(jnp.isfinite(fp), fp <= f + c1 * jnp.dot(g, xp - x))
        return xp, fp, gp, ok, nfev

    S0 = jnp.zeros((history, p), dtype)
    Y0 = jnp.zeros((history, p), dtype)
    rho0 = jnp.zeros(history, dtype)
    init = dict(
        x=x0, f=f0, g=g0, S=S0, Y=Y0, rho=rho0, gamma=jnp.asarray(1.0, dtype),
        it=jnp.asarray(0), nfev=jnp.asarray(1), done=jnp.asarray(False),
        x_best=x0, f_best=f0,
    )

    def cond(st):
        return jnp.logical_and(
            ~st["done"], jnp.logical_and(st["it"] < maxiter, st["nfev"] < maxfun)
        )

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

    def body(st):
        gm = st["g"] * active_mask(st["x"], st["g"])
        d = -two_loop(gm, st["S"], st["Y"], st["rho"], st["gamma"])
        d = d * direction_mask(st["x"], d)
        # fall back to steepest descent if the direction is not a descent one
        descent = jnp.dot(gm, d) < 0
        d = jnp.where(descent, d, -gm)

        xp, fp, gp, ok, nfev = line_search(st["x"], st["f"], st["g"], d, st["nfev"], st["it"] == 0)

        s = xp - st["x"]
        y = gp - st["g"]
        sy = jnp.dot(s, y)
        curv_ok = sy > 1e-10 * jnp.linalg.norm(s) * jnp.linalg.norm(y)
        upd = jnp.logical_and(ok, jnp.logical_and(curv_ok, jnp.all(jnp.isfinite(y))))

        S = jnp.where(upd, jnp.roll(st["S"], 1, axis=0).at[0].set(s), st["S"])
        Y = jnp.where(upd, jnp.roll(st["Y"], 1, axis=0).at[0].set(y), st["Y"])
        rho = jnp.where(upd, jnp.roll(st["rho"], 1).at[0].set(1.0 / sy), st["rho"])
        gamma = jnp.where(upd, sy / jnp.dot(y, y), st["gamma"])

        x = jnp.where(ok, xp, st["x"])
        f = jnp.where(ok, fp, st["f"])
        g = jnp.where(ok, gp, st["g"])

        better = f < st["f_best"]
        x_best = jnp.where(better, x, st["x_best"])
        f_best = jnp.where(better, f, st["f_best"])

        pg = project(x - g) - x
        converged = jnp.max(jnp.abs(pg)) < gtol
        return dict(
            x=x, f=f, g=g, S=S, Y=Y, rho=rho, gamma=gamma,
            it=st["it"] + 1, nfev=nfev, done=jnp.logical_or(~ok, converged),
            x_best=x_best, f_best=f_best,
        )

    st = jax.lax.while_loop(cond, body, init)
    return st["x_best"], st["f_best"], st["nfev"]
