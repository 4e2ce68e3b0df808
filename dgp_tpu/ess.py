"""Elliptical slice sampling as a `lax.while_loop`, with speculative
candidate batching.

Mirrors the bracket-shrinking ESS of the reference
(`dgpsi/imputation.py:44-119`) but runs fully on device: the data-dependent
rejection loop is a while_loop whose body re-evaluates the (traced)
log-likelihood of the upper layer at each candidate.

Speculative batching: the bracket-shrinking recursion is deterministic given
that every earlier candidate was REJECTED (each rejection shrinks one bracket
end to the rejected angle), and candidate j is only ever needed when
candidates 1..j-1 were all rejected.  So K candidate angles can be generated
up-front per loop iteration and their K log-likelihoods evaluated in ONE
batched launch; the first accepted candidate (if any) is taken.  This is
distributionally identical to the sequential sampler while cutting the
number of sequential likelihood launches by ~K.

A hard cap on the number of shrink rounds guards against a numerically stuck
loop; on hitting the cap the current state is kept.
"""
import jax
import jax.numpy as jnp

_TWO_PI = 2.0 * jnp.pi


def ess_update(key, f, nu, log_lik_fn, log_lik_multi=None, log_lik_angles=None,
               spec=4, max_steps=1000, return_angle=False):
    """One ESS transition.  With ``return_angle`` the accepted ellipse angle
    is returned as (cos, sin) -- (1, 0) when no candidate was accepted -- so
    callers can propagate the update to linear views of the state.

    Args:
        key: PRNG key.
        f: current latent state, any shape.
        nu: prior draw with the same shape as ``f``.
        log_lik_fn: traced function mapping a candidate to a scalar log-lik.
        log_lik_multi: optional batched evaluator mapping (K,)+f.shape
            candidates to (K,) log-liks; defaults to ``vmap(log_lik_fn)``.
        log_lik_angles: optional evaluator mapping (cos (K,), sin (K,)) to
            (K,) log-liks of the candidates cos*f + sin*nu.  Candidates are
            LINEAR in (f, nu), so an evaluator that precomputes gathered /
            transformed views of f and nu once per update only needs the
            angles -- this avoids materialising and re-gathering each
            candidate (see CompiledDGP._angle_loglik).
        spec: number of speculative candidates per loop iteration.

    Returns:
        accepted candidate with the same shape as ``f``.
    """
    if log_lik_multi is None and spec > 1 and log_lik_angles is None:
        log_lik_multi = jax.vmap(log_lik_fn)
    k_u, k_theta, k_loop = jax.random.split(key, 3)
    # minval guards against u == 0 -> log == -inf (accept-anything threshold)
    u0 = jax.random.uniform(k_u, dtype=f.dtype,
                            minval=jnp.finfo(f.dtype).tiny, maxval=1.0)
    theta0 = jax.random.uniform(k_theta, dtype=f.dtype) * _TWO_PI

    if spec <= 1:
        log_y = log_lik_fn(f) + jnp.log(u0)
        def body(carry):
            key, theta, tmin, tmax, _, _, steps = carry
            fp = f * jnp.cos(theta) + nu * jnp.sin(theta)
            done = log_lik_fn(fp) > log_y
            shrink = ~done
            tmin = jnp.where(jnp.logical_and(shrink, theta < 0.0), theta, tmin)
            tmax = jnp.where(jnp.logical_and(shrink, theta >= 0.0), theta, tmax)
            key, sub = jax.random.split(key)
            theta_new = jax.random.uniform(sub, dtype=f.dtype, minval=tmin, maxval=tmax)
            theta = jnp.where(done, theta, theta_new)
            return key, theta, tmin, tmax, fp, done, steps + 1

        def cond(carry):
            done, steps = carry[-2], carry[-1]
            return jnp.logical_and(~done, steps < max_steps)

        init = (k_loop, theta0, theta0 - _TWO_PI, theta0, f,
                jnp.asarray(False), jnp.asarray(0))
        carry = jax.lax.while_loop(cond, body, init)
        fp, done = carry[4], carry[5]
        f_out = jnp.where(done, fp, f)
        if return_angle:
            th = jnp.where(done, carry[1], 0.0)
            return f_out, (jnp.cos(th), jnp.sin(th))
        return f_out

    K = int(spec)
    expand = (slice(None),) + (None,) * f.ndim

    def gen_batch(key, theta, tmin, tmax):
        """K speculative angles under the all-rejected bracket recursion."""
        key, sub = jax.random.split(key)
        us = jax.random.uniform(sub, (K,), dtype=f.dtype)

        def gen(carry_a, u):
            th, lo, hi = carry_a
            lo = jnp.where(th < 0.0, th, lo)
            hi = jnp.where(th >= 0.0, th, hi)
            th_next = lo + u * (hi - lo)
            return (th_next, lo, hi), th

        (theta_next, _, _), thetas = jax.lax.scan(gen, (theta, tmin, tmax), us)
        return key, thetas, theta_next

    def cand_states(thetas):
        return (f[None] * jnp.cos(thetas)[expand]
                + nu[None] * jnp.sin(thetas)[expand])         # (K,)+f.shape

    def eval_cands(thetas, with_current):
        """Log-liks of the candidates (optionally prepending the current
        state as angle (1, 0) so log_y shares the launch)."""
        if log_lik_angles is not None:
            cos_v, sin_v = jnp.cos(thetas), jnp.sin(thetas)
            if with_current:
                cos_v = jnp.concatenate([jnp.ones(1, cos_v.dtype), cos_v])
                sin_v = jnp.concatenate([jnp.zeros(1, sin_v.dtype), sin_v])
            return log_lik_angles(cos_v, sin_v)
        fps = cand_states(thetas)
        if with_current:
            fps = jnp.concatenate([f[None], fps], axis=0)
        return log_lik_multi(fps)

    def resolve(key, theta, tmin, tmax, thetas, theta_next, lls, log_y,
                steps):
        """Pick the first accepted candidate; replay bracket shrinks for the
        rejected prefix so the carry matches the sequential sampler."""
        acc = lls > log_y                                     # (K,)
        any_acc = jnp.any(acc)
        first = jnp.argmax(acc)
        th_f = thetas[first]
        fp = f * jnp.cos(th_f) + nu * jnp.sin(th_f)
        used = jnp.where(any_acc, first, K)

        def replay(carry_a, tu):
            th, lo, hi, j = carry_a
            take = j < used
            lo = jnp.where(jnp.logical_and(take, th < 0.0), th, lo)
            hi = jnp.where(jnp.logical_and(take, th >= 0.0), th, hi)
            th = jnp.where(take, tu, th)
            return (th, lo, hi, j + 1), None

        (theta_r, tmin_r, tmax_r, _), _ = jax.lax.scan(
            replay, (theta, tmin, tmax, jnp.asarray(0)),
            jnp.concatenate([thetas[1:], theta_next[None]]))
        theta_out = jnp.where(any_acc, thetas[first], theta_r)
        return (key, theta_out, tmin_r, tmax_r, fp, any_acc, steps + 1)

    def body(carry):
        key, theta, tmin, tmax, _, _, steps = carry
        key, thetas, theta_next = gen_batch(key, theta, tmin, tmax)
        lls = eval_cands(thetas, with_current=False)
        return resolve(key, theta, tmin, tmax, thetas, theta_next, lls,
                       log_y, steps)

    def cond(carry):
        done, steps = carry[-2], carry[-1]
        return jnp.logical_and(~done, steps * K < max_steps)

    # first round: fold the log_y evaluation at the CURRENT state into the
    # same batched launch as the first K candidates (one launch instead of
    # two for the common accept-in-first-batch case)
    k_loop, thetas1, theta_next1 = gen_batch(k_loop, theta0,
                                             theta0 - _TWO_PI, theta0)
    lls1 = eval_cands(thetas1, with_current=True)
    log_y = lls1[0] + jnp.log(u0)
    init = resolve(k_loop, theta0, theta0 - _TWO_PI, theta0, thetas1,
                   theta_next1, lls1[1:], log_y, jnp.asarray(0))
    carry = jax.lax.while_loop(cond, body, init)
    fp, done = carry[4], carry[5]
    f_out = jnp.where(done, fp, f)
    if return_angle:
        th = jnp.where(done, carry[1], 0.0)
        return f_out, (jnp.cos(th), jnp.sin(th))
    return f_out
