"""Elliptical slice sampling as a `lax.while_loop`.

Mirrors the bracket-shrinking ESS of the reference
(`dgpsi/imputation.py:44-119`) but runs fully on device: the data-dependent
rejection loop is a while_loop whose body re-evaluates the (traced)
log-likelihood of the upper layer at each candidate.

A hard cap on the number of shrink steps (default 1000) guards against a
numerically stuck loop; on hitting the cap the current state is kept.
"""
import jax
import jax.numpy as jnp

_TWO_PI = 2.0 * jnp.pi


def ess_update(key, f, nu, log_lik_fn, max_steps=1000):
    """One ESS transition.

    Args:
        key: PRNG key.
        f: current latent state, any shape.
        nu: prior draw with the same shape as ``f``.
        log_lik_fn: traced function mapping a candidate to a scalar log-lik.

    Returns:
        accepted candidate with the same shape as ``f``.
    """
    k_u, k_theta, k_loop = jax.random.split(key, 3)
    log_y = log_lik_fn(f) + jnp.log(jax.random.uniform(k_u, dtype=f.dtype))
    theta0 = jax.random.uniform(k_theta, dtype=f.dtype) * _TWO_PI

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

    init = (k_loop, theta0, theta0 - _TWO_PI, theta0, f, jnp.asarray(False), jnp.asarray(0))
    carry = jax.lax.while_loop(cond, body, init)
    fp, done = carry[4], carry[5]
    return jnp.where(done, fp, f)
