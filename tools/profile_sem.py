"""Decompose one SEM iteration of the bench config (n=2000 Vecchia) into
I-step / M-step / prior-draw / ESS-llik costs on the current backend."""
import os
import sys
import time
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, reps=5, **kw):
    import jax
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    import dgp_tpu
    if jax.default_backend() != "cpu":
        dgp_tpu.set_default_dtype("float32")
    from dgp_tpu import dgp, kernel, combine, nb_seed

    nb_seed(123)
    rng = np.random.RandomState(123)
    n = 2000
    X = rng.rand(n, 1) * 2 - 1
    Y = np.sin(7.5 * X) + 0.05 * rng.randn(n, 1)

    layer1 = [kernel(length=np.array([0.5]), name='sexp', nugget=1e-4)]
    layer2 = [kernel(length=np.array([0.5]), name='sexp', nugget=1e-4,
                     nugget_est=True, scale_est=True, connect=np.arange(1))]
    model = dgp(X, Y, combine(layer1, layer2), vecchia=True, m=25)
    eng = model.imp._engine()
    nn_state = eng.get_nn_state()
    latents, params = eng.get_state()
    key = jax.random.PRNGKey(0)

    # full iteration
    @jax.jit
    def full(latents, params, key):
        lat = eng._i_step(latents, params, nn_state, key, 10)
        par = eng._m_step(lat, params, nn_state)
        return lat, par

    # I-step only
    @jax.jit
    def istep(latents, params, key):
        return eng._i_step(latents, params, nn_state, key, 10)

    # M-step only
    @jax.jit
    def mstep(latents, params):
        return eng._m_step(latents, params, nn_state)

    # single M-step objective eval (node 1: layer-1 vecchia node, fg path)
    # prior draw batch (layer0, S=11)
    @jax.jit
    def prior_draw(latents, params, key):
        return eng._draw_prior_node_batch(0, 0, latents, params, nn_state, key, 11)

    # single upper-layer llik eval (the ESS candidate cost)
    @jax.jit
    def ulik(latents, params):
        return eng._upper_loglik(0, latents, params, nn_state)

    # one ESS sweep
    @jax.jit
    def sweep(latents, params, key):
        return eng._sweep(latents, params, nn_state, key)

    for name, fn, args in [
        ("full_iter", full, (latents, params, key)),
        ("i_step(burn10)", istep, (latents, params, key)),
        ("m_step", mstep, (latents, params)),
        ("prior_draw_S11", prior_draw, (latents, params, key)),
        ("upper_llik_1eval", ulik, (latents, params)),
        ("ess_sweep_x1", sweep, (latents, params, key)),
    ]:
        t = timeit(fn, *args)
        print(f"{name:22s} {t*1000:9.2f} ms")


if __name__ == "__main__":
    main()
