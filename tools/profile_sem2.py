"""In-program SEM decomposition: each component scanned 16x inside one jit
call, so RPC/dispatch overhead is amortised away."""
import os
import sys
import time
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_fn(fn, *args, reps=3):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import dgp_tpu
    if jax.default_backend() != "cpu":
        dgp_tpu.set_default_dtype("float32")
    from dgp_tpu import config as dcfg
    if os.environ.get("PROFILE_ESS_SPEC"):
        dcfg.ESS_SPEC = int(os.environ["PROFILE_ESS_SPEC"])
    if os.environ.get("PROFILE_MSTEP_CAP"):
        dcfg.MSTEP_MAXFUN_CAP = int(os.environ["PROFILE_MSTEP_CAP"])
    from dgp_tpu import dgp, kernel, combine, nb_seed

    nb_seed(123)
    rng = np.random.RandomState(123)
    n = int(os.environ.get("PROFILE_N", 2000))
    X = rng.rand(n, 1) * 2 - 1

    def func(x):
        y1 = (np.sin(7.5 * x) + 1) / 2
        return (2 / 3 * np.sin(2 * (2 * y1 - 1))
                + 4 / 3 * np.exp(-30 * (2 * (2 * y1 - 1)) ** 2) - 1 / 3)

    Y = func(X) + 0.05 * rng.randn(n, 1)

    layer1 = [kernel(length=np.array([0.5]), name='sexp', nugget=1e-4)]
    layer2 = [kernel(length=np.array([0.5]), name='sexp', nugget=1e-4,
                     nugget_est=True, scale_est=True, connect=np.arange(1))]
    model = dgp(X, Y, combine(layer1, layer2), vecchia=True, m=25)
    if os.environ.get('PROFILE_TRAINED'):
        model.train(N=int(os.environ['PROFILE_TRAINED']), disable=True, chunk_size=16)
    eng = model.imp._engine()
    nn_state = eng.get_nn_state()
    latents, params = eng.get_state()
    key = jax.random.PRNGKey(0)
    R = 16

    def scan16(body):
        @jax.jit
        def f(latents, params, key):
            def step(carry, k):
                lat, par = carry
                return body(lat, par, k), None
            keys = jax.random.split(key, R)
            (lat, par), _ = jax.lax.scan(step, (latents, params), keys)
            return lat, par
        return f

    def body_full(lat, par, k):
        lat = eng._i_step(lat, par, nn_state, k, 10)
        return lat, eng._m_step(lat, par, nn_state)

    def body_istep(lat, par, k):
        return eng._i_step(lat, par, nn_state, k, 10), par

    def body_istep0(lat, par, k):
        return eng._i_step(lat, par, nn_state, k, 0), par

    def body_mstep(lat, par, k):
        return lat, eng._m_step(lat, par, nn_state)

    def body_prior(lat, par, k):
        nu = eng._draw_prior_node_batch(0, 0, lat, par, nn_state, k, 11)
        lat0 = lat[0] + 0.0 * nu[0][:, None]  # keep live without changing state
        return (lat0,) + tuple(lat[1:]), par

    def body_r2(lat, par, k):
        r2 = eng._r2_vector(lat)
        lat0 = lat[0] + 0.0 * r2[0][0]
        return (lat0,) + tuple(lat[1:]), par

    def body_noop(lat, par, k):
        k1, _ = jax.random.split(k)
        lat0 = lat[0] + 0.0 * jax.random.uniform(k1, (), lat[0].dtype)
        return (lat0,) + tuple(lat[1:]), par

    full = scan16(body_full)
    istep = scan16(body_istep)
    istep1 = scan16(body_istep0)
    mstep = scan16(body_mstep)
    prior = scan16(body_prior)
    r2v = scan16(body_r2)
    noop = scan16(body_noop)

    for name, f in [("noop", noop), ("full", full), ("i_step(10)", istep),
                    ("i_step(0)", istep1), ("m_step", mstep),
                    ("prior_S11", prior), ("r2", r2v)]:
        t = bench_fn(f, latents, params, key)
        print(f"{name:12s} {t / R * 1000:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
