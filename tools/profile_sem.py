"""Break down one SEM iteration's cost at the bench config (n=2000, m=25)."""
import time
import numpy as np


def timeit(fn, *args, n=5, warm=2):
    import jax
    for _ in range(warm):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.time() - t0) / n, out


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
    Y = np.sin(3 * X) + 0.05 * rng.randn(n, 1)
    layer1 = [kernel(length=np.array([0.5]), name='sexp', nugget=1e-4)]
    layer2 = [kernel(length=np.array([0.5]), name='sexp', nugget=1e-4,
                     nugget_est=True, scale_est=True, connect=np.arange(1))]
    model = dgp(X, Y, combine(layer1, layer2), vecchia=True, m=25)
    eng = model.imp._engine()
    nn_state = eng.get_nn_state()
    latents, params = eng.get_state()
    key = jax.random.PRNGKey(0)

    # full train chunk of 16
    def chunk(state, key):
        return eng.train_chunk(state, key, 16, 10)
    dt, _ = timeit(chunk, (latents, params), key, n=3, warm=1)
    print(f"train_chunk(16 iters): {dt*1000:.1f} ms  -> {dt/16*1000:.1f} ms/iter, {16/dt:.2f} it/s")

    # i-step alone
    i_step = jax.jit(lambda lat, par, key: eng._i_step(lat, par, nn_state, key, 10))
    dt, lat2 = timeit(i_step, latents, params, key)
    print(f"i_step (11 sweeps): {dt*1000:.1f} ms")

    # m-step alone
    m_step = jax.jit(lambda lat, par: eng._m_step(lat, par, nn_state))
    dt, _ = timeit(m_step, latents, params)
    print(f"m_step (2 nodes): {dt*1000:.1f} ms")

    # prior draw batch (ancestral sampler), S=11
    draw = jax.jit(lambda lat, par, key: eng._draw_prior_node_batch(
        0, 0, lat, par, nn_state, key, 11))
    dt, _ = timeit(draw, latents, params, key)
    print(f"draw_prior_batch S=11 (ancestral fori): {dt*1000:.1f} ms")

    # single upper-layer log-lik eval (the ESS candidate cost)
    loglik = jax.jit(lambda lat, par: eng._upper_loglik(0, lat, par, nn_state))
    dt, _ = timeit(loglik, latents, params)
    print(f"upper_loglik (1 candidate eval): {dt*1000:.2f} ms")

    # single m-step node objective f+g eval
    from dgp_tpu.vecchia import core as vcore
    sp = eng.spec[1][0]
    p = params[1][0]
    Xn = jnp.concatenate([latents[0], eng.X[:, :1]], axis=1)
    y = eng.y_final[0]
    ns = nn_state[1][0]
    nd = jnp.ones(n, eng.dtype)
    Xo, yo, ndo = Xn[ns['ord']], y[ns['ord']], nd[ns['ord']]
    lt0 = jnp.concatenate([jnp.log(p['length']), jnp.log(p['nugget'])[None]])

    fg = jax.jit(lambda lt: vcore.vecchia_nllik_fg(
        lt, Xo, yo, ns['NN'], ndo, name='sexp', n_length=1,
        scale_est=True, nugget_est=True, fixed_scale=p['scale'],
        fixed_nugget=p['nugget'], n_orig=jnp.asarray(float(n), eng.dtype),
        sum_residual=None))
    dt, _ = timeit(fg, lt0)
    print(f"vecchia_nllik_fg (pallas grad, 1 eval): {dt*1000:.2f} ms")

    # XLA autodiff objective for comparison
    def obj(lt):
        nll, scale = vcore.vecchia_nllik(
            lt, Xo, yo, ns['NN'], ndo, name='sexp',
            scale_est=True, nugget_est=True, fixed_scale=p['scale'],
            fixed_nugget=p['nugget'], n_orig=jnp.asarray(float(n), eng.dtype),
            sum_residual=None)
        return nll, scale
    fg2 = jax.jit(lambda lt: jax.value_and_grad(obj, has_aux=True)(lt))
    dt, _ = timeit(fg2, lt0)
    print(f"vecchia_nllik autodiff (XLA, 1 eval): {dt*1000:.2f} ms")

    # pallas forward llik only
    ll = jax.jit(lambda lat: vcore.vecchia_llik(
        jnp.concatenate([lat[0], eng.X[:, :1]], 1)[ns['ord']], yo, ns['NN'],
        p['scale'], p['length'], p['nugget'], ndo, 'sexp'))
    dt, _ = timeit(ll, latents)
    print(f"vecchia_llik fwd (pallas, 1 eval): {dt*1000:.2f} ms")


if __name__ == "__main__" and len(__import__("sys").argv) == 1:
    main()


def main2():
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
    Y = np.sin(3 * X) + 0.05 * rng.randn(n, 1)
    layer1 = [kernel(length=np.array([0.5]), name='sexp', nugget=1e-4)]
    layer2 = [kernel(length=np.array([0.5]), name='sexp', nugget=1e-4,
                     nugget_est=True, scale_est=True, connect=np.arange(1))]
    model = dgp(X, Y, combine(layer1, layer2), vecchia=True, m=25)
    # train a bit so state is realistic
    model.train(N=16, disable=True, chunk_size=16)
    eng = model.imp._engine()
    nn_state = eng.get_nn_state()
    latents, params = eng.get_state()
    key = jax.random.PRNGKey(0)

    def scan16(fn):
        def run(lat, par, key):
            def body(carry, k):
                lat, par = carry
                return fn(lat, par, k), None
            keys = jax.random.split(key, 16)
            (lat, par), _ = jax.lax.scan(body, (lat, par), keys)
            return lat, par
        return jax.jit(run)

    # i_step only x16
    f = scan16(lambda lat, par, k: (eng._i_step(lat, par, nn_state, k, 10), par))
    dt, _ = timeit(f, latents, params, key, n=3, warm=1)
    print(f"16x i_step: {dt*1000:.0f} ms -> {dt/16*1000:.1f} ms/iter")

    # m_step only x16
    f = scan16(lambda lat, par, k: (lat, eng._m_step(lat, par, nn_state)))
    dt, _ = timeit(f, latents, params, key, n=3, warm=1)
    print(f"16x m_step: {dt*1000:.0f} ms -> {dt/16*1000:.1f} ms/iter")

    # prior-draw batch only x16
    f = scan16(lambda lat, par, k: (
        (lat[0] + 0.0 * eng._draw_prior_node_batch(0, 0, lat, par, nn_state, k, 11)[0][:, None],),
        par))
    dt, _ = timeit(f, latents, params, key, n=3, warm=1)
    print(f"16x draw_prior_batch(S=11): {dt*1000:.0f} ms -> {dt/16*1000:.1f} ms/iter")

    # r2 only x16
    f = scan16(lambda lat, par, k: ((lat[0] + 0.0 * eng._r2_vector(lat)[0][0],), par))
    dt, _ = timeit(f, latents, params, key, n=3, warm=1)
    print(f"16x r2_vector: {dt*1000:.0f} ms -> {dt/16*1000:.1f} ms/iter")

    # full chunk for comparison at this state
    dt, _ = timeit(lambda s, k: eng.train_chunk(s, k, 16, 10), (latents, params), key, n=3, warm=1)
    print(f"train_chunk(16): {dt*1000:.0f} ms -> {dt/16*1000:.1f} ms/iter")


if __name__ == "__main__" and __import__('sys').argv[-1] == '2':
    main2()


def main3():
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
    Y = np.sin(3 * X) + 0.05 * rng.randn(n, 1)
    layer1 = [kernel(length=np.array([0.5]), name='sexp', nugget=1e-4)]
    layer2 = [kernel(length=np.array([0.5]), name='sexp', nugget=1e-4,
                     nugget_est=True, scale_est=True, connect=np.arange(1))]
    model = dgp(X, Y, combine(layer1, layer2), vecchia=True, m=25)
    model.train(N=16, disable=True, chunk_size=16)
    eng = model.imp._engine()
    nn_state = eng.get_nn_state()
    latents, params = eng.get_state()
    key = jax.random.PRNGKey(0)

    def scan16(fn):
        def run(lat, par, key):
            def body(carry, k):
                lat, par = carry
                return fn(lat, par, k), None
            keys = jax.random.split(key, 16)
            (lat, par), _ = jax.lax.scan(body, (lat, par), keys)
            return lat, par
        return jax.jit(run)

    # composed i+m (no r2/para) x16
    def step(lat, par, k):
        k1, _ = jax.random.split(k)
        lat = eng._i_step(lat, par, nn_state, k1, 10)
        par = eng._m_step(lat, par, nn_state)
        return lat, par
    f = scan16(step)
    dt, _ = timeit(f, latents, params, key, n=3, warm=1)
    print(f"16x (i_step+m_step): {dt*1000:.0f} ms -> {dt/16*1000:.1f} ms/iter")

    # i_step with params updated by m_step but discard (check data dependence)
    def step2(lat, par, k):
        k1, _ = jax.random.split(k)
        lat = eng._i_step(lat, par, nn_state, k1, 10)
        return lat, par
    f = scan16(step2)
    dt, _ = timeit(f, latents, params, key, n=3, warm=1)
    print(f"16x i_step (fixed params again): {dt*1000:.0f} ms -> {dt/16*1000:.1f} ms/iter")

    # m_step with latents evolving via i_step but m_step result discarded
    def step3(lat, par, k):
        k1, _ = jax.random.split(k)
        lat2 = eng._i_step(lat, par, nn_state, k1, 10)
        par2 = eng._m_step(lat2, par, nn_state)
        # use par2 only via tiny side effect to keep it alive, don't carry
        lat2 = (lat2[0] + 0.0 * par2[1][0]['length'][0],)
        return lat2, par
    f = scan16(step3)
    dt, _ = timeit(f, latents, params, key, n=3, warm=1)
    print(f"16x i+m (params not carried): {dt*1000:.0f} ms -> {dt/16*1000:.1f} ms/iter")


if __name__ == "__main__" and __import__('sys').argv[-1] == '3':
    main3()


def main4():
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
    Y = np.sin(3 * X) + 0.05 * rng.randn(n, 1)
    layer1 = [kernel(length=np.array([0.5]), name='sexp', nugget=1e-4)]
    layer2 = [kernel(length=np.array([0.5]), name='sexp', nugget=1e-4,
                     nugget_est=True, scale_est=True, connect=np.arange(1))]
    model = dgp(X, Y, combine(layer1, layer2), vecchia=True, m=25)
    model.train(N=16, disable=True, chunk_size=16)
    eng = model.imp._engine()
    nn_state = eng.get_nn_state()
    latents, params = eng.get_state()
    key = jax.random.PRNGKey(0)

    def make(traced_nn):
        def run(state, nn_state_arg, key):
            ns = nn_state_arg if traced_nn else nn_state
            def body(carry, k):
                lat, par = carry
                k1, _ = jax.random.split(k)
                lat = eng._i_step(lat, par, ns, k1, 10)
                r2 = eng._r2_vector(lat)
                par = eng._m_step(lat, par, ns)
                return (lat, par), (eng._para_vector(par), r2)
            keys = jax.random.split(key, 16)
            (lat, par), out = jax.lax.scan(body, state, keys)
            return (lat, par), out
        return jax.jit(run)

    f = make(False)
    dt, _ = timeit(f, (latents, params), nn_state, key, n=3, warm=1)
    print(f"16x full body, nn CONST: {dt*1000:.0f} ms -> {dt/16*1000:.1f} ms/iter")

    f = make(True)
    dt, _ = timeit(f, (latents, params), nn_state, key, n=3, warm=1)
    print(f"16x full body, nn TRACED: {dt*1000:.0f} ms -> {dt/16*1000:.1f} ms/iter")


if __name__ == "__main__" and __import__('sys').argv[-1] == '4':
    main4()
