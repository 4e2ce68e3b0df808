"""Measure ensemble predict throughput (bench config: n=2000 Vecchia DGP,
N=5 imputations, 20k query points, m_pred=50) at different chunk sizes."""
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import dgp_tpu
    if jax.default_backend() != "cpu":
        dgp_tpu.set_default_dtype("float32")
    from dgp_tpu import dgp, kernel, combine, emulator, nb_seed
    from dgp_tpu.models import ensemble as ens_mod
    from bench import func

    nb_seed(123)
    rng = np.random.RandomState(123)
    n = 2000
    X = rng.rand(n, 1) * 2 - 1
    Y = func(X) + 0.05 * rng.randn(n, 1)
    layer1 = [kernel(length=np.array([0.5]), name='sexp', nugget=1e-4)]
    layer2 = [kernel(length=np.array([0.5]), name='sexp', nugget=1e-4,
                     nugget_est=True, scale_est=True, connect=np.arange(1))]
    t0 = time.time()
    m = dgp(X, Y, combine(layer1, layer2), vecchia=True, m=25)
    m.train(N=16, disable=True, chunk_size=16)
    print(f"model ready {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    emu = emulator(m.estimate(), N=5)
    zp = np.linspace(-1, 1, 20000).reshape(-1, 1)

    for chunk in (int(a) for a in sys.argv[1:] or (8192, 4096)):
        ens_mod._CHUNK = chunk
        emu._ens_cache = None
        t0 = time.time()
        emu.predict(zp, m=50)
        warm = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            emu.predict(zp, m=50)
            times.append(time.time() - t0)
        best = min(times)
        print(f"chunk={chunk}: warm(compile)={warm:.1f}s "
              f"steady={best*1e3:.0f}ms -> {len(zp)/best:.0f} pts/s",
              flush=True)


if __name__ == "__main__":
    main()
