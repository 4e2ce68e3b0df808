"""Primitive cost measurements on the TPU.

Times each op as (scan96 - scan16)/80 inside jit, with the whole output
summed into the carry (no DCE), removing the dispatch floor.
"""
import time
import numpy as np


def op_time(fn, *args):
    import jax
    import jax.numpy as jnp

    def make(length):
        @jax.jit
        def run(c0, *a):
            def body(c, _):
                # make inputs carry-dependent so the body can't be hoisted
                ac = tuple(t + (c * 1e-30).astype(t.dtype) if t.dtype.kind == 'f' else t
                           for t in a)
                out = fn(*ac)
                s = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(out))
                return c + s * 1e-30, None
            c, _ = jax.lax.scan(body, c0, None, length=length)
            return c
        return run

    import jax
    c0 = jax.numpy.zeros((), 'float32')
    r16, r96 = make(16), make(96)
    jax.block_until_ready(r16(c0, *args)); jax.block_until_ready(r96(c0, *args))
    t16 = t96 = 0.0
    for _ in range(3):
        t0 = time.time(); jax.block_until_ready(r16(c0, *args)); t16 += time.time() - t0
        t0 = time.time(); jax.block_until_ready(r96(c0, *args)); t96 += time.time() - t0
    return (t96 - t16) / 3 / 80


def main():
    import jax
    import jax.numpy as jnp
    from dgp_tpu.ops import linalg
    from dgp_tpu.ops import kernels as kops

    n, m1, d = 2000, 26, 2
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (n, d), jnp.float32)
    xv = jax.random.normal(key, (n,), jnp.float32)
    idx = jax.random.randint(key, (n, m1), 0, n)

    print(f"gather (n,m1,d) traced idx:  {op_time(lambda X, idx: X[idx], X, idx)*1e6:7.0f} us")
    print(f"gather (n,m1) traced idx:    {op_time(lambda xv, idx: xv[idx], xv, idx)*1e6:7.0f} us")
    idxc = np.asarray(idx)
    print(f"gather (n,m1) CONST idx:     {op_time(lambda xv: xv[idxc] * xv[0], xv)*1e6:7.0f} us")

    A = jax.random.normal(key, (n, m1, m1), jnp.float32)
    A = jnp.einsum('nij,nkj->nik', A, A) + 30 * jnp.eye(m1, dtype=jnp.float32)
    A = A.astype(jnp.float32)
    print(f"chol_small (2000,26,26):     {op_time(linalg.chol_small, A)*1e6:7.0f} us")
    b = jax.random.normal(key, (n, m1), jnp.float32)
    L = linalg.chol_small(A)
    print(f"fwd_solve_small (2000,26):   {op_time(linalg.fwd_solve_small, L, b)*1e6:7.0f} us")
    print(f"xla chol (2000,26,26):       {op_time(jnp.linalg.cholesky, A)*1e6:7.0f} us")

    Xi = jax.random.normal(key, (n, m1, d), jnp.float32)
    ln = jnp.asarray([0.5, 0.7], jnp.float32)
    print(f"k_cross (2000,26,26) sexp:   {op_time(lambda Xi: kops.k_cross(Xi, Xi, ln, 'sexp'), Xi)*1e6:7.0f} us")

    from dgp_tpu.ops import pallas_vecchia as pv
    yg = jax.random.normal(key, (n, m1), jnp.float32)
    diag = jnp.full((n, m1), 1.1, jnp.float32)
    if pv.use_pallas(jnp.float32, m1):
        t = op_time(lambda Xi, yg, diag: pv.block_loglik_parts(Xi, yg, diag, name='sexp'),
                    Xi, yg, diag)
        print(f"pallas block_loglik:         {t*1e6:7.0f} us")
        dnug = jnp.zeros((n, m1), jnp.float32)
        t = op_time(lambda Xi, yg, diag, dnug: pv.block_nllik_grad_parts(
            Xi, yg, diag, dnug, name='sexp', n_length=1, nugget_est=True),
            Xi, yg, diag, dnug)
        print(f"pallas block_grad p=2:       {t*1e6:7.0f} us")

    q = jax.random.normal(key, (n,), jnp.float32)
    print(f"sum64 (2000,):               {op_time(linalg.sum64, q)*1e6:7.0f} us")
    print(f"sum f32 (2000,):             {op_time(jnp.sum, q)*1e6:7.0f} us")

    D2 = jax.random.uniform(key, (n, m1, m1, d), jnp.float32)
    def cand_eval(D2, yg, diag):
        K = jnp.exp(-jnp.sum(D2, -1))
        K = kops.set_diag(K, diag)
        L = linalg.chol_small(K)
        Ly = linalg.fwd_solve_small(L, yg)
        return linalg.sum64(Ly[:, -1] ** 2) + linalg.sum64(2 * jnp.log(L[:, -1, -1]))
    print(f"cand eval (precomp D2, XLA): {op_time(cand_eval, D2, yg, diag)*1e6:7.0f} us")

    D2b, ygb, diagb = (jnp.repeat(a[None], 6, 0) for a in (D2, yg, diag))
    print(f"cand eval x6 batched:        {op_time(jax.vmap(cand_eval), D2b, ygb, diagb)*1e6:7.0f} us")

    # fori_loop step cost: 2000 iterations of gather-dot-scatter
    w = jax.random.normal(key, (n, m1 - 1), jnp.float32)
    ia = jax.random.randint(key, (n, m1 - 1), 0, n)
    def anc(w, ia, e):
        def body(i, x):
            return x.at[i].set(jnp.dot(w[i], x[ia[i]]) + e[i])
        return jax.lax.fori_loop(0, n, body, jnp.zeros(n, jnp.float32))
    print(f"ancestral fori n=2000:       {op_time(anc, w, ia, q)*1e6:7.0f} us")

    # wave-based: x <- W x + e, 60 iterations
    def waves(w, ia, e):
        def body(i, x):
            return jnp.sum(w * e[ia], axis=1) * 0 + e  # placeholder same-shape flops
        x = jnp.zeros(n, jnp.float32)
        def it(i, x):
            return jnp.einsum('nm,nm->n', w, x[ia]) + e
        return jax.lax.fori_loop(0, 60, it, x)
    print(f"60 wave iters (n,25) dot:    {op_time(waves, w, ia, q)*1e6:7.0f} us")


if __name__ == "__main__":
    main()
