"""Compiled DGP engine: the whole SEM iteration as one device program.

The reference's training loop (`dgpsi/dgp.py:1364`, `imputation.py:22`)
mutates a Python object graph, re-entering Numba kernels thousands of times
per iteration.  Here the DGP's dynamic state is a pytree

    state = (latents, params)
      latents : tuple over hidden layers of (n, M_l) arrays
      params  : tuple over layers of tuples of per-GP-node
                {'length': (p,), 'nugget': (), 'scale': ()}

and the static structure (wiring, kernel names, priors, likelihoods,
replicate layout) is captured in a hashable spec.  One `train_chunk` call
runs `n_iters` full SEM iterations (ESS-within-Gibbs I-step + per-node
bounded-L-BFGS M-step) as a single `lax.scan`, with zero host round-trips.

The ESS rejection loop is a `lax.while_loop` (ess.ess_update); the
Hetero mean's exact Gibbs draw (likelihood_class.post_het1/post_het2) is a
fused linear-algebra block; per-node optimisations use autodiff gradients.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .. import gp_core, likelihoods
from ..ess import ess_update
from ..ops import kernels as kops
from ..ops import linalg, lbfgs
from .. import config


class NodeSpec:
    """Static description of one node (GP or likelihood)."""

    def __init__(self, obj, layer, n_layer):
        self.kind = obj.type  # 'gp' | 'likelihood'
        self.name = obj.name
        self.input_dim = tuple(int(i) for i in obj.input_dim)
        self.connect = None if getattr(obj, 'connect', None) is None else \
            tuple(int(i) for i in obj.connect)
        self.is_final = layer == n_layer - 1
        if self.kind == 'gp':
            self.n_length = len(obj.length)
            self.scale_est = bool(obj.scale_est)
            self.nugget_est = bool(obj.nugget_est)
            self.prior_name = obj.prior_name
            self.prior_coef = None if obj.prior_coef is None else \
                tuple(float(c) for c in obj.prior_coef)
            self.bds = None if obj.bds is None else tuple(float(b) for b in obj.bds)
            self.has_rep = obj.W_diag is not None
            self.D = int(obj.D)
        else:
            self.link = getattr(obj, 'link', None)
            self.num_classes = getattr(obj, 'num_classes', None)
            self.robustmax_eps = getattr(obj, 'robustmax_eps', 1e-3)
            self.exact_post_idx = getattr(obj, 'exact_post_idx', None)
            self.has_rep = obj.rep is not None


class CompiledDGP:
    """Compiles SEM training / imputation for one DGP structure."""

    def __init__(self, all_layer, block=True):
        self.all_layer = all_layer
        self.n_layer = len(all_layer)
        self.block = block
        self.spec = [[NodeSpec(node, l, self.n_layer) for node in layer]
                     for l, layer in enumerate(all_layer)]
        self.dtype = config.default_dtype()
        # data (static during training)
        self._extract_data()
        self._jit_cache = {}

    # ------------------------------------------------------------------
    # data/state movement between the object graph and pytrees
    # ------------------------------------------------------------------
    def _extract_data(self):
        dt = self.dtype
        first = self.all_layer[0][0]
        n = first.input.shape[0]
        # reconstruct the global input X from first-layer node wiring
        d_global = 0
        for node, sp in zip(self.all_layer[0], self.spec[0]):
            d_global = max(d_global, max(sp.input_dim) + 1)
            if sp.connect is not None:
                d_global = max(d_global, max(sp.connect) + 1)
        for layer, specs in zip(self.all_layer, self.spec):
            for node, sp in zip(layer, specs):
                if sp.connect is not None:
                    d_global = max(d_global, max(sp.connect) + 1)
        X = np.zeros((n, d_global), dt)
        seen = np.zeros(d_global, bool)
        for node, sp in zip(self.all_layer[0], self.spec[0]):
            X[:, list(sp.input_dim)] = node.input
            seen[list(sp.input_dim)] = True
        for layer, specs in zip(self.all_layer, self.spec):
            for node, sp in zip(layer, specs):
                if sp.connect is not None and node.global_input is not None:
                    X[:, list(sp.connect)] = node.global_input
                    seen[list(sp.connect)] = True
        self.X = jnp.asarray(X)
        self.n = n
        # final-layer data
        y_final, w_diag, sum_res, rep, y_lik = [], [], [], None, []
        for node, sp in zip(self.all_layer[-1], self.spec[-1]):
            if sp.kind == 'gp':
                y_final.append(jnp.asarray(node.output[:, 0], dt))
                if sp.has_rep:
                    w_diag.append(jnp.asarray(node.W_diag, dt))
                    sum_res.append(jnp.asarray(float(np.ravel(node.sum_residual)[0]), dt))
                    rep = jnp.asarray(node.rep, jnp.int32)
                else:
                    w_diag.append(None)
                    sum_res.append(None)
                y_lik.append(None)
            else:
                y_final.append(None)
                w_diag.append(None)
                sum_res.append(None)
                y_lik.append(jnp.asarray(node.output, dt))
                if sp.has_rep:
                    rep = jnp.asarray(node.rep, jnp.int32)
        self.y_final, self.w_diag, self.sum_res, self.y_lik = y_final, w_diag, sum_res, y_lik
        self.rep = rep
        self.n_orig = float(len(rep)) if rep is not None else float(n)

    def get_state(self):
        """Extract (latents, params) pytree from the object graph."""
        dt = self.dtype
        latents = tuple(
            jnp.asarray(np.column_stack([node.output[:, 0] for node in layer]), dt)
            for layer in self.all_layer[:-1]
        )
        params = tuple(
            tuple(
                {'length': jnp.asarray(node.length, dt),
                 'nugget': jnp.asarray(float(node.nugget[0]), dt),
                 'scale': jnp.asarray(float(node.scale[0]), dt)}
                if sp.kind == 'gp' else None
                for node, sp in zip(layer, specs)
            )
            for layer, specs in zip(self.all_layer, [self.spec[l] for l in range(self.n_layer)])
        )
        return latents, params

    def set_state(self, state):
        """Write a (latents, params) pytree back into the object graph,
        refreshing node inputs/outputs exactly as the reference mutates them."""
        latents, params = state
        latents = [np.asarray(a) for a in latents]
        for l, (layer, specs) in enumerate(zip(self.all_layer, self.spec)):
            In = None if l == 0 else latents[l - 1]
            for k, (node, sp) in enumerate(zip(layer, specs)):
                p = params[l][k]
                if sp.kind == 'gp' and p is not None:
                    node.length = np.atleast_1d(np.asarray(p['length']))
                    node.nugget = np.atleast_1d(np.asarray(p['nugget']))
                    node.scale = np.atleast_1d(np.asarray(p['scale']))
                if l > 0:
                    if sp.kind == 'likelihood' and sp.has_rep:
                        node.input = In[np.asarray(self.rep)][:, list(sp.input_dim)]
                    else:
                        node.input = In[:, list(sp.input_dim)]
                if l < self.n_layer - 1:
                    node.output = latents[l][:, [k]].copy()

    # ------------------------------------------------------------------
    # traced building blocks
    # ------------------------------------------------------------------
    def _node_input(self, l, k, latents):
        sp = self.spec[l][k]
        In = self.X if l == 0 else latents[l - 1]
        Xn = In[:, list(sp.input_dim)]
        if sp.connect is not None:
            Xn = jnp.concatenate([Xn, self.X[:, list(sp.connect)]], axis=1)
        return Xn

    def _gp_loglik(self, l, k, latents, params):
        """Marginal log-lik of GP node (l, k) at current params -- the ESS
        acceptance contribution (kernel_class.log_likelihood_func)."""
        sp = self.spec[l][k]
        p = params[l][k]
        Xn = self._node_input(l, k, latents)
        y = self.y_final[k] if sp.is_final else latents[l][:, k]
        w_diag = self.w_diag[k] if (sp.is_final and sp.has_rep) else None
        ref_coef = jnp.asarray(sp.prior_coef, self.dtype) if sp.prior_name == 'ref' else None
        return gp_core.log_lik_fixed(
            Xn, y, p['length'], p['scale'], p['nugget'], name=sp.name,
            w_diag=w_diag, ref_prior_coef=ref_coef, n_length=sp.n_length,
            vecch=False)

    def _lik_loglik(self, k, latents, final_layer_idx=None):
        """Log-lik of likelihood node k in the final layer."""
        sp = self.spec[-1][k]
        f = latents[self.n_layer - 2]
        if sp.has_rep:
            f = f[self.rep]
        f = f[:, list(sp.input_dim)]
        if sp.name == 'Categorical':
            fn = likelihoods.llik_fn(sp.name, num_classes=sp.num_classes,
                                     link=sp.link, robustmax_eps=sp.robustmax_eps)
        else:
            fn = likelihoods.llik_fn(sp.name)
        return fn(f, self.y_lik[k])

    def _upper_loglik(self, l, latents, params):
        """Sum of log-liks of all nodes in layer l+1 (the ESS target for
        imputing layer l)."""
        total = jnp.asarray(0.0, self.dtype)
        for k, sp in enumerate(self.spec[l + 1]):
            if sp.kind == 'gp':
                total = total + self._gp_loglik(l + 1, k, latents, params)
            else:
                total = total + self._lik_loglik(k, latents)
        return total

    def _draw_prior_layer(self, l, latents, params, key):
        """nu ~ N(0, scale_k * K_k) draws for all nodes of hidden layer l."""
        cols = []
        keys = jax.random.split(key, len(self.spec[l]))
        for k, sp in enumerate(self.spec[l]):
            p = params[l][k]
            Xn = self._node_input(l, k, latents)
            K = p['scale'] * kops.k_matrix(Xn, p['length'], p['nugget'], sp.name)
            L = linalg.safe_cholesky(K)
            cols.append(linalg.mvn_sample(keys[k], L))
        return jnp.stack(cols, axis=1)

    def _ess_block_layer(self, l, latents, params, key):
        """Blocked (layer-wise) ESS update of hidden layer l
        (imputation.one_sample_block)."""
        k_nu, k_ess = jax.random.split(key)
        nu = self._draw_prior_layer(l, latents, params, k_nu)
        f = latents[l]

        def log_lik(fp):
            lat2 = latents[:l] + (fp,) + latents[l + 1:]
            return self._upper_loglik(l, lat2, params)

        f_new = ess_update(k_ess, f, nu, log_lik)
        return latents[:l] + (f_new,) + latents[l + 1:]

    # -- Hetero exact conditional posterior ----------------------------
    def _post_het(self, v, Gamma, y, key, rep):
        """Draw the Hetero mean latent from its exact conditional posterior
        (likelihood_class.post_het1/post_het2 in fused form)."""
        dt = self.dtype
        N = v.shape[0]
        if rep is None:
            d = Gamma
            rhs_y = y
        else:
            GammaInv = 1.0 / Gamma
            MGy = jax.ops.segment_sum(GammaInv * y, rep, num_segments=N)
            MGM = jax.ops.segment_sum(GammaInv, rep, num_segments=N)
            d = 1.0 / MGM
            rhs_y = d * MGy
        vG = v + jnp.diag(d)
        L = linalg.safe_cholesky(vG)
        L1 = linalg.safe_cholesky(v)
        solve = lambda b: linalg.cho_solve(L, b[:, None])[:, 0]
        mu = v @ solve(rhs_y)
        sd = jax.random.normal(key, (N, 2), dt)
        u = L1 @ sd[:, 0]
        w = jnp.sqrt(d) * sd[:, 1]
        return mu + u - v @ solve(u + w)

    def _ess_nodewise_layer(self, l, latents, params, key):
        """Node-wise ESS of hidden layer l, with the exact Gibbs shortcut for
        likelihood parameters that admit closed-form conditionals
        (imputation.one_sample)."""
        keys = jax.random.split(key, len(self.spec[l]))
        for k, sp in enumerate(self.spec[l]):
            p = params[l][k]
            linked = [(j, usp) for j, usp in enumerate(self.spec[l + 1])
                      if k in usp.input_dim]
            # exact posterior path (Hetero mean)
            if (len(linked) == 1 and linked[0][1].kind == 'likelihood'
                    and linked[0][1].exact_post_idx is not None):
                usp = linked[0][1]
                idx = list(usp.input_dim).index(k)
                if idx in list(np.atleast_1d(usp.exact_post_idx)):
                    Xn = self._node_input(l, k, latents)
                    v = p['scale'] * kops.k_matrix(Xn, p['length'], p['nugget'], sp.name)
                    logvar_col = usp.input_dim[1]
                    if usp.has_rep:
                        Gamma = jnp.exp(latents[l][self.rep][:, logvar_col])
                        y = self.y_lik[linked[0][0]][:, 0]
                        f = self._post_het(v, Gamma, y, keys[k], self.rep)
                    else:
                        Gamma = jnp.exp(latents[l][:, logvar_col])
                        y = self.y_lik[linked[0][0]][:, 0]
                        f = self._post_het(v, Gamma, y, keys[k], None)
                    latents = latents[:l] + (latents[l].at[:, k].set(f),) + latents[l + 1:]
                    continue
            # node-wise ESS
            k_nu, k_ess = jax.random.split(keys[k])
            Xn = self._node_input(l, k, latents)
            K = p['scale'] * kops.k_matrix(Xn, p['length'], p['nugget'], sp.name)
            Lc = linalg.safe_cholesky(K)
            nu = linalg.mvn_sample(k_nu, Lc)
            f = latents[l][:, k]

            def log_lik(fp, l=l, k=k, linked=linked):
                lat2 = latents[:l] + (latents[l].at[:, k].set(fp),) + latents[l + 1:]
                total = jnp.asarray(0.0, self.dtype)
                for j, usp in linked:
                    if usp.kind == 'gp':
                        total = total + self._gp_loglik(l + 1, j, lat2, params)
                    else:
                        total = total + self._lik_loglik(j, lat2)
                return total

            f_new = ess_update(k_ess, f, nu, log_lik)
            latents = latents[:l] + (latents[l].at[:, k].set(f_new),) + latents[l + 1:]
        return latents

    def _layer_is_exact(self, l):
        """Does layer l+1 contain a likelihood with an exact conditional?"""
        return any(sp.kind == 'likelihood' and sp.exact_post_idx is not None
                   for sp in self.spec[l + 1])

    def _sweep(self, latents, params, key):
        """One full ESS-within-Gibbs sweep over all hidden layers."""
        keys = jax.random.split(key, self.n_layer - 1)
        for l in range(self.n_layer - 1):
            if self.block and not self._layer_is_exact(l):
                latents = self._ess_block_layer(l, latents, params, keys[l])
            else:
                latents = self._ess_nodewise_layer(l, latents, params, keys[l])
        return latents

    def _i_step(self, latents, params, key, burnin):
        def body(lat, k):
            return self._sweep(lat, params, k), None

        keys = jax.random.split(key, burnin + 1)
        latents, _ = jax.lax.scan(body, latents, keys)
        return latents

    # -- M-step ---------------------------------------------------------
    def _m_step_node(self, l, k, latents, params):
        sp = self.spec[l][k]
        p = params[l][k]
        Xn = self._node_input(l, k, latents)
        y = self.y_final[k] if sp.is_final else latents[l][:, k]
        w_diag = self.w_diag[k] if (sp.is_final and sp.has_rep) else None
        sum_res = self.sum_res[k] if (sp.is_final and sp.has_rep) else None
        cl = (gp_core.compute_cl(Xn, y.shape[0], sp.n_length, False)
              if sp.prior_name == 'ref' else None)
        prior_coef = (jnp.asarray(sp.prior_coef, self.dtype)
                      if sp.prior_coef is not None else None)
        kw = dict(name=sp.name, n_length=sp.n_length, scale_est=sp.scale_est,
                  nugget_est=sp.nugget_est, fixed_scale=p['scale'],
                  fixed_nugget=p['nugget'], prior_name=sp.prior_name,
                  prior_coef=prior_coef, w_diag=w_diag, sum_residual=sum_res,
                  n_orig=jnp.asarray(self.n_orig, self.dtype), cl=cl)

        if sp.nugget_est:
            lt0 = jnp.concatenate([jnp.log(p['length']), jnp.log(p['nugget'])[None]])
        else:
            lt0 = jnp.log(p['length'])

        def fg(lt):
            nll, g, _ = gp_core.neg_log_lik_and_grad(lt, Xn, y, **kw)
            return nll, g

        lb, ub, has_bounds = self._node_bounds(sp)
        maxfun = int(max(30, 20 + 5 * sp.D))
        lt, _, _ = lbfgs.minimize(fg, lt0,
                                  lb if has_bounds else None,
                                  ub if has_bounds else None,
                                  maxiter=100, maxfun=maxfun)
        _, scale = gp_core.neg_log_lik(lt, Xn, y, **kw)
        # guard against a NaN-poisoned optimisation
        ok = jnp.all(jnp.isfinite(lt)) & jnp.isfinite(scale)
        lt = jnp.where(ok, lt, lt0)
        scale = jnp.where(ok & jnp.asarray(sp.scale_est), scale, p['scale'])
        if sp.nugget_est:
            new = {'length': jnp.exp(lt[:-1]), 'nugget': jnp.exp(lt[-1]), 'scale': scale}
        else:
            new = {'length': jnp.exp(lt), 'nugget': p['nugget'], 'scale': scale}
        return new

    def _node_bounds(self, sp):
        p = sp.n_length + (1 if sp.nugget_est else 0)
        big = float(np.finfo(np.dtype(self.dtype)).max / 4)
        lb = np.full(p, -big)
        ub = np.full(p, big)
        n_len = sp.n_length
        if sp.bds is not None:
            lb[:n_len] = np.log(sp.bds[0]) if sp.bds[0] > 0 else -big
            ub[:n_len] = np.log(sp.bds[1])
        elif sp.prior_name == 'ref':
            ub[:n_len] = 13.0
        if sp.nugget_est:
            lb[-1] = np.log(1e-8)
        has_bounds = np.any(lb > -big) or np.any(ub < big)
        return jnp.asarray(lb, self.dtype), jnp.asarray(ub, self.dtype), bool(has_bounds)

    def _m_step(self, latents, params):
        new_params = []
        for l in range(self.n_layer):
            layer_p = []
            for k, sp in enumerate(self.spec[l]):
                if sp.kind == 'gp':
                    layer_p.append(self._m_step_node(l, k, latents, params))
                else:
                    layer_p.append(None)
            new_params.append(tuple(layer_p))
        return tuple(new_params)

    def _para_vector(self, params):
        out = []
        for l in range(self.n_layer):
            for k, sp in enumerate(self.spec[l]):
                if sp.kind == 'gp':
                    p = params[l][k]
                    out.append(jnp.concatenate([p['scale'][None], p['length'],
                                                p['nugget'][None]]))
        return tuple(out)

    def _r2_vector(self, latents):
        """Per-node R^2 of global_input -> input, for nodes in layers > 0
        with a global connection (kernel_class.r2)."""
        out = []
        for l in range(1, self.n_layer):
            for k, sp in enumerate(self.spec[l]):
                if sp.kind != 'gp' or sp.connect is None:
                    continue
                G = self.X[:, list(sp.connect)]
                G1 = jnp.concatenate([G, jnp.ones((G.shape[0], 1), self.dtype)], axis=1)
                In = latents[l - 1][:, list(sp.input_dim)]
                beta = jnp.linalg.lstsq(G1, In)[0]
                resid = jnp.sum((In - G1 @ beta) ** 2, axis=0)
                rsq = 1.0 - resid / (In.shape[0] * jnp.var(In, axis=0))
                out.append(rsq)
        return tuple(out)

    # ------------------------------------------------------------------
    # public compiled entry points
    # ------------------------------------------------------------------
    def _get_jitted(self, name, builder):
        if name not in self._jit_cache:
            self._jit_cache[name] = builder()
        return self._jit_cache[name]

    def sample(self, state, key, burnin=0):
        """Run (burnin+1) ESS-within-Gibbs sweeps; returns new state."""
        def build():
            @partial(jax.jit, static_argnums=(2,))
            def f(state, key, burnin):
                latents, params = state
                latents = self._i_step(latents, params, key, burnin)
                return latents, params
            return f

        return self._get_jitted('sample', build)(state, key, burnin)

    def train_chunk(self, state, key, n_iters, ess_burn):
        """Run n_iters full SEM iterations on device.

        Returns (state, para_path, r2_path): para_path is a tuple (one entry
        per GP node, ordered layer-major) of (n_iters, p+2) hyper-parameter
        traces; r2_path similar for connected nodes in layers > 0.
        """
        def build():
            @partial(jax.jit, static_argnums=(2, 3))
            def f(state, key, n_iters, ess_burn):
                def body(carry, k):
                    latents, params = carry
                    k1, _ = jax.random.split(k)
                    latents = self._i_step(latents, params, k1, ess_burn)
                    r2 = self._r2_vector(latents)
                    params = self._m_step(latents, params)
                    return (latents, params), (self._para_vector(params), r2)

                keys = jax.random.split(key, n_iters)
                (latents, params), (para, r2) = jax.lax.scan(body, state, keys)
                return (latents, params), para, r2
            return f

        return self._get_jitted('train', build)(state, key, n_iters, ess_burn)
