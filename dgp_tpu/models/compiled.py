"""Compiled DGP engine: the whole SEM iteration as one device program.

The reference's training loop (`dgpsi/dgp.py:1364`, `imputation.py:22`)
mutates a Python object graph, re-entering Numba kernels thousands of times
per iteration.  Here the DGP's dynamic state is a pytree

    state = (latents, params)
      latents : tuple over hidden layers of (n, M_l) arrays
      params  : tuple over layers of tuples of per-GP-node
                {'length': (p,), 'nugget': (), 'scale': ()}

plus, under the Vecchia approximation, a per-node neighbour structure

    nn_state : tuple over layers of tuples of {'ord': (n,), 'NN': (n, m+1)}

and the static structure (wiring, kernel names, priors, likelihoods,
replicate layout) is captured in a hashable spec.  One `train_chunk` call
runs `n_iters` full SEM iterations (ESS-within-Gibbs I-step + per-node
bounded-L-BFGS M-step) as a single `lax.scan`, with zero host round-trips.

The ESS rejection loop is a `lax.while_loop` (ess.ess_update); the
Hetero mean's exact Gibbs draw (likelihood_class.post_het1/post_het2) is a
fused linear-algebra block; per-node optimisations use autodiff gradients.
Vecchia log-likelihoods/objectives run as batched masked (n, m+1, m+1)
Cholesky factorisations (vecchia.core); prior draws under Vecchia use
ancestral sampling with batch-precomputed conditional weights.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .. import gp_core, likelihoods
from ..ess import ess_update
from ..ops import kernels as kops
from ..ops import linalg, lbfgs
from ..vecchia import core as vcore
from ..vecchia import nn as vnn_mod
from .. import config

#: above this point count the NN refresh stops fusing everything into one
#: program and dispatches bounded query chunks instead (one very long query
#: program over a huge gather source can crash the TPU runtime worker --
#: the fault behind the former 200k host-fallback cap).
DEVICE_REFRESH_MAX_FUSED_N = 200_000


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
            self.vecch = bool(getattr(obj, 'vecch', False))
        else:
            self.link = getattr(obj, 'link', None)
            self.num_classes = getattr(obj, 'num_classes', None)
            self.robustmax_eps = getattr(obj, 'robustmax_eps', 1e-3)
            self.exact_post_idx = getattr(obj, 'exact_post_idx', None)
            self.has_rep = obj.rep is not None
            self.vecch = False


class CompiledDGP:
    """Compiles SEM training / imputation for one DGP structure."""

    def __init__(self, all_layer, block=True):
        self.all_layer = all_layer
        self.n_layer = len(all_layer)
        self.block = block
        self.spec = [[NodeSpec(node, l, self.n_layer) for node in layer]
                     for l, layer in enumerate(all_layer)]
        self.dtype = config.default_dtype()
        self._extract_data()
        self._jit_cache = {}

    # ------------------------------------------------------------------
    # data/state movement between the object graph and pytrees
    # ------------------------------------------------------------------
    def _extract_data(self):
        dt = self.dtype
        first = self.all_layer[0][0]
        n = first.input.shape[0]
        d_global = 0
        for layer, specs in zip(self.all_layer, self.spec):
            for node, sp in zip(layer, specs):
                if sp.connect is not None:
                    d_global = max(d_global, max(sp.connect) + 1)
        for sp in self.spec[0]:
            d_global = max(d_global, max(sp.input_dim) + 1)
        X = np.zeros((n, d_global), dt)
        for node, sp in zip(self.all_layer[0], self.spec[0]):
            X[:, list(sp.input_dim)] = node.input
        for layer, specs in zip(self.all_layer, self.spec):
            for node, sp in zip(layer, specs):
                if sp.connect is not None and node.global_input is not None:
                    X[:, list(sp.connect)] = node.global_input
        self.X = jnp.asarray(X)
        self.n = n
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
        # These arrays are CLOSED OVER by the jitted programs; jit lowering
        # fetches captured constants back to host (mlir ir_constant), and a
        # d2h on an array whose h2d transfer is still in flight takes
        # minutes over the axon tunnel (vecchia/nn.py::_host).  Make every
        # captured constant ready before any tracing can touch it.
        jax.block_until_ready((self.X, y_final, w_diag, sum_res, y_lik, rep))

    def get_state(self):
        dt = np.dtype(self.dtype)
        latents = tuple(
            np.column_stack([node.output[:, 0] for node in layer]).astype(dt)
            for layer in self.all_layer[:-1]
        )
        params = tuple(
            tuple(
                {'length': np.asarray(node.length, dt),
                 'nugget': dt.type(node.nugget[0]),
                 'scale': dt.type(node.scale[0])}
                if node.type == 'gp' else None
                for node in layer
            )
            for layer in self.all_layer
        )
        # ONE pipelined host->device transfer for the whole tree (per-leaf
        # jnp.asarray paid a dispatch each over the device tunnel)
        return jax.device_put((latents, params))

    def get_nn_state(self):
        """Per-node Vecchia ordering/neighbour arrays (None for dense nodes).

        The device copies are cached against the identity of the host arrays:
        re-uploading ~n*m index arrays on every train_chunk dispatch costs a
        host->device transfer per chunk, and the NN structure only changes at
        the (power-of-2) refresh points."""
        fp = tuple(getattr(node, 'nn_version', 0)
                   for layer in self.all_layer for node in layer)
        cached = getattr(self, '_nn_cache', None)
        if cached is not None and cached[0] == fp:
            return cached[1]
        out = []
        for layer, specs in zip(self.all_layer, self.spec):
            lay = []
            for node, sp in zip(layer, specs):
                if sp.kind == 'gp' and sp.vecch:
                    d = {'ord': jnp.asarray(node.ord, jnp.int32),
                         'rev': jnp.asarray(np.argsort(node.ord), jnp.int32),
                         'NN': jnp.asarray(node.NNarray, jnp.int32)}
                    if getattr(node, 'imp_NNarray', None) is not None:
                        d['impNN'] = jnp.asarray(node.imp_NNarray, jnp.int32)
                    lay.append(d)
                else:
                    lay.append(None)
            out.append(tuple(lay))
        out = tuple(out)
        self._nn_cache = (fp, out)
        return out

    def set_nn_state(self, nn_state):
        """Write a (device-computed) Vecchia NN structure back into the node
        objects (predictions/persistence read it from there)."""
        for l, (layer, specs) in enumerate(zip(self.all_layer, self.spec)):
            for k, (node, sp) in enumerate(zip(layer, specs)):
                d = nn_state[l][k]
                if d is None:
                    continue
                node.ord = np.asarray(d['ord'])
                node.rev_ord = np.argsort(node.ord)
                node.NNarray = np.asarray(d['NN'])
                if 'impNN' in d:
                    node.imp_NNarray = np.asarray(d['impNN'])
                node.nn_version = getattr(node, 'nn_version', 0) + 1

    def supports_device_refresh(self):
        """Device-side NN refresh covers the standard configurations: exact
        NN search and IVF approximate search (both have fully on-device
        builds), random ordering (no custom ord_fun).  Above
        DEVICE_REFRESH_MAX_FUSED_N points the refresh switches from one
        fused program to bounded query-chunk dispatches (a single very long
        query program over a huge gather source can crash the TPU runtime
        worker -- see vecchia/nn._QUERY_CHUNK), which covers approximate-NN
        nodes at any n; only large EXACT nodes (O(n^2) distance tiles)
        still fall back to the host path."""
        for layer, specs in zip(self.all_layer, self.spec):
            for node, sp in zip(layer, specs):
                if sp.kind == 'gp' and sp.vecch:
                    if getattr(node, 'ord_fun', None) is not None:
                        return False
                    if getattr(node, 'nn_method', 'exact') not in (
                            'exact', 'approx', 'hnsw', 'ivf'):
                        return False
                    n_node = node.input.shape[0]
                    approx = (getattr(node, 'nn_method', 'exact') != 'exact'
                              and n_node > 4 * vnn_mod._BLOCK)
                    if n_node > DEVICE_REFRESH_MAX_FUSED_N and not approx:
                        return False
        return True

    def refresh_nn(self, state, key):
        """Re-order and rebuild every vecch node's NN structure ON DEVICE
        (the role of imputation.update_ord_nn / reference dgp.py:1388-1389)
        as one jitted program -- no host round trips of the latent state.
        Same-wiring isotropic nodes share one ordering (dgp.py:643-663)."""
        plan = []  # (l, k, 'new'|'share', j, m, needs_imp, approx)
        for l, (layer, specs) in enumerate(zip(self.all_layer, self.spec)):
            for k, (node, sp) in enumerate(zip(layer, specs)):
                if not (sp.kind == 'gp' and sp.vecch):
                    continue
                needs_imp = getattr(node, 'imp_NNarray', None) is not None
                n_node = node.input.shape[0]
                approx = (getattr(node, 'nn_method', 'exact') != 'exact'
                          and n_node > 4 * vnn_mod._BLOCK)
                share = None
                for (lj, kj, mode_j, _, mj, imp_j, _aj) in plan:
                    spj = self.spec[lj][kj]
                    if (lj == l and spj.n_length == 1 and sp.n_length == 1
                            and spj.input_dim == sp.input_dim
                            and spj.connect == sp.connect
                            and mj == node.m and not needs_imp and not imp_j
                            and _aj == approx):
                        share = (lj, kj)
                        break
                plan.append((l, k, 'share' if share else 'new', share,
                             int(node.m), needs_imp, approx))
        plan_t = tuple(plan)

        if any(e[2] == 'new'
               and self.all_layer[e[0]][e[1]].input.shape[0]
               > DEVICE_REFRESH_MAX_FUSED_N
               for e in plan_t):
            return self._refresh_nn_eager(state, key, plan_t)

        def build():
            from ..vecchia import nn as vnn

            @jax.jit
            def f(state, key):
                latents, params = state
                n_new = sum(1 for e in plan_t if e[2] == 'new')
                keys = jax.random.split(key, max(n_new, 1))
                built = {}
                i = 0
                for (l, k, mode, share, m, needs_imp, approx) in plan_t:
                    if mode == 'share':
                        built[(l, k)] = built[share]
                        continue
                    p = params[l][k]
                    Xn = self._node_input(l, k, latents)
                    Xs = Xn / p['length']
                    ordv = jax.random.permutation(keys[i], Xn.shape[0])
                    i += 1
                    Xo = Xs[ordv]
                    rev = jnp.argsort(ordv).astype(jnp.int32)
                    if approx:
                        NN, imp = vnn.nn_approx_dev(Xo, m, impute=needs_imp)
                        d = {'ord': ordv.astype(jnp.int32), 'rev': rev,
                             'NN': NN.astype(jnp.int32)}
                        if needs_imp:
                            d['impNN'] = imp.astype(jnp.int32)
                    else:
                        d = {'ord': ordv.astype(jnp.int32), 'rev': rev,
                             'NN': vnn._nn_ordered_impl(Xo, m).astype(jnp.int32)}
                        if needs_imp:
                            d['impNN'] = vnn._pred_nn_impl(Xo, Xo, m)[:, 1:].astype(jnp.int32)
                    built[(l, k)] = d
                return tuple(
                    tuple(built.get((l, k))
                          for k in range(len(self.spec[l])))
                    for l in range(self.n_layer))
            return f

        return self._get_jitted('refresh' + str(plan_t), build)(state, key)

    def _refresh_nn_eager(self, state, key, plan_t):
        """NN refresh for very large models: same plan semantics as the
        fused program, but each node's IVF queries dispatch as bounded
        chunks (vecchia/nn.nn_approx_dev_chunked).  All arrays stay on
        device -- latents are never round-tripped to the host."""
        from ..vecchia import nn as vnn

        latents, params = state
        n_new = sum(1 for e in plan_t if e[2] == 'new')
        keys = jax.random.split(key, max(n_new, 1))
        built = {}
        i = 0
        for (l, k, mode, share, m, needs_imp, approx) in plan_t:
            if mode == 'share':
                built[(l, k)] = built[share]
                continue
            p = params[l][k]
            Xn = self._node_input(l, k, latents)
            Xs = Xn / p['length']
            ordv = jax.random.permutation(keys[i], Xn.shape[0])
            i += 1
            Xo = Xs[ordv]
            rev = jnp.argsort(ordv).astype(jnp.int32)
            if approx:
                NN, imp = vnn.nn_approx_dev_chunked(Xo, m, impute=needs_imp)
                d = {'ord': ordv.astype(jnp.int32), 'rev': rev,
                     'NN': NN.astype(jnp.int32)}
                if needs_imp:
                    d['impNN'] = imp.astype(jnp.int32)
            else:
                d = {'ord': ordv.astype(jnp.int32), 'rev': rev,
                     'NN': vnn._nn_ordered_impl(Xo, m).astype(jnp.int32)}
                if needs_imp:
                    d['impNN'] = vnn._pred_nn_impl(
                        Xo, Xo, m)[:, 1:].astype(jnp.int32)
            built[(l, k)] = d
        return tuple(
            tuple(built.get((l, k)) for k in range(len(self.spec[l])))
            for l in range(self.n_layer))

    def set_state(self, state):
        # single pipelined transfer of the whole state tree (per-array
        # np.asarray would pay one tunnel round-trip each).  Block first:
        # a d2h requested while the producer still runs can take minutes
        # over the axon tunnel (vecchia/nn.py::_host).
        jax.block_until_ready(state)
        latents, params = jax.device_get(state)
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

    def _gp_loglik(self, l, k, latents, params, nn_state):
        sp = self.spec[l][k]
        p = params[l][k]
        Xn = self._node_input(l, k, latents)
        y = self.y_final[k] if sp.is_final else latents[l][:, k]
        w_diag = self.w_diag[k] if (sp.is_final and sp.has_rep) else None
        ref_coef = jnp.asarray(sp.prior_coef, self.dtype) if sp.prior_name == 'ref' else None
        if sp.vecch:
            ns = nn_state[l][k]
            nd = w_diag if w_diag is not None else jnp.ones(Xn.shape[0], self.dtype)
            ll = vcore.vecchia_llik(Xn[ns['ord']], y[ns['ord']], ns['NN'],
                                    p['scale'], p['length'], p['nugget'],
                                    nd[ns['ord']], sp.name)
            if ref_coef is not None:
                cl = gp_core.compute_cl(Xn, Xn.shape[0], sp.n_length, True)
                ll += gp_core.log_prior(p['length'], p['nugget'], prior_name='ref',
                                        prior_coef=ref_coef, nugget_est=False, cl=cl)
            return ll
        return gp_core.log_lik_fixed(
            Xn, y, p['length'], p['scale'], p['nugget'], name=sp.name,
            w_diag=w_diag, ref_prior_coef=ref_coef, n_length=sp.n_length,
            vecch=False)

    def _lik_loglik(self, k, latents):
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

    def _upper_loglik(self, l, latents, params, nn_state):
        total = jnp.asarray(0.0, self.dtype)
        for k, sp in enumerate(self.spec[l + 1]):
            if sp.kind == 'gp':
                total = total + self._gp_loglik(l + 1, k, latents, params, nn_state)
            else:
                total = total + self._lik_loglik(k, latents)
        return total

    def _chunk_static(self, nn_state):
        """Chunk-invariant gathered NN views, one stacked gather per node.

        Gathers whose source is the training scan's carry (latents) lower to
        slow elementwise loop fusions on TPU (~17 ms per gathered (m1, n)
        vector at n=1e5 on v5e, vs ~0.5 ms for a standalone gather), and the
        same pathology hits loop-invariant gathers XLA fails to hoist out of
        the while body.  Everything whose source AND indices are fixed across
        a train_chunk -- the global X columns, y_final, the replicate diag,
        and the NN index structure -- is gathered HERE, once per chunk,
        outside the scan; per-iteration code applies only the cheap
        parameter-dependent elementwise transforms.  Returns {(l, k): dict}
        for every Vecchia GP node."""
        cs = {}
        dt = self.dtype
        for l, layer in enumerate(self.spec):
            for k, sp in enumerate(layer):
                if sp.kind != 'gp' or not sp.vecch:
                    continue
                ns = nn_state[l][k]
                if ns is None or 'NN' not in ns:
                    continue
                ordv = ns['ord']
                rev = jnp.flip(ns['NN'], axis=1)
                validT = (rev >= 0).T                    # (m1, n)
                safeT = jnp.where(validT, rev.T, 0)
                # composed index: src[idx_comp] == src[ordv][safeT]
                idx_comp = ordv[safeT]
                n = ordv.shape[0]
                dl = len(sp.input_dim)
                # static input columns: the full input for layer 0, the
                # global-connect columns for deeper layers
                if l == 0:
                    stat_cols = [self.X[:, c] for c in sp.input_dim]
                else:
                    stat_cols = []
                if sp.connect is not None:
                    stat_cols += [self.X[:, c] for c in sp.connect]
                w_diag = (self.w_diag[k]
                          if (sp.is_final and sp.has_rep) else None)
                nd = w_diag if w_diag is not None else jnp.ones(n, dt)
                rows = stat_cols + [nd]
                if sp.is_final:
                    rows.append(self.y_final[k].astype(dt))
                src = jnp.stack(rows, axis=0)            # (r, n)
                G = jnp.swapaxes(src[:, idx_comp], 0, 1)  # (m1, r, n)
                d_s = len(stat_cols)
                entry = {
                    'ordv': ordv, 'validT': validT, 'safeT': safeT,
                    'idx_comp': idx_comp,
                    'Xg_stat': G[:, :d_s, :],            # raw, unmasked
                    'nd_g': jnp.where(validT, G[:, d_s, :], 0.0),
                }
                entry['yg_stat'] = (jnp.where(validT, G[:, d_s + 1, :], 0.0)
                                    if sp.is_final else None)
                cs[(l, k)] = entry
        return cs

    def _draw_prior_node(self, l, k, latents, params, nn_state, key):
        """nu ~ N(0, scale * K) for one hidden node (dense Cholesky or
        Vecchia ancestral sampling)."""
        sp = self.spec[l][k]
        p = params[l][k]
        Xn = self._node_input(l, k, latents)
        if sp.vecch:
            ns = nn_state[l][k]
            samp = vcore.fmvn_sp(key, Xn[ns['ord']], ns['NN'], p['scale'],
                                 p['length'], p['nugget'], sp.name)
            rev_ord = ns['rev'] if 'rev' in ns else jnp.argsort(ns['ord'])
            return samp[rev_ord]
        K = p['scale'] * kops.k_matrix(Xn, p['length'], p['nugget'], sp.name)
        L = linalg.safe_cholesky(K)
        return linalg.mvn_sample(key, L)

    def _draw_prior_node_batch(self, l, k, latents, params, nn_state, key, S,
                               cs=None):
        """S iid prior draws for a node whose input is static within the
        I-step (layer 0: inputs are the global X).  Amortises the sequential
        ancestral-sampling scan across all ESS sweeps of an SEM iteration."""
        sp = self.spec[l][k]
        p = params[l][k]
        Xn = self._node_input(l, k, latents)
        n = Xn.shape[0]
        if sp.vecch:
            ns = nn_state[l][k]
            pre = None
            if cs is not None and l == 0 and (l, k) in cs:
                st = cs[(l, k)]
                # layer-0 inputs are global: the raw NN gather is
                # chunk-static.  nd here is all-ones (prior draws carry no
                # replicate diag), matching the nugget_diag=None default.
                ones_g = jnp.where(st['validT'], 1.0, 0.0).astype(self.dtype)
                pre = (st['Xg_stat'], ones_g, st['validT'])
            w, sigma, idx_asc, _ = vcore.cond_weights(
                Xn[ns['ord']], ns['NN'], p['length'], p['nugget'], sp.name,
                pre=pre)
            eps = (jax.random.normal(key, (S, n), self.dtype)
                   * jnp.sqrt(p['scale']) * sigma[None, :])
            samp = vcore.ancestral_sample(eps, w, idx_asc)
            rev_ord = ns['rev'] if 'rev' in ns else jnp.argsort(ns['ord'])
            return samp[:, rev_ord]
        K = p['scale'] * kops.k_matrix(Xn, p['length'], p['nugget'], sp.name)
        L = linalg.safe_cholesky(K)
        eps = jax.random.normal(key, (n, S), self.dtype)
        return (L @ eps).T

    def _ess_block_layer(self, l, latents, views, params, nn_state, key,
                         pre_nu=None, s=None, plan=None):
        k_nu, k_ess = jax.random.split(key)
        keys = jax.random.split(k_nu, len(self.spec[l]))
        cols = []
        for k in range(len(self.spec[l])):
            if pre_nu is not None and (l, k) in pre_nu:
                cols.append(pre_nu[(l, k)][s])
            else:
                cols.append(self._draw_prior_node(l, k, latents, params, nn_state, keys[k]))
        nu = jnp.stack(cols, axis=1)
        f = latents[l]

        def log_lik(fp):
            lat2 = latents[:l] + (fp,) + latents[l + 1:]
            return self._upper_loglik(l, lat2, params, nn_state)

        if plan is None:
            f_new = ess_update(k_ess, f, nu, log_lik,
                               spec=config.ess_spec(f.shape[0]))
            return latents[:l] + (f_new,) + latents[l + 1:], views

        # angle path: gathered block views are maintained across sweeps
        A_list = views[l]
        B_list = []
        for nd_ in plan['nodes']:
            if nd_['B_all'] is not None:
                B_list.append(nd_['B_all'][s])
            else:
                B_list.append(self._gather_latent_view(nd_, nu))
        ll = self._plan_ll(plan, l, latents, nu, A_list, B_list)
        f_new, (c_a, s_a) = ess_update(k_ess, f, nu, log_lik,
                                       log_lik_angles=ll,
                                       spec=config.ess_spec(f.shape[0]),
                                       return_angle=True)
        new_A = tuple(c_a * A + s_a * B for A, B in zip(A_list, B_list))
        views = views[:l] + (new_A,) + views[l + 1:]
        return latents[:l] + (f_new,) + latents[l + 1:], views

    def _angle_applicable(self, l):
        """The angle-combine candidate evaluator applies when every upper GP
        node runs the fused Vecchia kernel and carries no input-dependent
        ('ref') prior term."""
        from ..ops import pallas_vecchia as pv

        for j, sp in enumerate(self.spec[l + 1]):
            if sp.kind != 'gp':
                continue
            if not sp.vecch or sp.prior_name == 'ref':
                return False
            if not pv.use_pallas(jnp.dtype(self.dtype),
                                 self.all_layer[l + 1][j].m + 1):
                return False
        return True

    @staticmethod
    def _gather_latent_view(nd_, M):
        """(m1, d, n) view of M's node-input columns: ordered, gathered by
        the node's NN sets, length-scaled, zero on invalid lanes and global
        dims (padded to the full input dimension)."""
        Ms = (M[nd_['ordv']][:, nd_['cols']] / nd_['s_lat']).T
        G = jnp.swapaxes(Ms[:, nd_['safeT']], 0, 1)
        G = jnp.where(nd_['validT'][:, None, :], G, 0.0)
        if nd_['dg']:
            m1, _, n = G.shape
            G = jnp.concatenate(
                [G, jnp.zeros((m1, nd_['dg'], n), G.dtype)], axis=1)
        return G

    def _build_angle_plan(self, l, latents, params, nn_state, pre_nu, S,
                          cs=None):
        """Per-I-step static views for layer l's angle evaluator (or None).

        ESS candidates are linear in (f, nu), so each upper node's gathered,
        length-scaled Vecchia blocks decompose as cos*A + sin*B + C.  C
        (global dims + sentinels), the block diagonals, and -- for final
        nodes -- the gathered targets are fixed for the whole I-step; the A
        views are initialised here and then MAINTAINED across sweeps by the
        accepted-angle combine (A' = cos*A + sin*B), and layer-0 nu views
        are gathered for all S sweeps in one batched gather.  Per-sweep
        gather cost is therefore zero for final-feeding layers."""
        if not (self.block and not self._layer_is_exact(l)
                and config.ess_spec(latents[l].shape[0]) > 1
                and self._angle_applicable(l)):
            return None
        dt = self.dtype
        n = latents[l].shape[0]
        nodes = []
        for j, sp in enumerate(self.spec[l + 1]):
            if sp.kind != 'gp':
                continue
            p = params[l + 1][j]
            ns = nn_state[l + 1][j]
            st = cs.get((l + 1, j)) if cs is not None else None
            dl = len(sp.input_dim)
            dg = len(sp.connect) if sp.connect is not None else 0
            length_full = jnp.broadcast_to(p['length'], (dl + dg,))
            if st is not None:
                ordv, validT, safeT = st['ordv'], st['validT'], st['safeT']
            else:
                ordv = ns['ord']
                rev = jnp.flip(ns['NN'], axis=1)
                validT = (rev >= 0).T
                safeT = jnp.where(validT, rev.T, 0)
            m1 = safeT.shape[0]
            sent = (1e7 + jnp.arange(n, dtype=dt)[None, :] * 1e3
                    + jnp.arange(m1, dtype=dt)[:, None] * 7e2)
            nd_ = dict(name=sp.name, j=j, dl=dl, dg=dg,
                       cols=list(sp.input_dim), ordv=ordv, safeT=safeT,
                       validT=validT, s_lat=length_full[:dl],
                       scale=p['scale'], is_final=sp.is_final)
            if dg:
                if st is not None:
                    Cg = st['Xg_stat'] / length_full[dl:, None]
                else:
                    Gg = (self.X[:, list(sp.connect)][ordv]
                          / length_full[dl:]).T
                    Cg = jnp.swapaxes(Gg[:, safeT], 0, 1)
                C = jnp.concatenate([jnp.zeros((m1, dl, n), dt), Cg], axis=1)
            else:
                C = jnp.zeros((m1, dl, n), dt)
            nd_['C'] = jnp.where(validT[:, None, :], C, sent[:, None, :])
            if st is not None:
                ndiag_g = st['nd_g']
            else:
                w_diag = (self.w_diag[j]
                          if (sp.is_final and sp.has_rep) else None)
                ndiag = w_diag if w_diag is not None else jnp.ones(n, dt)
                ndiag_g = ndiag[ordv][safeT]
            nd_['diag'] = jnp.where(
                validT, 1.0 + p['nugget'] * ndiag_g
                + vcore._f32_jitter(jnp.dtype(dt)), 1.0)
            if sp.is_final:
                nd_['yg'] = (st['yg_stat'] if st is not None else
                             jnp.where(validT,
                                       self.y_final[j][ordv][safeT], 0.0))
            else:
                nd_['yg'] = None
            nd_['B_all'] = None
            if pre_nu is not None and all((l, c) in pre_nu for c in nd_['cols']):
                # ONE batched gather for the A0 view and all S nu views:
                # stack the current latents on top of the S prior draws so
                # the slow per-vector gather is paid once, not S+1 times.
                nu_all = jnp.stack([pre_nu[(l, c)] for c in nd_['cols']],
                                   axis=2)              # (S, n, dl)
                lat0 = latents[l][:, nd_['cols']][None]  # (1, n, dl)
                allv = jnp.concatenate([lat0, nu_all], axis=0)
                Ms = jnp.moveaxis(allv / nd_['s_lat'], 1, 2)  # (S+1, dl, n)
                idx_comp = (st['idx_comp'] if st is not None
                            else ordv[safeT])
                G = jnp.moveaxis(Ms[:, :, idx_comp], 2, 1)  # (S+1, m1, dl, n)
                G = jnp.where(validT[None, :, None, :], G, 0.0)
                if dg:
                    G = jnp.concatenate(
                        [G, jnp.zeros((S + 1, m1, dg, n), dt)], axis=2)
                nd_['A0'] = G[0]
                nd_['B_all'] = G[1:]
            else:
                nd_['A0'] = self._gather_latent_view(nd_, latents[l])
            nodes.append(nd_)
        lik_nodes = [j for j, sp in enumerate(self.spec[l + 1])
                     if sp.kind == 'likelihood']
        return dict(nodes=nodes, lik=lik_nodes)

    def _plan_ll(self, plan, l, latents, nu, A_list, B_list):
        """Angle evaluator from maintained views: (cos (K,), sin (K,)) ->
        (K,) upper-layer log-liks of the candidates cos*f + sin*nu."""
        from ..ops import pallas_vecchia as pv

        def ll(cosv, sinv):
            total = jnp.zeros(cosv.shape[0], jnp.float64)
            for nd_, A, B in zip(plan['nodes'], A_list, B_list):
                if nd_['yg'] is not None:
                    yg = nd_['yg']
                else:
                    y = latents[l + 1][:, nd_['j']]
                    yg = jnp.where(nd_['validT'],
                                   y[nd_['ordv']][nd_['safeT']], 0.0)
                ld, q = pv.block_loglik_multi_t(A, B, nd_['C'], yg,
                                                nd_['diag'], cosv, sinv,
                                                name=nd_['name'],
                                                dl=nd_['dl'])
                total = total - 0.5 * (
                    linalg.sum64(ld, axis=1)
                    + linalg.sum64(q, axis=1)
                    / jnp.asarray(nd_['scale'], jnp.float64))
            for j in plan['lik']:
                def one(c, s, j=j):
                    lat2 = (latents[:l] + (c * latents[l] + s * nu,)
                            + latents[l + 1:])
                    return self._lik_loglik(j, lat2)
                total = total + jax.vmap(one)(cosv, sinv)
            return total

        return ll

    # -- Hetero exact conditional posterior ----------------------------
    def _post_het(self, v, Gamma, y, key, rep):
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

    def _ess_nodewise_layer(self, l, latents, params, nn_state, key, pre_nu=None, s=None):
        keys = jax.random.split(key, len(self.spec[l]))
        for k, sp in enumerate(self.spec[l]):
            p = params[l][k]
            linked = [(j, usp) for j, usp in enumerate(self.spec[l + 1])
                      if k in usp.input_dim]
            if (len(linked) == 1 and linked[0][1].kind == 'likelihood'
                    and linked[0][1].exact_post_idx is not None):
                usp = linked[0][1]
                idx = list(usp.input_dim).index(k)
                if idx in list(np.atleast_1d(usp.exact_post_idx)):
                    # Exact Gibbs draw for the Hetero mean: batched sparse
                    # stacked-Vecchia sampler (reference U_matrix_sp path)
                    # when the node is in Vecchia mode, dense otherwise.
                    Xn = self._node_input(l, k, latents)
                    logvar_col = usp.input_dim[1]
                    y = self.y_lik[linked[0][0]][:, 0]
                    ns = nn_state[l][k]
                    if sp.vecch and ns is not None and 'impNN' in ns:
                        n = Xn.shape[0]
                        if usp.has_rep:
                            invG = jnp.exp(-latents[l][self.rep][:, logvar_col])
                            d = 1.0 / jax.ops.segment_sum(invG, self.rep,
                                                          num_segments=n)
                            y_eff = d * jax.ops.segment_sum(invG * y, self.rep,
                                                            num_segments=n)
                            Gamma = d
                        else:
                            Gamma = jnp.exp(latents[l][:, logvar_col])
                            y_eff = y
                        ordv = ns['ord']
                        f_ord = vcore.post_het_vecch(
                            keys[k], Xn[ordv], ns['impNN'], Gamma[ordv],
                            y_eff[ordv], p['scale'], p['length'], p['nugget'],
                            sp.name)
                        f = f_ord[ns['rev'] if 'rev' in ns
                                  else jnp.argsort(ordv)]
                    else:
                        v = p['scale'] * kops.k_matrix(Xn, p['length'],
                                                       p['nugget'], sp.name)
                        if usp.has_rep:
                            Gamma = jnp.exp(latents[l][self.rep][:, logvar_col])
                            f = self._post_het(v, Gamma, y, keys[k], self.rep)
                        else:
                            Gamma = jnp.exp(latents[l][:, logvar_col])
                            f = self._post_het(v, Gamma, y, keys[k], None)
                    latents = latents[:l] + (latents[l].at[:, k].set(f),) + latents[l + 1:]
                    continue
            k_nu, k_ess = jax.random.split(keys[k])
            if pre_nu is not None and (l, k) in pre_nu:
                nu = pre_nu[(l, k)][s]
            else:
                nu = self._draw_prior_node(l, k, latents, params, nn_state, k_nu)
            f = latents[l][:, k]

            def log_lik(fp, l=l, k=k, linked=linked):
                lat2 = latents[:l] + (latents[l].at[:, k].set(fp),) + latents[l + 1:]
                total = jnp.asarray(0.0, self.dtype)
                for j, usp in linked:
                    if usp.kind == 'gp':
                        total = total + self._gp_loglik(l + 1, j, lat2, params, nn_state)
                    else:
                        total = total + self._lik_loglik(j, lat2)
                return total

            f_new = ess_update(k_ess, f, nu, log_lik,
                               spec=config.ess_spec(f.shape[0]))
            latents = latents[:l] + (latents[l].at[:, k].set(f_new),) + latents[l + 1:]
        return latents

    def _layer_is_exact(self, l):
        return any(sp.kind == 'likelihood' and sp.exact_post_idx is not None
                   for sp in self.spec[l + 1])

    def _sweep(self, latents, views, params, nn_state, key, pre_nu=None,
               s=None, plans=None):
        keys = jax.random.split(key, self.n_layer - 1)
        for l in range(self.n_layer - 1):
            if self.block and not self._layer_is_exact(l):
                plan = plans[l] if plans is not None else None
                latents, views = self._ess_block_layer(
                    l, latents, views, params, nn_state, keys[l], pre_nu, s,
                    plan)
            else:
                latents = self._ess_nodewise_layer(l, latents, params, nn_state,
                                                   keys[l], pre_nu, s)
        return latents, views

    def _i_step(self, latents, params, nn_state, key, burnin, cs=None):
        S = burnin + 1
        key, k_pre = jax.random.split(key)
        # Prior draws for layer-0 nodes are iid across sweeps (their inputs
        # are the fixed global X), so draw them all at once.
        pre_nu = {}
        if self.n_layer > 1:
            pre_keys = jax.random.split(k_pre, len(self.spec[0]))
            for k, sp in enumerate(self.spec[0]):
                if sp.kind == 'gp':
                    pre_nu[(0, k)] = self._draw_prior_node_batch(
                        0, k, latents, params, nn_state, pre_keys[k], S, cs)

        plans = tuple(
            self._build_angle_plan(l, latents, params, nn_state,
                                   pre_nu if l == 0 else None, S, cs)
            for l in range(self.n_layer - 1))
        views0 = tuple(
            None if plan is None else tuple(nd_['A0'] for nd_ in plan['nodes'])
            for plan in plans)

        def body(carry, inp):
            lat, vw = carry
            s, k = inp
            lat, vw = self._sweep(lat, vw, params, nn_state, k, pre_nu, s,
                                  plans)
            return (lat, vw), None

        keys = jax.random.split(key, S)
        (latents, _), _ = jax.lax.scan(body, (latents, views0),
                                       (jnp.arange(S), keys))
        return latents

    # -- M-step ---------------------------------------------------------
    def _node_bounds(self, sp, p_max):
        big = float(np.finfo(np.dtype(self.dtype)).max / 4)
        p_k = sp.n_length + (1 if sp.nugget_est else 0)
        lb = np.full(p_max, -big)
        ub = np.full(p_max, big)
        n_len = sp.n_length
        if sp.bds is not None:
            lb[:n_len] = np.log(sp.bds[0]) if sp.bds[0] > 0 else -big
            ub[:n_len] = np.log(sp.bds[1])
        elif sp.prior_name == 'ref':
            ub[:n_len] = 13.0
        if sp.nugget_est:
            lb[p_k - 1] = np.log(1e-8)
            ub[p_k - 1] = big
        lb[p_k:] = 0.0  # frozen padded lanes
        ub[p_k:] = 0.0
        return jnp.asarray(lb, self.dtype), jnp.asarray(ub, self.dtype)

    def _node_operands(self, l, k, sp, latents, params, nn_state, d_max, p_max,
                       mode, cs=None):
        """Stackable operands for one GP node in the batched M-step."""
        dt = self.dtype
        p = params[l][k]
        Xn = self._node_input(l, k, latents)
        d_k = Xn.shape[1]
        y = self.y_final[k] if sp.is_final else latents[l][:, k]
        w_diag = self.w_diag[k] if (sp.is_final and sp.has_rep) else None
        sum_res = self.sum_res[k] if (sp.is_final and sp.has_rep) else None
        n = Xn.shape[0]
        p_k = sp.n_length + (1 if sp.nugget_est else 0)

        # tying matrix: node params (p_max) -> full lanes (d_max lengths + nugget)
        A = np.zeros((d_max + 1, p_max), dt)
        if sp.n_length == 1:
            A[:d_k, 0] = 1.0
        else:
            for t in range(sp.n_length):
                A[t, t] = 1.0
        if sp.nugget_est:
            A[d_max, sp.n_length] = 1.0
        b = jnp.zeros(d_max + 1, dt)
        if not sp.nugget_est:
            b = b.at[-1].set(jnp.log(p['nugget']))
        param_mask = np.zeros(p_max, dt)
        param_mask[:p_k] = 1.0

        pid = {'ga': 1, 'inv_ga': 2, 'ref': 3}.get(sp.prior_name, 0)
        prior_coef = (jnp.asarray(sp.prior_coef, dt) if sp.prior_coef is not None
                      else jnp.zeros(2, dt))
        cl = jnp.zeros(d_max, dt)
        if sp.prior_name == 'ref':
            cl_node = gp_core.compute_cl(Xn, n, sp.n_length, sp.vecch)
            cl = cl.at[:cl_node.shape[0]].set(cl_node.astype(dt))

        if d_k < d_max:
            Xn = jnp.pad(Xn, ((0, 0), (0, d_max - d_k)))

        op = {
            'A': jnp.asarray(A), 'b': b, 'param_mask': jnp.asarray(param_mask),
            'prior_id': jnp.asarray(pid, jnp.int32), 'prior_coef': prior_coef,
            'cl': cl,
            'scale_est': jnp.asarray(sp.scale_est),
            'nug_est_f': jnp.asarray(1.0 if sp.nugget_est else 0.0, jnp.float64),
            'sum_res': (jnp.asarray(sum_res, jnp.float64) if sum_res is not None
                        else jnp.asarray(0.0, jnp.float64)),
            'n_orig': jnp.asarray(self.n_orig if sum_res is not None else float(n),
                                  jnp.float64),
            'fixed_scale64': jnp.asarray(p['scale'], jnp.float64),
        }
        nd = w_diag if w_diag is not None else jnp.ones(n, dt)
        if mode == 'vecch':
            from ..ops import pallas_vecchia as pv
            ns = nn_state[l][k]
            st = cs.get((l, k)) if cs is not None else None
            if st is not None:
                # Only the latent-sourced columns change across the chunk;
                # gather them here (one stacked gather) and splice with the
                # chunk-static views of the X columns / y_final / diag.
                valid = st['validT']
                m1 = valid.shape[0]
                dyn_rows = ([latents[l - 1][:, c] for c in sp.input_dim]
                            if l > 0 else [])
                if not sp.is_final:
                    dyn_rows.append(latents[l][:, k])
                if dyn_rows:
                    srcd = jnp.stack(dyn_rows, axis=0)        # (r, n)
                    r = srcd.shape[0]
                    if r == 1:
                        # single-row gathers lower to a slow 1-D path on TPU
                        # (~17 ms vs ~7 ms for a 2-row gather at n=1e5 on
                        # v5e); a duplicated row keeps the fast 2-D layout
                        srcd = jnp.concatenate([srcd, srcd], axis=0)
                    Gd = jnp.swapaxes(srcd[:, st['idx_comp']], 0, 1)[:, :r, :]
                else:
                    Gd = None
                parts = []
                if l > 0 and d_k > 0:
                    parts.append(Gd[:, :len(sp.input_dim), :])
                parts.append(st['Xg_stat'])
                if d_k < d_max:
                    parts.append(jnp.zeros((m1, d_max - d_k, n), dt))
                Xg_raw = jnp.concatenate(parts, axis=1)
                yg = (st['yg_stat'] if sp.is_final else
                      jnp.where(valid, Gd[:, -1, :], 0.0))
                op.update(Xg_raw=Xg_raw, yg=yg, nug_g=st['nd_g'], valid=valid)
            else:
                Xg_raw, yg, nug_g, valid = pv.gather_raw_t(
                    Xn[ns['ord']], y[ns['ord']], ns['NN'], nd[ns['ord']])
                op.update(Xg_raw=Xg_raw, yg=yg, nug_g=nug_g, valid=valid)
        else:
            op.update(X=Xn, y=y, w_diag=nd)

        if sp.nugget_est:
            lt0 = jnp.concatenate([jnp.log(p['length']), jnp.log(p['nugget'])[None]])
        else:
            lt0 = jnp.log(p['length'])
        lt0 = jnp.pad(lt0, (0, p_max - p_k))
        lb, ub = self._node_bounds(sp, p_max)
        mf = max(30, 20 + 5 * sp.D)  # reference budget, kernel_class.py:542
        if config.MSTEP_MAXFUN_CAP is not None:
            mf = min(mf, int(config.MSTEP_MAXFUN_CAP))
        maxfun = jnp.asarray(mf, jnp.int32)
        return op, lt0, lb, ub, maxfun

    def _m_step(self, latents, params, nn_state, cs=None):
        from . import mstep
        from ..ops import pallas_vecchia as pv

        entries = [(l, k, sp)
                   for l, layer in enumerate(self.spec)
                   for k, sp in enumerate(layer) if sp.kind == 'gp']
        groups = {}
        for e in entries:
            l, k, sp = e
            m1 = nn_state[l][k]['NN'].shape[1] if sp.vecch else 0
            key = ('vecch' if sp.vecch else 'dense', sp.name, m1)
            groups.setdefault(key, []).append(e)

        results = {}
        for (mode, name, _m1), es in groups.items():
            d_max = max(self._node_input(l, k, latents).shape[1]
                        for l, k, _ in es)
            p_max = max(sp.n_length + (1 if sp.nugget_est else 0)
                        for _, _, sp in es)
            built = [self._node_operands(l, k, sp, latents, params, nn_state,
                                         d_max, p_max, mode, cs)
                     for l, k, sp in es]
            ops = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                         *[b[0] for b in built])
            lt0 = jnp.stack([b[1] for b in built])
            lb = jnp.stack([b[2] for b in built])
            ub = jnp.stack([b[3] for b in built])
            mf = jnp.stack([b[4] for b in built])
            use_pl = (mode == 'vecch'
                      and pv.use_pallas(jnp.dtype(self.dtype),
                                        built[0][0]['yg'].shape[0]))
            lt, scale, ok = mstep.run_group(
                ops, lt0, lb, ub, mf, name=name, mode=mode, d_max=d_max,
                n=self.n, use_pallas=use_pl)
            for i, (l, k, sp) in enumerate(es):
                results[(l, k)] = (lt[i], scale[i], ok[i], lt0[i])

        new_params = []
        for l in range(self.n_layer):
            layer_p = []
            for k, sp in enumerate(self.spec[l]):
                if sp.kind != 'gp':
                    layer_p.append(None)
                    continue
                p = params[l][k]
                lt, scale, ok, lt0 = results[(l, k)]
                scale = jnp.asarray(scale, p['scale'].dtype)
                lt = jnp.where(ok, lt, lt0)
                scale = jnp.where(ok & jnp.asarray(sp.scale_est), scale, p['scale'])
                if sp.nugget_est:
                    layer_p.append({'length': jnp.exp(lt[:sp.n_length]),
                                    'nugget': jnp.exp(lt[sp.n_length]),
                                    'scale': scale})
                else:
                    layer_p.append({'length': jnp.exp(lt[:sp.n_length]),
                                    'nugget': p['nugget'], 'scale': scale})
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
        out = []
        for l in range(1, self.n_layer):
            for k, sp in enumerate(self.spec[l]):
                if sp.kind != 'gp' or sp.connect is None:
                    continue
                G = self.X[:, list(sp.connect)]
                G1 = jnp.concatenate([G, jnp.ones((G.shape[0], 1), self.dtype)], axis=1)
                In = latents[l - 1][:, list(sp.input_dim)]
                # least squares via ridge-regularised normal equations,
                # solved with Cholesky: gtg is SPD, and TPU lowers neither
                # lstsq's QR/SVD nor f64 LuDecomposition
                gtg = G1.T @ G1
                eps = 1e-8 * jnp.trace(gtg) / gtg.shape[0]
                A = gtg + eps * jnp.eye(gtg.shape[0], dtype=self.dtype)
                chol = jnp.linalg.cholesky(A)
                beta = jax.scipy.linalg.cho_solve((chol, True), G1.T @ In)
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

    def _any_vecch(self):
        return any(sp.kind == 'gp' and sp.vecch
                   for layer in self.spec for sp in layer)

    def sample(self, state, key, burnin=0):
        nn_state = self.get_nn_state() if self._any_vecch() else self._empty_nn()

        def build():
            @partial(jax.jit, static_argnums=(3,))
            def f(state, nn_state, key, burnin):
                latents, params = state
                cs = self._chunk_static(nn_state)
                latents = self._i_step(latents, params, nn_state, key, burnin,
                                       cs)
                return latents, params
            return f

        return self._get_jitted('sample', build)(state, nn_state, key, burnin)

    def _empty_nn(self):
        return tuple(tuple(None for _ in layer) for layer in self.spec)

    def train_chunk(self, state, key, n_iters, ess_burn, nn_state=None):
        """Run n_iters full SEM iterations on device.  ``nn_state`` may carry
        a device-refreshed NN structure (see refresh_nn); by default it is
        read from the node objects."""
        if nn_state is None:
            nn_state = self.get_nn_state() if self._any_vecch() else self._empty_nn()

        def build():
            @partial(jax.jit, static_argnums=(3, 4))
            def f(state, nn_state, key, n_iters, ess_burn):
                # chunk-invariant NN gathers, hoisted out of the scan (the
                # scan body would re-run them per iteration as slow loop
                # fusions -- see _chunk_static)
                cs = self._chunk_static(nn_state)

                def body(carry, k):
                    latents, params = carry
                    k1, _ = jax.random.split(k)
                    latents = self._i_step(latents, params, nn_state, k1,
                                           ess_burn, cs)
                    r2 = self._r2_vector(latents)
                    params = self._m_step(latents, params, nn_state, cs)
                    return (latents, params), (self._para_vector(params), r2)

                keys = jax.random.split(key, n_iters)
                (latents, params), (para, r2) = jax.lax.scan(body, state, keys)
                return (latents, params), para, r2
            return f

        return self._get_jitted('train', build)(state, nn_state, key,
                                                n_iters, ess_burn)
