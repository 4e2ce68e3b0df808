"""Device-resident multi-imputation ensemble prediction.

The reference's emulator keeps N deep copies of the DGP object graph and
loops prediction over them on the host (`dgpsi/emulation.py:37-44, 631-701`),
re-running the per-node nearest-neighbour searches and kernel launches once
per imputation per call.  Here the N imputations' latent layers are stacked
on a leading device axis and the WHOLE ensemble propagation -- per-layer
prediction-NN search, Vecchia/dense GP and linked-GP moments, for every
imputation -- runs as one jitted program per query chunk (SURVEY section 2.3:
the multi-imputation ensemble maps to a leading vmapped axis).

Layer-0 inputs are shared across imputations (the global X), so its NN
search and dense cross-kernels are computed once; deeper layers vmap over
the imputation axis, including their per-imputation NN searches.  Final
likelihood moments and the Gaussian-mixture aggregation stay on the host
(closed forms on (N, M, Q) arrays; cost is negligible).

Queries are processed in fixed-size padded chunks: compile happens once,
peak memory stays bounded at chunk x (m+1)^2 blocks, and chunk dispatches
pipeline back-to-back on the device.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .. import config, gp_core
from ..vecchia import core as vcore
from ..vecchia import nn as vnn

_CHUNK = 2048


def supported(all_layer_set):
    """Return None if the compiled ensemble can predict this structure, else
    a reason string (callers fall back to the per-imputation host loop)."""
    set0 = all_layer_set[0]
    for l, layer in enumerate(set0):
        for node in layer:
            if node.type == 'likelihood':
                if l != len(set0) - 1:
                    return 'likelihood node in a hidden layer'
                continue
            if node.type != 'gp':
                return f'unknown node type {node.type}'
    return None


class CompiledEnsemble:
    """One-program-per-chunk ensemble predictor for a trained DGP."""

    def __init__(self, all_layer_set):
        self.set0 = all_layer_set[0]
        self.N = len(all_layer_set)
        self.n_layer = len(self.set0)
        self.dtype = config.default_dtype()
        dt = self.dtype
        # global input X (built like CompiledDGP._extract_data)
        d_global = 0
        for layer in self.set0:
            for node in layer:
                if getattr(node, 'connect', None) is not None:
                    d_global = max(d_global, int(np.max(node.connect)) + 1)
        for node in self.set0[0]:
            d_global = max(d_global, int(np.max(node.input_dim)) + 1)
        self.d_global = d_global
        n0 = self.set0[0][0].input.shape[0]
        Xg = np.zeros((n0, d_global), dt)
        for node in self.set0[0]:
            Xg[:, list(np.asarray(node.input_dim))] = node.input
        for layer in self.set0:
            for node in layer:
                if (getattr(node, 'connect', None) is not None
                        and getattr(node, 'global_input', None) is not None):
                    Xg[:, list(np.asarray(node.connect))] = node.global_input
        self._X_global = jnp.asarray(Xg)
        # stacked per-imputation node outputs: out[l][k] (N, n_l)
        self.y_stack = []
        self.spec = []
        for l in range(self.n_layer):
            lay_y, lay_spec = [], []
            for k, node in enumerate(self.set0[l]):
                if node.type != 'gp':
                    lay_y.append(None)
                    lay_spec.append(dict(kind='lik'))
                    continue
                ys = np.stack([np.asarray(s[l][k].output[:, 0], dt)
                               for s in all_layer_set])
                lay_y.append(jnp.asarray(ys))
                w_diag = getattr(node, 'W_diag', None)
                nd = dict(
                    kind='gp', name=node.name, vecch=bool(node.vecch),
                    nn_method=getattr(node, 'nn_method', 'exact'),
                    input_dim=tuple(int(i) for i in node.input_dim),
                    connect=(None if node.connect is None
                             else tuple(int(i) for i in node.connect)),
                    length=jnp.asarray(node.length, dt),
                    scale=jnp.asarray(float(node.scale[0]), dt),
                    nugget=jnp.asarray(float(node.nugget[0]), dt),
                    nug_diag=(jnp.asarray(w_diag, dt) if w_diag is not None
                              else jnp.ones(ys.shape[1], dt)),
                )
                lay_spec.append(nd)
            self.y_stack.append(lay_y)
            self.spec.append(lay_spec)
        # per-imputation layer-0.. inputs come from the stacked latents:
        # F[l] (N, n, width_l) = column-stacked gp-node outputs of layer l
        self.F = []
        for l in range(self.n_layer - 1):
            cols = [self.y_stack[l][k] for k in range(len(self.set0[l]))]
            self.F.append(jnp.stack(cols, axis=2))      # (N, n, width)
        self._progs = {}
        # Per-query live-buffer estimate for DENSE linked layers: each dense
        # gp node above layer 0 builds per-query (n, n) J-moment tensors for
        # all N imputations in flight ((Mc, n, n) batched per imputation).
        # Vecchia nodes only hold (m+1)^2 blocks per query and never
        # dominate.  propagate() divides a fixed memory budget by this to
        # bound the chunk size (the wine config -- 3 dense linked nodes,
        # n=142, N=50, f64 -- would otherwise allocate >100 GB at Mc=2048).
        itemsize = jnp.dtype(dt).itemsize
        per_q = 0
        for l in range(1, self.n_layer):
            for k, nd in enumerate(self.spec[l]):
                if nd['kind'] == 'gp' and not nd['vecch']:
                    n_tr = self.y_stack[l][k].shape[1]
                    per_q += 3 * self.N * n_tr * n_tr * itemsize
        self._dense_link_bytes_per_query = per_q
        self._itemsize = itemsize
        self._build_ivf()
        # all of the above device trees are captured as jit constants by
        # the chunk programs; lowering fetches constants to host, and a d2h
        # on a still-pending array takes minutes over the axon tunnel
        # (vecchia/nn.py::_host) -- make everything ready up front
        jax.block_until_ready((self._X_global, self.y_stack, self.F,
                               [[nd.get('ivf') for nd in lay]
                                for lay in self.spec]))

    def _build_ivf(self):
        """Device IVF indices for approximate-NN nodes (auto-IVF engages at
        large n, where the compiled ensemble matters most).  Layer 0's index
        is shared across imputations; deeper layers index each imputation's
        own latent inputs (vmapped k-means + inverted lists).  Queries then
        run cluster-restricted top-k INSIDE the chunk program -- same scheme
        as the host `_pred_nn_approx` (vecchia/nn.py:364) but with no host
        round-trips."""
        for l in range(self.n_layer):
            for k, nd in enumerate(self.spec[l]):
                if nd['kind'] != 'gp' or not nd['vecch']:
                    continue
                n_train = self.y_stack[l][k].shape[1]
                if nd['nn_method'] == 'exact' or n_train <= 4 * vnn._BLOCK:
                    nd['ivf'] = None
                    continue
                K, Lmax = vnn._ivf_params(n_train)
                W, shared = self._node_train_inputs(l, nd)
                full_len = jnp.broadcast_to(nd['length'], (W.shape[-1],))
                if shared:
                    cent, assign = vnn._kmeans_fit(W / full_len, K, 6)
                    nd['ivf'] = (cent, vnn._buckets_dev(assign, K, Lmax))
                else:
                    def build_one(Wi, full_len=full_len, K=K, Lmax=Lmax):
                        cent, assign = vnn._kmeans_fit(Wi / full_len, K, 6)
                        return cent, vnn._buckets_dev(assign, K, Lmax)

                    nd['ivf'] = jax.vmap(build_one)(W)

    def _bytes_per_query(self, m_pred):
        """Worst-case live bytes per query point in the chunk program: dense
        linked layers hold (n, n) J-moments per imputation; Vecchia layers
        hold (m+1, m+1) blocks (kernel block + factor + jitter-ladder copies
        + linked J/solve temps: ~8 such arrays live at the XLA peak)."""
        per_q = self._dense_link_bytes_per_query
        for l in range(self.n_layer):
            for k, nd in enumerate(self.spec[l]):
                if nd['kind'] == 'gp' and nd['vecch']:
                    m_eff = min(m_pred, self.y_stack[l][k].shape[1]) + 1
                    # ~4 live (m+1)^2 arrays per node at the XLA peak
                    # (calibrated against a measured 19.4G peak at
                    # m=200, N=10, Mc=2048)
                    per_q += 4 * self.N * m_eff * m_eff * self._itemsize
        return per_q

    # ------------------------------------------------------------------
    def _node_train_inputs(self, l, nd):
        """(train-input builder) returns (W (N?, n, d_full), shared) where
        shared=True means the inputs are imputation-independent (layer 0)."""
        if l == 0:
            Xn = self._X_global[:, list(nd['input_dim'])]
            if nd['connect'] is not None:
                Xn = jnp.concatenate(
                    [Xn, self._X_global[:, list(nd['connect'])]], axis=1)
            return Xn, True
        W = self.F[l - 1][:, :, list(nd['input_dim'])]
        if nd['connect'] is not None:
            Z = self._X_global[:, list(nd['connect'])]
            W = jnp.concatenate(
                [W, jnp.broadcast_to(Z[None], (self.N,) + Z.shape)], axis=2)
        return W, False

    # ------------------------------------------------------------------
    def _build(self, m_pred, loo, Mc):
        """Build the jitted chunk program: x (Mc, d_global) ->
        (means, vars): lists over layers of (N, Mc, width_l)."""
        specs = self.spec

        def nn_search(q, w, m_eff, ivf=None):
            # loo drops the nearest (self) neighbour, exactly like the
            # object-graph path (vecchia/api.py gp_prediction_vecch).
            # With an IVF index the search is cluster-restricted top-k
            # (host _pred_nn_approx semantics, in-program).
            if ivf is not None:
                nn = vnn._ivf_query(q, w, ivf[0], ivf[1], m_eff, 16, False)
                nn = jnp.where(nn >= 0, nn, 0)
            else:
                nn = vnn._pred_nn_impl(q, w, m_eff)
            return nn[:, 1:] if loo else nn

        def prog(x, extra_jit):
            in_mean = in_var = None
            means, vars_ = [], []
            for l in range(self.n_layer):
                cols_m, cols_v = [], []
                for k, nd in enumerate(specs[l]):
                    if nd['kind'] != 'gp':
                        cols_m.append(None)
                        cols_v.append(None)
                        continue
                    y = self.y_stack[l][k]               # (N, n)
                    n_train = y.shape[1]
                    m_eff = min(m_pred, n_train)
                    W, shared = self._node_train_inputs(l, nd)
                    z = (x[:, list(nd['connect'])]
                         if nd['connect'] is not None else None)
                    if l == 0:
                        xq = x[:, list(nd['input_dim'])]
                        if z is not None:
                            xq = jnp.concatenate([xq, z], axis=1)
                        if nd['vecch']:
                            NN = nn_search(xq / nd['length'],
                                           W / nd['length'], m_eff,
                                           nd.get('ivf'))
                            mk, vk = jax.vmap(
                                lambda yi: vcore.gp_vecch(
                                    xq, W, NN, yi, nd['scale'], nd['length'],
                                    nd['nugget'], nd['nug_diag'], nd['name'],
                                    extra_jit)
                            )(y)
                        else:
                            Rinv, _ = gp_core.compute_stats(
                                W, y[0], nd['length'], nd['nugget'],
                                name=nd['name'],
                                w_diag=None)
                            mk, vk = jax.vmap(
                                lambda yi: gp_core.gp_predict(
                                    xq, W, Rinv, Rinv @ yi, nd['scale'],
                                    nd['length'], nd['nugget'], name=nd['name'])
                            )(y)
                    else:
                        m_in = in_mean[:, :, list(nd['input_dim'])]
                        v_in = in_var[:, :, list(nd['input_dim'])]
                        if nd['vecch']:
                            dl = len(nd['input_dim'])
                            full_len = jnp.broadcast_to(
                                nd['length'], (W.shape[2],))

                            def per_imp(mi, vi, Wi, yi, ivfi=None, nd=nd,
                                        dl=dl, full_len=full_len,
                                        m_eff=m_eff):
                                xq = mi if z is None else \
                                    jnp.concatenate([mi, z], axis=1)
                                NN = nn_search(xq / full_len,
                                               Wi / full_len, m_eff, ivfi)
                                w1, gw1 = Wi[:, :dl], Wi[:, dl:]
                                return vcore.link_gp_vecch(
                                    mi, vi, z, w1,
                                    gw1 if z is not None else None,
                                    NN, yi, nd['scale'], nd['length'],
                                    nd['nugget'], nd['nug_diag'], nd['name'],
                                    extra_jit)

                            ivf = nd.get('ivf')
                            if ivf is not None:
                                mk, vk = jax.vmap(
                                    lambda mi, vi, Wi, yi, c, b:
                                        per_imp(mi, vi, Wi, yi, (c, b))
                                )(m_in, v_in, W, y, ivf[0], ivf[1])
                            else:
                                mk, vk = jax.vmap(per_imp)(m_in, v_in, W, y)
                        else:
                            dl = len(nd['input_dim'])

                            def per_imp_d(mi, vi, Wi, yi, nd=nd, dl=dl):
                                w1, gw1 = Wi[:, :dl], Wi[:, dl:]
                                Rinv, Rinv_y = gp_core.compute_stats(
                                    Wi, yi, nd['length'], nd['nugget'],
                                    name=nd['name'],
                                    w_diag=(nd['nug_diag'] if l == self.n_layer - 1
                                            else None))
                                return gp_core.linkgp_predict(
                                    mi, vi, z, w1,
                                    gw1 if z is not None else None,
                                    Rinv, Rinv_y, nd['scale'], nd['length'],
                                    nd['nugget'], name=nd['name'])

                            mk, vk = jax.vmap(per_imp_d)(m_in, v_in, W, y)
                    cols_m.append(mk)
                    cols_v.append(jnp.abs(vk))
                width = len(specs[l])
                if all(c is not None for c in cols_m):
                    out_mean = jnp.stack(cols_m, axis=2)
                    out_var = jnp.stack(cols_v, axis=2)
                else:
                    # final layer with likelihood nodes: emit only gp columns
                    out_mean = {k: c for k, c in enumerate(cols_m)
                                if c is not None}
                    out_var = {k: c for k, c in enumerate(cols_v)
                               if c is not None}
                means.append(out_mean)
                vars_.append(out_var)
                if l < self.n_layer - 1:
                    in_mean, in_var = means[l], vars_[l]
            return means, vars_

        return jax.jit(prog)

    # ------------------------------------------------------------------
    def propagate(self, x, m_pred, loo=False, sharded=False):
        """Run the ensemble through all layers.  Returns (means, vars):
        per layer either an (N, M, width) np array (all-GP layers) or a
        {node_idx: (N, M)} dict (final layer containing likelihood nodes)."""
        x = np.asarray(x, self.dtype)
        M = x.shape[0]
        # one fixed chunk size: a single compiled program serves every query
        # count; measured on a v5e-1 at the bench config (20k queries, N=5,
        # m=50), 2048 beats 4096/8192 (36.1k vs 33.2k/27.6k pts/s): less
        # padding waste and the chunk dispatches pipeline over the link.
        # Dense linked layers bound the chunk by memory instead (see
        # _dense_link_bytes_per_query); the value depends only on the model
        # structure, so there is still exactly one compiled program.
        Mc = _CHUNK
        per_q = self._bytes_per_query(m_pred)
        if per_q:
            budget = int(1.5e9)
            fit = budget // per_q
            while Mc > 32 and Mc > fit:
                Mc //= 2
        key = (m_pred, loo, Mc, sharded)
        if key not in self._progs:
            self._progs[key] = self._build(m_pred, loo, Mc)
        prog = self._progs[key]
        outs, xcs = [], []
        extra0 = jnp.asarray(0.0, self.dtype)
        for s in range(0, M, Mc):
            xc = x[s:s + Mc]
            if xc.shape[0] < Mc:
                xc = np.concatenate(
                    [xc, np.broadcast_to(x[-1:], (Mc - xc.shape[0], x.shape[1]))])
            if sharded:
                from ..parallel import mesh
                (xc_d,), _ = mesh.shard_rows(jnp.asarray(xc))
            else:
                xc_d = jnp.asarray(xc)
            xcs.append(xc_d)
            outs.append(prog(xc_d, extra0))
        outs = jax.device_get(outs)           # one pipelined transfer

        # host-level jitter escalation: an f32 prediction block larger than
        # the training m can factorise non-finite when the estimated nugget
        # sits at its floor.  Re-dispatch only failed chunks with a larger
        # traced diagonal (same compiled program) and keep healthy entries.
        def _ok(t):
            return all(np.isfinite(leaf).all() for leaf in jax.tree.leaves(t))

        for extra in (3e-4, 3e-3):
            bad_idx = [i for i, o in enumerate(outs) if not _ok(o)]
            if not bad_idx:
                break
            for i in bad_idx:
                o2 = jax.device_get(jax.block_until_ready(
                    prog(xcs[i], jnp.asarray(extra, self.dtype))))
                outs[i] = jax.tree.map(
                    lambda a, b: np.where(np.isfinite(a), a, b), outs[i], o2)

        def cat(parts):
            return np.concatenate(parts, axis=1)[:, :M]

        means, vars_ = [], []
        for l in range(self.n_layer):
            ml = [o[0][l] for o in outs]
            vl = [o[1][l] for o in outs]
            if isinstance(ml[0], dict):
                means.append({k: cat([p[k] for p in ml]) for k in ml[0]})
                vars_.append({k: cat([p[k] for p in vl]) for k in vl[0]})
            else:
                means.append(cat(ml))
                vars_.append(cat(vl))
        return means, vars_
