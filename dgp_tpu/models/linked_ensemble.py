"""Device-resident linked-system (lgp) prediction.

The reference's `lgp.predict` loops N imputations x system layers x
emulators on the host (`dgpsi/linkgp.py:285-495`), dispatching one
prediction kernel per (imputation, emulator) pair.  Here the N
imputations of every DGP container are stacked on a leading device axis
(GP containers are imputation-independent and broadcast), and the WHOLE
system pass -- every emulator of every layer, for all imputations -- runs
as one jitted program per query chunk, mirroring models/ensemble.py's
design for the single-emulator case (SURVEY section 2.3: multi-imputation
ensembles map to a leading vmapped axis).

Per-emulator semantics replicate `lgp._predict_one` / `lgp.dgp_pred`
(models/linkgp.py), including the partially-stochastic global-input
routing through `linkgp_prediction_full` (reference kernel_class.py:672):
stochastic global dims fold into the Gaussian block with the training
columns re-ordered accordingly.
"""
import numpy as np
import jax
import jax.numpy as jnp

from .. import config, gp_core
from ..vecchia import core as vcore
from ..vecchia import nn as vnn

_CHUNK = 2048


def _container_nodes(cont):
    if cont.type == 'gp':
        return [cont.structure]
    return [nd for lay in cont.structure for nd in lay]


def supported(all_layer_set):
    """Return None when the compiled system pass covers this lgp, else a
    reason string (lgp.predict falls back to the host loop)."""
    set0 = all_layer_set[0]
    for layer in set0:
        for cont in layer:
            if cont.type not in ('gp', 'dgp'):
                return f'unknown container type {cont.type}'
            for nd in _container_nodes(cont):
                if nd.type != 'gp':
                    return 'likelihood node inside a linked container'
                if (nd.vecch and getattr(nd, 'nn_method', 'exact') != 'exact'
                        and nd.input.shape[0] > 4 * vnn._BLOCK):
                    return 'approximate NN inside a linked container'
            if (cont.type == 'dgp'
                    and any(n.connect is not None
                            for n in cont.structure[0])):
                # inner layer-0 connect wiring would need the container's
                # own external input routed into the layer-0 kernel; the
                # host path passes z=None there too, so such structures
                # keep the host loop
                return 'inner layer-0 global wiring'
    return None


def _node_spec(node, dt):
    w_diag = getattr(node, 'W_diag', None)
    n = node.output.shape[0]
    return dict(
        name=node.name, vecch=bool(node.vecch),
        input_dim=(None if getattr(node, 'input_dim', None) is None
                   else tuple(int(i) for i in np.atleast_1d(node.input_dim))),
        connect=(None if node.connect is None
                 else tuple(int(i) for i in np.atleast_1d(node.connect))),
        length=jnp.asarray(node.length, dt),
        scale=jnp.asarray(float(node.scale[0]), dt),
        nugget=jnp.asarray(float(node.nugget[0]), dt),
        w_diag=None if w_diag is None else jnp.asarray(w_diag, dt),
        nug_diag=(jnp.asarray(w_diag, dt) if w_diag is not None
                  else jnp.ones(n, dt)),
        X=jnp.asarray(node.input, dt),
        Z=(None if getattr(node, 'global_input', None) is None
           else jnp.asarray(node.global_input, dt)),
    )


class CompiledLGP:
    """One-program-per-chunk linked-system predictor."""

    def __init__(self, all_layer_set):
        self.set0 = all_layer_set[0]
        self.N = len(all_layer_set)
        self.L = len(self.set0)
        self.dtype = config.default_dtype()
        dt = self.dtype
        self.spec = []
        for l in range(self.L):
            lay = []
            for k, cont in enumerate(self.set0[l]):
                c = dict(type=cont.type,
                         local_input_idx=cont.local_input_idx)
                if cont.type == 'gp':
                    # GP containers are identical across imputations: one
                    # stored y, broadcast at trace time
                    nd = _node_spec(cont.structure, dt)
                    nd['y'] = jnp.asarray(cont.structure.output[:, 0], dt)
                    c['node'] = nd
                else:
                    # DGP container: stack each inner node's per-imputation
                    # latent outputs (N, n); params/wiring from set0
                    inner = []
                    for li, lay_i in enumerate(cont.structure):
                        row = []
                        for ki, node in enumerate(lay_i):
                            nd = _node_spec(node, dt)
                            ys = np.stack([
                                np.asarray(
                                    s[l][k].structure[li][ki].output[:, 0],
                                    dt)
                                for s in all_layer_set])
                            nd['y'] = jnp.asarray(ys)          # (N, n)
                            row.append(nd)
                        inner.append(row)
                    c['inner'] = inner
                    F = []
                    for li in range(len(cont.structure) - 1):
                        cols = [inner[li][ki]['y']
                                for ki in range(len(cont.structure[li]))]
                        F.append(jnp.stack(cols, axis=2))      # (N, n, w)
                    c['F'] = F
                    c['internal_idx'] = (
                        None if cont.structure[0][0].input_dim is None
                        else np.atleast_1d(cont.structure[0][0].input_dim))
                    c['external_idx'] = (
                        None if cont.structure[0][0].connect is None
                        else np.atleast_1d(cont.structure[0][0].connect))
                lay.append(c)
            self.spec.append(lay)
        # spec trees are captured as jit constants by the chunk programs;
        # make every device array ready before tracing can fetch it
        # (d2h on a pending array takes minutes over the axon tunnel --
        # vecchia/nn.py::_host)
        jax.block_until_ready(self.spec)
        self._progs = {}
        # memory bound: dense linked nodes build per-query (n, n) J-moment
        # tensors (same accounting as models/ensemble.py)
        itemsize = jnp.dtype(dt).itemsize
        per_q = 0
        for l in range(self.L):
            for c in self.spec[l]:
                if c['type'] == 'gp':
                    gauss_nodes = [c['node']] if l > 0 else []
                else:
                    gauss_nodes = [nd for li, row in enumerate(c['inner'])
                                   for nd in row if (li > 0 or l > 0)]
                for nd in gauss_nodes:
                    mult = self.N if c['type'] == 'dgp' else self.N
                    if nd['vecch']:
                        per_q += 4 * mult * 51 * 51 * itemsize
                    else:
                        n_tr = nd['X'].shape[0]
                        per_q += 3 * mult * n_tr * n_tr * itemsize
        self._bytes_per_query = per_q

    # ------------------------------------------------------------------
    # per-node prediction primitives (traced inside the chunk program)
    # ------------------------------------------------------------------
    @staticmethod
    def _train_W(nd):
        return (nd['X'] if nd['Z'] is None
                else jnp.concatenate([nd['X'], nd['Z']], axis=1))

    def _gp_det(self, nd, y, xq, m_pred, extra_jit):
        """GP prediction at deterministic inputs (kernel.gp_prediction)."""
        W = self._train_W(nd)
        if nd['vecch']:
            m_eff = min(m_pred, W.shape[0])
            NN = vnn._pred_nn_impl(xq / nd['length'], W / nd['length'], m_eff)
            return vcore.gp_vecch(xq, W, NN, y, nd['scale'], nd['length'],
                                  nd['nugget'], nd['nug_diag'], nd['name'],
                                  extra_jit)
        Rinv, Rinv_y = gp_core.compute_stats(
            W, y, nd['length'], nd['nugget'], name=nd['name'],
            w_diag=nd['w_diag'])
        mean, var = gp_core.gp_predict(xq, W, Rinv, Rinv_y, nd['scale'],
                                       nd['length'], nd['nugget'],
                                       name=nd['name'])
        return mean, jnp.abs(var)

    def _gp_gauss(self, nd, y, m_in, v_in, z_det, m_pred, extra_jit):
        """Linked-GP prediction under Gaussian inputs with an optional
        deterministic global block (kernel.linkgp_prediction)."""
        if nd['vecch']:
            W = self._train_W(nd)
            m_eff = min(m_pred, W.shape[0])
            xq = m_in if z_det is None else jnp.concatenate(
                [m_in, z_det], axis=1)
            full_len = jnp.broadcast_to(nd['length'], (W.shape[1],))
            NN = vnn._pred_nn_impl(xq / full_len, W / full_len, m_eff)
            mean, var = vcore.link_gp_vecch(
                m_in, v_in, z_det, nd['X'],
                nd['Z'] if z_det is not None else None,
                NN, y, nd['scale'], nd['length'], nd['nugget'],
                nd['nug_diag'], nd['name'], extra_jit)
            return mean, jnp.abs(var)
        W = self._train_W(nd)
        Rinv, Rinv_y = gp_core.compute_stats(
            W, y, nd['length'], nd['nugget'], name=nd['name'],
            w_diag=nd['w_diag'])
        mean, var = gp_core.linkgp_predict(
            m_in, v_in, z_det, nd['X'], nd['Z'], Rinv, Rinv_y, nd['scale'],
            nd['length'], nd['nugget'], name=nd['name'])
        return mean, jnp.abs(var)

    def _gp_gauss_full(self, nd, y, m_in, v_in, m_z, v_z, z_det):
        """Partially-stochastic global input (node.linkgp_prediction_full /
        reference kernel_class.py:672): the first m_z.shape[1] global
        columns fold into the Gaussian block.  Dense math regardless of
        vecch -- exactly like the object-graph path."""
        m_full = jnp.concatenate([m_in, m_z], axis=1)
        v_full = jnp.concatenate([v_in, v_z], axis=1)
        n_mz = m_z.shape[1]
        X_full = self._train_W(nd)
        Rinv, Rinv_y = gp_core.compute_stats(
            X_full, y, nd['length'], nd['nugget'], name=nd['name'],
            w_diag=nd['w_diag'])
        overall = jnp.concatenate([nd['X'], nd['Z'][:, :n_mz]], axis=1)
        mean, var = gp_core.linkgp_predict(
            m_full, v_full, z_det, overall,
            nd['Z'][:, n_mz:] if z_det is not None else None,
            Rinv, Rinv_y, nd['scale'], nd['length'], nd['nugget'],
            name=nd['name'])
        return mean, jnp.abs(var)

    # ------------------------------------------------------------------
    def _dgp_container(self, c, x_det, m_sys, v_sys, ext, m_pred, extra_jit):
        """One DGP container's inner layerwise pass (lgp.dgp_pred,
        models/linkgp.py:291) for all imputations.  Returns final-layer
        (N, M, width) moments."""
        inner = c['inner']
        L_in = len(inner)
        internal_idx = c['internal_idx']
        external_idx = c['external_idx']

        def per_imp(i):
            in_mean = in_var = None
            m_i = None if m_sys is None else m_sys[i]
            v_i = None if v_sys is None else v_sys[i]
            for li in range(L_in):
                cols_m, cols_v = [], []
                for ki, nd in enumerate(inner[li]):
                    y = nd['y'][i]
                    nd_i = nd
                    if li > 0:
                        # deeper inner layers train on THIS imputation's
                        # latents
                        nd_i = dict(nd)
                        nd_i['X'] = c['F'][li - 1][i][:, list(nd['input_dim'])]
                    if li == 0:
                        if x_det is not None:
                            mk, vk = self._gp_det(nd_i, y, x_det, m_pred,
                                                  extra_jit)
                        else:
                            mk, vk = self._gp_gauss(nd_i, y, m_i, v_i,
                                                    None, m_pred, extra_jit)
                    else:
                        m_in = in_mean[:, list(nd['input_dim'])]
                        v_in = in_var[:, list(nd['input_dim'])]
                        if nd['connect'] is None:
                            mk, vk = self._gp_gauss(nd_i, y, m_in, v_in,
                                                    None, m_pred, extra_jit)
                        elif x_det is not None:
                            z = x_det[:, list(nd['connect'])]
                            mk, vk = self._gp_gauss(nd_i, y, m_in, v_in, z,
                                                    m_pred, extra_jit)
                        else:
                            # connected global dims may themselves be
                            # stochastic (lgp.dgp_pred:327-348)
                            conn = np.asarray(nd['connect'])
                            if li == L_in - 1:
                                idx1 = (np.where(conn[:, None]
                                                 == internal_idx[None, :])[1]
                                        if internal_idx is not None
                                        else np.array([], int))
                                idx2 = (np.where(conn[:, None]
                                                 == external_idx[None, :])[1]
                                        if external_idx is not None
                                        else np.array([], int))
                            else:
                                D = m_i.shape[1]
                                idx1 = conn[conn <= D - 1]
                                idx2 = conn[conn > D - 1] - D
                            zed = (ext[:, list(idx2)]
                                   if (ext is not None and idx2.size)
                                   else None)
                            if idx1.size == 0:
                                mk, vk = self._gp_gauss(nd_i, y, m_in, v_in,
                                                        zed, m_pred,
                                                        extra_jit)
                            else:
                                mk, vk = self._gp_gauss_full(
                                    nd_i, y, m_in, v_in,
                                    m_i[:, list(idx1)], v_i[:, list(idx1)],
                                    zed)
                    cols_m.append(mk)
                    cols_v.append(vk)
                in_mean = jnp.stack(cols_m, axis=1)
                in_var = jnp.stack(cols_v, axis=1)
            return in_mean, in_var

        outs = [per_imp(i) for i in range(self.N)]
        return (jnp.stack([o[0] for o in outs]),
                jnp.stack([o[1] for o in outs]))

    # ------------------------------------------------------------------
    def _build(self, m_pred, x_sig):
        """Jitted system pass for one chunk; x_sig (which external inputs
        exist) pins the trace structure."""

        def prog(x0, exts, extra_jit):
            means, vars_ = [], []
            feed_m, feed_v = [], []   # per layer: (N, M, total_width)
            for l in range(self.L):
                lay_m, lay_v = [], []
                for k, c in enumerate(self.spec[l]):
                    if l == 0:
                        idx = list(np.atleast_1d(c['local_input_idx']))
                        xin = x0[:, idx]
                        if c['type'] == 'gp':
                            nd = c['node']
                            mk, vk = self._gp_det(nd, nd['y'], xin, m_pred,
                                                  extra_jit)
                            mk = jnp.broadcast_to(
                                mk[None, :, None], (self.N, mk.shape[0], 1))
                            vk = jnp.broadcast_to(
                                vk[None, :, None], (self.N, vk.shape[0], 1))
                        else:
                            mk, vk = self._dgp_container(
                                c, xin, None, None, None, m_pred, extra_jit)
                    else:
                        lii = self._norm_idx(c['local_input_idx'], l)
                        m_parts, v_parts = [], []
                        for i in range(l):
                            idx = lii[i]
                            if idx is not None:
                                cols = list(np.atleast_1d(idx))
                                m_parts.append(feed_m[i][:, :, cols])
                                v_parts.append(feed_v[i][:, :, cols])
                        m_in = jnp.concatenate(m_parts, axis=2)
                        v_in = jnp.concatenate(v_parts, axis=2)
                        ext = exts.get(f'{l}:{k}')
                        if c['type'] == 'gp':
                            nd = c['node']

                            def one(mi, vi, nd=nd, ext=ext):
                                return self._gp_gauss(
                                    nd, nd['y'], mi, vi,
                                    ext if nd['Z'] is not None else None,
                                    m_pred, extra_jit)

                            mk, vk = jax.vmap(one)(m_in, v_in)
                            mk, vk = mk[:, :, None], vk[:, :, None]
                        else:
                            mk, vk = self._dgp_container(
                                c, None, m_in, v_in, ext, m_pred, extra_jit)
                    lay_m.append(mk)
                    lay_v.append(vk)
                means.append(lay_m)
                vars_.append(lay_v)
                if l < self.L - 1:
                    feed_m.append(jnp.concatenate(lay_m, axis=2))
                    feed_v.append(jnp.concatenate(lay_v, axis=2))
            return means, vars_

        return jax.jit(prog)

    @staticmethod
    def _norm_idx(local_input_idx, l):
        if isinstance(local_input_idx, list):
            return local_input_idx
        out = [None] * (l - 1)
        out.append(local_input_idx)
        return out

    # ------------------------------------------------------------------
    def propagate(self, x, m_pred, sharded=False):
        """x: [x0] + [[ext or None]*num_models].  Returns (means, vars): per
        system layer a list over containers of (N, M, width) np arrays."""
        dt = self.dtype
        x0 = np.asarray(x[0], dt)
        M = x0.shape[0]
        exts = {}
        for l in range(1, self.L):
            for k in range(len(self.spec[l])):
                e = x[l][k]
                if e is not None:
                    exts[f'{l}:{k}'] = np.asarray(e, dt)
        x_sig = tuple(sorted(exts))
        Mc = _CHUNK
        if self._bytes_per_query:
            fit = max(int(1.5e9) // self._bytes_per_query, 1)
            while Mc > 32 and Mc > fit:
                Mc //= 2
        key = (m_pred, x_sig, Mc, sharded)
        if key not in self._progs:
            self._progs[key] = self._build(m_pred, x_sig)
        prog = self._progs[key]
        outs, args = [], []
        extra0 = jnp.asarray(0.0, dt)
        for s in range(0, M, Mc):
            sl = slice(s, min(s + Mc, M))
            pad = Mc - (sl.stop - sl.start)

            def prep(a):
                ac = a[sl]
                if pad:
                    ac = np.concatenate(
                        [ac, np.broadcast_to(a[-1:], (pad,) + a.shape[1:])])
                if sharded:
                    from ..parallel import mesh
                    (ad,), _ = mesh.shard_rows(jnp.asarray(ac))
                    return ad
                return jnp.asarray(ac)

            xc = prep(x0)
            ec = {kk: prep(v) for kk, v in exts.items()}
            args.append((xc, ec))
            outs.append(prog(xc, ec, extra0))
        outs = jax.device_get(jax.block_until_ready(outs))

        # host-level jitter escalation, same policy as ensemble.propagate
        def _ok(t):
            return all(np.isfinite(leaf).all() for leaf in jax.tree.leaves(t))

        for extra in (3e-4, 3e-3):
            bad = [i for i, o in enumerate(outs) if not _ok(o)]
            if not bad:
                break
            for i in bad:
                o2 = jax.device_get(jax.block_until_ready(
                    prog(args[i][0], args[i][1], jnp.asarray(extra, dt))))
                outs[i] = jax.tree.map(
                    lambda a, b: np.where(np.isfinite(a), a, b), outs[i], o2)

        means, vars_ = [], []
        for l in range(self.L):
            lm, lv = [], []
            for k in range(len(self.spec[l])):
                lm.append(np.concatenate(
                    [o[0][l][k] for o in outs], axis=1)[:, :M])
                lv.append(np.concatenate(
                    [o[1][l][k] for o in outs], axis=1)[:, :M])
            means.append(lm)
            vars_.append(lv)
        return means, vars_
