"""DGP emulator: multi-imputation predictions from a trained DGP.

API mirror of reference `dgpsi/emulation.py`: the constructor draws N
imputations of the latent layers and stores them; `predict` propagates
mean/variance layer-by-layer through each imputation (layer 0 plain GP
prediction, middle layers linked-GP moments, final layer closed-form
likelihood moments) and aggregates as a Gaussian mixture.
"""
import copy
from contextlib import contextmanager

import numpy as np

from .. import config
from .imputation import imputer


class emulator:
    """Predictor for a trained DGP (emulation.py:14)."""

    def __init__(self, all_layer, N=10, block=True):
        self.all_layer = all_layer
        self.n_layer = len(all_layer)
        self.vecch = bool(self.all_layer[0][0].vecch)
        self.block = block
        self.imp = imputer(self.all_layer, block)
        if self.vecch:
            self.imp.update_ord_nn()
            self.imp.sample(burnin=20)
        else:
            self.imp.sample(burnin=50)
        self.all_layer_set = []
        for _ in range(N):
            if self.vecch:
                self.imp.update_ord_nn()
            self.imp.sample()
            if not self.vecch:
                self.imp.key_stats()
            self.all_layer_set.append(copy.deepcopy(self.all_layer))

    # ------------------------------------------------------------------
    def to_vecchia(self):
        if self.vecch:
            raise Exception('The DGP emulator is already in Vecchia mode.')
        self.vecch = True
        for one in self.all_layer_set:
            for layer in one:
                for node in layer:
                    if node.type == 'gp':
                        node.vecch = True

    def remove_vecchia(self):
        if not self.vecch:
            raise Exception('The DGP emulator is already in non-Vecchia mode.')
        self.vecch = False
        for one in self.all_layer_set:
            for layer in one:
                for node in layer:
                    if node.type == 'gp':
                        node.vecch = False
                        node.compute_stats()

    @contextmanager
    def change_vecch_state(self):
        """Temporarily force Vecchia + self-excluding NN for LOO
        (emulation.py:90)."""
        for one in self.all_layer_set:
            for layer in one:
                for node in layer:
                    if node.type == 'gp':
                        if not self.vecch:
                            node.vecch = True
                        node.loo_state = True
        yield
        for one in self.all_layer_set:
            for layer in one:
                for node in layer:
                    if node.type == 'gp':
                        if not self.vecch:
                            node.vecch = False
                        node.loo_state = False

    def loo(self, X, method=None, sample_size=50, m=30):
        """Leave-one-out via self-excluding nearest-neighbour prediction
        (emulation.py:109)."""
        if method is None:
            method = 'mean_var'
        isrep = len(X) != len(self.all_layer[0][0].input)
        if isrep:
            X, indices = np.unique(X, return_inverse=True, axis=0)
        m_pred = m + 1 if self.vecch else X.shape[0]
        with self.change_vecch_state():
            final_res = self.predict(X, method=method, sample_size=sample_size, m=m_pred)
        if isrep:
            final_res = type(final_res)(item[indices, :] for item in final_res)
        return final_res

    def ploo(self, X, method=None, sample_size=50, m=30, core_num=None):
        return self.loo(X, method=method, sample_size=sample_size, m=m)

    # ------------------------------------------------------------------
    def predict(self, x, method='mean_var', full_layer=False, sample_size=50,
                m=50, aggregation=True, sharded=False):
        """Predict through the imputation ensemble (emulation.py:631)."""
        if x.ndim == 1:
            raise Exception('The testing input has to be a numpy 2d-array')
        x = np.asarray(x, np.dtype(config.default_dtype()))
        final = self.all_layer[-1]
        is_cat = final[0].name == 'Categorical'
        n_class = final[0].num_classes if is_cat else None
        M = len(x)
        if method == 'mean_var':
            sample_size = 1
        mean_pred, variance_pred = [], []
        likelihood_mean, likelihood_variance = [], []
        comp = self._compiled_propagation(x, m, sharded)
        for i, one_imputed in enumerate(self.all_layer_set):
            if comp is not None:
                ens_means, ens_vars = comp
                layer_means = [ens_means[l][i] for l in range(self.n_layer - 1)]
                layer_vars = [ens_vars[l][i] for l in range(self.n_layer - 1)]
            else:
                layer_means, layer_vars = self._propagate_generic(
                    one_imputed, x, m, upto=self.n_layer - 1, sharded=sharded)
            in_mean, in_var = layer_means[-1], layer_vars[-1]
            # final layer: must come from THIS imputation's copy
            final_imp = one_imputed[-1]
            if is_cat:
                ncol = 1 if n_class == 2 else n_class
                lik_mean = np.empty((M, ncol))
                lik_var = np.empty((M, ncol))
            else:
                lik_mean = np.empty((M, len(final_imp)))
                lik_var = np.empty((M, len(final_imp)))
            for k, node in enumerate(final_imp):
                if node.type == 'gp':
                    if comp is not None:
                        last_m, last_v = ens_means[-1], ens_vars[-1]
                        if isinstance(last_m, dict):
                            lik_mean[:, k] = last_m[k][i]
                            lik_var[:, k] = last_v[k][i]
                        else:
                            lik_mean[:, k] = last_m[i][:, k]
                            lik_var[:, k] = last_v[i][:, k]
                        continue
                    node.pred_m = m
                    z_in = x[:, node.connect] if node.connect is not None else None
                    mk, vk = node.linkgp_prediction(
                        m=in_mean[:, node.input_dim], v=in_var[:, node.input_dim],
                        z=z_in, sharded=sharded)
                    lik_mean[:, k], lik_var[:, k] = mk, vk
                else:
                    m_in = in_mean[:, node.input_dim]
                    v_in = in_var[:, node.input_dim]
                    if is_cat:
                        lik_mean[:, :], lik_var[:, :] = m_in, v_in
                    else:
                        mk, vk = node.prediction(m=m_in, v=v_in)
                        lik_mean[:, k], lik_var[:, k] = mk, vk
            for _ in range(sample_size):
                if full_layer:
                    mean_pred.append(layer_means)
                    variance_pred.append(layer_vars)
                else:
                    mean_pred.append(in_mean)
                    variance_pred.append(in_var)
                likelihood_mean.append(lik_mean)
                likelihood_variance.append(lik_var)

        if method == 'sampling':
            return self._sampling_output(mean_pred, variance_pred, likelihood_mean,
                                         likelihood_variance, full_layer, is_cat)
        # mean_var
        if full_layer:
            mu_layer = [list(t) for t in zip(*mean_pred)]
            var_layer = [list(t) for t in zip(*variance_pred)]
            mu = [np.mean(ml, axis=0) for ml in mu_layer]
            mu2 = [np.mean(np.square(ml), axis=0) for ml in mu_layer]
            vm = [np.mean(vl, axis=0) for vl in var_layer]
            sigma2 = [i + j - k**2 for i, j, k in zip(mu2, vm, mu)]
            if is_cat:
                agg_mean = np.mean(likelihood_mean, axis=0)
                agg_var = (np.mean(np.square(likelihood_mean) + likelihood_variance, axis=0)
                           - agg_mean**2)
                m_agg, v_agg = final[0].prediction(m=agg_mean, v=agg_var)
                mu.append(m_agg)
                sigma2.append(v_agg)
            else:
                mu.append(np.mean(likelihood_mean, axis=0))
                sigma2.append(np.mean(np.square(likelihood_mean) + likelihood_variance, axis=0)
                              - np.mean(likelihood_mean, axis=0)**2)
            return mu, sigma2
        if aggregation:
            if is_cat:
                agg_mean = np.mean(likelihood_mean, axis=0)
                agg_var = (np.mean(np.square(likelihood_mean) + likelihood_variance, axis=0)
                           - agg_mean**2)
                mu, sigma2 = final[0].prediction(agg_mean, agg_var)
                return np.asarray(mu).reshape(M, -1), np.asarray(sigma2).reshape(M, -1)
            mu = np.mean(likelihood_mean, axis=0)
            sigma2 = (np.mean(np.square(likelihood_mean) + likelihood_variance, axis=0)
                      - mu**2)
            return mu, sigma2
        if is_cat:
            mu, sigma2 = [list(t) for t in zip(*(final[0].prediction(a, b)
                          for a, b in zip(likelihood_mean, likelihood_variance)))]
            return mu, sigma2
        return likelihood_mean, likelihood_variance

    def _compiled_propagation(self, x, m, sharded):
        """Propagate the whole ensemble in one device program per query chunk
        (models/ensemble.py); returns None when the structure needs the
        per-imputation host loop."""
        from . import ensemble as ens_mod

        if ens_mod.supported(self.all_layer_set) is not None:
            return None
        loo = any(getattr(node, 'loo_state', False)
                  for layer in self.all_layer_set[0] for node in layer
                  if node.type == 'gp')
        vecch_sig = tuple(bool(node.vecch)
                          for layer in self.all_layer_set[0] for node in layer
                          if node.type == 'gp')
        cache = getattr(self, '_ens_cache', None)
        if cache is None or cache[0] != vecch_sig:
            cache = (vecch_sig, ens_mod.CompiledEnsemble(self.all_layer_set))
            self._ens_cache = cache
        return cache[1].propagate(x, m, loo=loo, sharded=sharded)

    def _sampling_output(self, mean_pred, variance_pred, likelihood_mean,
                         likelihood_variance, full_layer, is_cat):
        final = self.all_layer[-1]
        if full_layer:
            mu_layer = [list(t) for t in zip(*mean_pred)]
            var_layer = [list(t) for t in zip(*variance_pred)]
            samples = []
            samples_before_lik = None
            n_hidden = len(mu_layer)
            for l in range(n_hidden):
                layerwise = [np.random.normal(mu, np.sqrt(s2))
                             for mu, s2 in zip(mu_layer[l], var_layer[l])]
                if l == n_hidden - 1:
                    samples_before_lik = layerwise
                samples.append(list(np.asarray(layerwise).transpose(2, 1, 0)))
            lik_layer = []
            for mu_l, s2_l, dgp_sample in zip(likelihood_mean, likelihood_variance,
                                              samples_before_lik):
                realisation = np.empty_like(mu_l)
                for count, node in enumerate(final):
                    if node.type == 'gp':
                        realisation[:, count] = np.random.normal(
                            mu_l[:, count], np.sqrt(s2_l[:, count]))
                    else:
                        if is_cat:
                            realisation[:, :] = node.sampling(dgp_sample[:, node.input_dim])
                        else:
                            realisation[:, count] = node.sampling(dgp_sample[:, node.input_dim])
                lik_layer.append(realisation)
            samples.append(list(np.asarray(lik_layer).transpose(2, 1, 0)))
            return samples
        samples = []
        for mu_d, s2_d, mu_l, s2_l in zip(mean_pred, variance_pred,
                                          likelihood_mean, likelihood_variance):
            realisation = np.empty_like(mu_l)
            for count, node in enumerate(final):
                if node.type == 'gp':
                    realisation[:, count] = np.random.normal(mu_l[:, count],
                                                             np.sqrt(s2_l[:, count]))
                else:
                    dgp_sample = np.random.normal(mu_d, np.sqrt(s2_d))
                    if is_cat:
                        realisation[:, :] = node.sampling(dgp_sample[:, node.input_dim])
                    else:
                        realisation[:, count] = node.sampling(dgp_sample[:, node.input_dim])
            samples.append(realisation)
        return list(np.asarray(samples).transpose(2, 1, 0))

    def ppredict(self, x, method='mean_var', full_layer=False, sample_size=50,
                 m=50, chunk_num=None, core_num=None):
        """Parallel prediction: every per-layer prediction program runs with
        the test rows sharded across the device mesh (GSPMD data parallelism,
        replacing the reference's process-pool chunking, emulation.py:578)."""
        return self.predict(x, method=method, full_layer=full_layer,
                            sample_size=sample_size, m=m, sharded=True)

    # ------------------------------------------------------------------
    def nllik(self, x, y, m=50):
        """Negative predicted log-likelihood via Gauss-Hermite quadrature
        (emulation.py:856, functions.ghdiag)."""
        if len(self.all_layer[-1]) != 1 or self.all_layer[-1][0].type != 'likelihood':
            raise Exception('The method needs a single likelihood node in the final layer.')
        X0, indices = np.unique(x, return_inverse=True, axis=0)
        if len(X0) != len(x):
            x = X0
        predicted_lik = []
        for one_imputed in self.all_layer_set:
            means, variances = self._propagate_generic(
                one_imputed, np.asarray(x, np.dtype(config.default_dtype())), m,
                upto=self.n_layer - 1)
            in_mean, in_var = means[-1], variances[-1]
            predicted_lik.append(_ghdiag(one_imputed[-1][0].pllik,
                                         in_mean[indices, :], in_var[indices, :], y))
        nll = -np.log(np.mean(predicted_lik, axis=0)).flatten()
        return np.mean(nll), nll

    # ------------------------------------------------------------------
    def metric(self, x_cand, method='ALM', obj=None, nugget_s=1., m=50,
               score_only=False):
        """Sequential-design criteria over the ensemble (emulation.py:323)."""
        if x_cand.ndim == 1:
            raise Exception('The candidate design set has to be a numpy 2d-array.')
        x_cand = np.asarray(x_cand, np.dtype(config.default_dtype()))
        islik = self.all_layer[-1][0].type == 'likelihood'
        if method == 'ALM':
            if islik:
                _, sigma2 = self.predict(x=x_cand, full_layer=True, m=m)
                sigma2 = sigma2[-2]
            else:
                _, sigma2 = self.predict(x=x_cand, m=m)
            if score_only:
                return sigma2
            idx = np.argmax(sigma2, axis=0)
            return idx, sigma2[idx, np.arange(sigma2.shape[1])]
        elif method == 'MICE':
            from ..design import mice_var
            S = len(self.all_layer_set)
            if islik and self.n_layer == 2:
                sigma2 = self._predict_mice_2layer(x_cand, m)
                last_layer = self.all_layer[0]
                sigma2_s = np.column_stack([
                    mice_var(x_cand, x_cand, nd.input_dim, nd.connect, nd.name,
                             nd.length, nd.scale, nd.nugget[0], nugget_s).flatten()
                    for nd in last_layer])
                avg_mice = sigma2 / sigma2_s
            else:
                pred_inputs, sigma2s = self._predict_mice(x_cand, islik, m)
                D = len(self.all_layer[-2]) if islik else len(self.all_layer[-1])
                mice = np.zeros((len(x_cand), D))
                for i in range(S):
                    last_layer = (self.all_layer_set[i][-2] if islik
                                  else self.all_layer_set[i][-1])
                    s_i = np.column_stack([
                        mice_var(pred_inputs[i], x_cand, nd.input_dim, nd.connect,
                                 nd.name, nd.length, nd.scale, nd.nugget[0],
                                 nugget_s).flatten()
                        for nd in last_layer])
                    with np.errstate(divide='ignore'):
                        mice += np.log(sigma2s[i] / s_i)
                avg_mice = mice / S
            if score_only:
                return avg_mice
            idx = np.argmax(avg_mice, axis=0)
            return idx, avg_mice[idx, np.arange(avg_mice.shape[1])]
        elif method == 'VIGF':
            if obj is None:
                raise Exception('Supply the dgp object via `obj` for VIGF.')
            if not islik and obj.indices is not None:
                raise Exception('VIGF not applicable with replicates and no likelihood.')
            X = obj.X
            Dist = np.sum((x_cand[:, None, :] - X[None, :, :]) ** 2, axis=-1)
            index = np.argmin(Dist, axis=1)
            bias, sigma2 = self._predict_vigf(x_cand, index, islik, m)
            from .. import hostio
            bias, sigma2 = hostio.fetch((bias, sigma2))
            bias, sigma2 = np.asarray(bias), np.asarray(sigma2)
            E1 = np.mean(np.square(bias) + 6 * bias * sigma2 + 3 * np.square(sigma2), axis=0)
            E2 = np.mean(bias + sigma2, axis=0)
            vigf = E1 - E2**2
            if score_only:
                return vigf
            idx = np.argmax(vigf, axis=0)
            return idx, vigf[idx, np.arange(vigf.shape[1])]
        raise ValueError(f"unknown method: {method}")

    def pmetric(self, x_cand, method='ALM', obj=None, nugget_s=1., m=50,
                score_only=False, chunk_num=None, core_num=None):
        return self.metric(x_cand, method=method, obj=obj, nugget_s=nugget_s,
                           m=m, score_only=score_only)

    def _predict_mice_2layer(self, x_cand, m):
        layer = self.all_layer[0]
        var_pred = np.empty((len(x_cand), len(layer)))
        for k, node in enumerate(layer):
            node.pred_m = m
            z_in = x_cand[:, node.connect] if node.connect is not None else None
            _, vk = node.gp_prediction(x=x_cand[:, node.input_dim], z=z_in)
            var_pred[:, k] = vk
        return var_pred

    def _predict_mice(self, x_cand, islik, m):
        pred_inputs, var_preds = [], []
        upto = self.n_layer - 1 if islik else self.n_layer
        for one_imputed in self.all_layer_set:
            means, variances = self._propagate_generic(one_imputed, x_cand, m, upto)
            pred_inputs.append(means[-2])
            var_preds.append(variances[-1])
        return pred_inputs, var_preds

    def _predict_vigf(self, x_cand, index, islik, m):
        bias_set, var_set = [], []
        upto = self.n_layer - 1 if islik else self.n_layer
        for one_imputed in self.all_layer_set:
            means, variances = self._propagate_generic(one_imputed, x_cand, m, upto)
            out_mean, out_var = means[-1], variances[-1]
            last_layer = one_imputed[upto - 1]
            bias = np.empty_like(out_mean)
            for k, node in enumerate(last_layer):
                bias[:, k] = (out_mean[:, k] - node.output[index, :].flatten()) ** 2
            bias_set.append(bias)
            var_set.append(out_var)
        return bias_set, var_set

    def _propagate_generic(self, one_imputed, x, m, upto, sharded=False):
        """Propagate through GP layers 0..upto-1, collecting per-layer outputs."""
        means, variances = [], []
        in_mean = in_var = None
        for l in range(upto):
            layer = one_imputed[l]
            out_mean = np.empty((len(x), len(layer)))
            out_var = np.empty((len(x), len(layer)))
            for k, node in enumerate(layer):
                node.pred_m = m
                z_in = x[:, node.connect] if node.connect is not None else None
                if l == 0:
                    mk, vk = node.gp_prediction(x=x[:, node.input_dim], z=z_in,
                                                sharded=sharded)
                else:
                    mk, vk = node.linkgp_prediction(m=in_mean[:, node.input_dim],
                                                    v=in_var[:, node.input_dim],
                                                    z=z_in, sharded=sharded)
                out_mean[:, k], out_var[:, k] = mk, vk
            in_mean, in_var = out_mean, out_var
            means.append(out_mean)
            variances.append(out_var)
        return means, variances


def _ghdiag(fct, mu, var, y, n_points=10):
    """Diagonal Gauss-Hermite expectation of a predicted likelihood:
    E_{f ~ N(mu, diag(var))}[ exp(pllik(y, f)) ]  (same quadrature as
    reference functions.py:233-241, re-derived).

    Substituting f_d = mu_d + sqrt(2 var_d) t_d turns each latent dimension
    into a standard Gauss-Hermite integral, so with the tensor-product rule
    E = pi^{-N/2} * sum_k (prod_d w_{k_d}) * exp(pllik(y, f_k)).  The sum is
    evaluated in log space (log-sum-exp) for stability at extreme log-liks.
    """
    from scipy.special import logsumexp

    t, w = np.polynomial.hermite.hermgauss(n_points)
    N = mu.shape[1]
    t_grid = np.meshgrid(*([t] * N), indexing='ij')
    tn = np.stack([g.ravel() for g in t_grid], axis=-1)          # (K, N)
    w_grid = np.meshgrid(*([w] * N), indexing='ij')
    log_wn = np.sum(np.log(np.stack([g.ravel() for g in w_grid], axis=-1)),
                    axis=1)                                      # (K,)
    f = mu[:, None, :] + np.sqrt(2.0 * var[:, None, :]) * tn[None]  # (M, K, N)
    from .. import hostio
    ll = hostio.fetch_np(fct(y[:, None], f))
    ll = ll.reshape(ll.shape[0], ll.shape[1])
    return np.exp(logsumexp(ll + log_wn[None, :], axis=1) - 0.5 * N * np.log(np.pi))
