"""Prior path sampling from a DGP structure (reference `dgpsi/synthetic.py`)."""
import copy

import numpy as np
import jax.numpy as jnp

from .. import config
from ..ops import kernels as kops
from ..ops import linalg


class path:
    """Sample prior realisations of a DGP hierarchy layer-by-layer."""

    def __init__(self, X, all_layer):
        self.X = np.asarray(X, np.dtype(config.default_dtype()))
        self.n_layer = len(all_layer)
        self.all_layer = copy.deepcopy(all_layer)
        for layer in self.all_layer:
            for node in layer:
                if getattr(node, 'connect', None) is not None:
                    node.global_input = self.X[:, node.connect].copy()

    def generate(self, N):
        d = len(self.all_layer[-1])
        m = len(self.X)
        out_record = np.empty((N, m, d))
        for i in range(N):
            x = self.X
            for layer in self.all_layer:
                out = np.empty((m, len(layer)))
                for k, node in enumerate(layer):
                    In = x[:, node.input_dim] if node.input_dim is not None else x
                    if node.connect is not None:
                        In = np.concatenate((In, node.global_input), axis=1)
                    K = np.array(kops.k_matrix(jnp.asarray(In), jnp.asarray(node.length),
                                               0.0, node.name))
                    np.fill_diagonal(K, 1.0)
                    cov = float(node.scale[0]) * (K + float(node.nugget[0]) * np.eye(m))
                    L = np.asarray(linalg.safe_cholesky(jnp.asarray(cov)))
                    out[:, k] = (L @ np.random.normal(size=(m, 1))).flatten()
                x = out
            out_record[i] = x
        return out_record.transpose(2, 0, 1)
