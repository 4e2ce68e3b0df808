"""Imputer facade (API mirror of `dgpsi/imputation.py`).

Sampling runs through the compiled ESS-within-Gibbs engine
(models/compiled.CompiledDGP) and writes results back into the object graph,
so downstream code sees exactly the mutations the reference performs.
"""
import numpy as np

from .. import rng
from .compiled import CompiledDGP


class imputer:
    def __init__(self, all_layer, block=True):
        self.all_layer = all_layer
        self.block = block
        self._compiled = None

    def _engine(self):
        if self._compiled is None:
            self._compiled = CompiledDGP(self.all_layer, self.block)
        return self._compiled

    def invalidate(self):
        """Drop the compiled engine (call after structural/data changes)."""
        self._compiled = None

    def sample(self, burnin=0):
        """(burnin+1) ESS-within-Gibbs sweeps over all hidden layers."""
        c = self._engine()
        state = c.get_state()
        state = c.sample(state, rng.next_key(), int(burnin))
        c.set_state(state)

    def key_stats(self):
        """Cache per-node prediction statistics (imputation.key_stats)."""
        for layer in self.all_layer:
            for node in layer:
                if node.type == 'gp':
                    node.compute_stats()

    def update_ord_nn(self):
        """Refresh Vecchia orderings/neighbours for all GP nodes
        (imputation.update_ord_nn), reusing the structure across nodes with
        identical wiring."""
        for layer in self.all_layer:
            for k, node in enumerate(layer):
                if node.type != 'gp':
                    continue
                compute_pointer = getattr(node, 'imp_pointer', False) or \
                    (getattr(node, 'imp_NNarray', None) is not None)
                found = None
                for j in range(k):
                    other = layer[j]
                    if other.type != 'gp':
                        continue
                    same_wiring = (np.array_equal(node.input_dim, other.input_dim)
                                   and np.array_equal(node.connect, other.connect))
                    if same_wiring and (
                        (len(node.length) == 1 and len(other.length) == 1)
                        or np.array_equal(node.length, other.length)
                    ):
                        found = other
                        break
                if found is not None:
                    node.ord_nn(ord=found.ord.copy(), NNarray=found.NNarray.copy(),
                                pointer=compute_pointer)
                else:
                    node.ord_nn(pointer=compute_pointer)
