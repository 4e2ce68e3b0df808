"""dgp_tpu — a TPU-native deep & linked Gaussian-process emulation framework.

A from-scratch JAX/XLA re-design with the capabilities of the `dgpsi`
reference library: GP emulators, deep GP emulators trained by stochastic
imputation (ESS-within-Gibbs + per-node marginal-likelihood maximisation),
linked (D)GP emulation of computer-model networks, non-Gaussian likelihood
layers, the Vecchia nearest-neighbour approximation, and sequential-design
criteria.
"""
from . import config  # noqa: F401  (enables x64)
from .config import set_default_dtype, default_dtype  # noqa: F401

__version__ = "0.1.0"
