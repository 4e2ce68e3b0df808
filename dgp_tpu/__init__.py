"""dgp_tpu — a TPU-native deep & linked Gaussian-process emulation framework.

A from-scratch JAX/XLA re-design with the capabilities of the `dgpsi`
reference library: GP emulators, deep GP emulators trained by stochastic
imputation (ESS-within-Gibbs + per-node marginal-likelihood maximisation),
linked (D)GP emulation of computer-model networks, non-Gaussian likelihood
layers, the Vecchia nearest-neighbour approximation, and sequential-design
criteria.

Public API parity with `dgpsi/__init__.py`:
    dgp, gp, emulator, kernel, combine, Poisson, Hetero, NegBin, Categorical,
    ZIP, ZINB, container, lgp, path, write, read, summary, nb_seed,
    set_thread, get_thread.
"""
from . import config  # noqa: F401  (enables x64)
from .config import set_default_dtype, default_dtype  # noqa: F401
from . import hostio as _hostio

_hostio.install_blocking_fetch()  # see hostio.py: d2h-on-pending pathology

from .models.node import kernel, combine  # noqa: F401
from .models.gp import gp  # noqa: F401
from .models.dgp import dgp  # noqa: F401
from .models.emulation import emulator  # noqa: F401
from .models.linkgp import container, lgp  # noqa: F401
from .models.synthetic import path  # noqa: F401
from .likelihoods import Poisson, Hetero, NegBin, Categorical, ZIP, ZINB  # noqa: F401
from .utils import write, read, summary, nb_seed, set_thread, get_thread  # noqa: F401
from .io_dgpsi import read_dgpsi  # noqa: F401

__version__ = "0.1.0"
