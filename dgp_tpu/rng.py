"""Global RNG state.

The reference seeds NumPy's and Numba's global RNGs (`utils.nb_seed`).  Here
host-side sampling uses numpy's global RNG (so ``np.random.seed`` keeps
working) and device-side sampling threads `jax.random` keys drawn from a
module-level key that ``seed`` resets.
"""
import numpy as np
import jax

_key = jax.random.PRNGKey(np.random.SeedSequence().entropy % (2**63))


def seed(value):
    """Seed both host (numpy) and device (jax) RNG streams."""
    global _key
    np.random.seed(value)
    _key = jax.random.PRNGKey(value)


def next_key():
    global _key
    _key, sub = jax.random.split(_key)
    return sub
