"""Multi-chip sharding contract tests on the 8-device virtual CPU mesh.

Mirrors the driver's `dryrun_multichip` check: the full Vecchia-DGP training
step and a sharded prediction must compile and execute over an 8-device
`jax.sharding.Mesh` (reference scope: SURVEY.md section 2.3 -- the reference's
process pools map to row/ensemble sharding, `dgpsi/gp.py:373-410`).
"""
import sys
import os

import numpy as np
import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8_devices():
    import __graft_entry__ as g

    assert len(jax.devices("cpu")) >= 8
    g.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    leaves = jax.tree_util.tree_leaves(out)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
