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


@pytest.mark.slow
def test_ptrain_sharded_matches_single_device():
    """Seeded equality: `ptrain` (latent rows sharded over the 8-device
    mesh via GSPMD) must produce the same hyper-parameter traces as plain
    `train` on one device -- partitioning changes placement, not the
    program (f64 CPU; tolerances absorb reduction-order drift)."""
    import numpy as np
    from dgp_tpu import rng
    from dgp_tpu.models.dgp import dgp
    from dgp_tpu.models.node import kernel, combine

    def build():
        np.random.seed(21)
        rng.seed(21)
        rs = np.random.RandomState(21)
        X = rs.rand(64, 1) * 2 - 1
        Y = np.sin(3 * X) + 0.05 * rs.randn(64, 1)
        return dgp(X, Y, combine(
            [kernel(length=np.array([0.5]), name='sexp', nugget=1e-4)],
            [kernel(length=np.array([0.5]), name='sexp', nugget=1e-4,
                    nugget_est=True, scale_est=True,
                    connect=np.arange(1))]), vecchia=True, m=6)

    m1 = build()
    m1.train(N=6, disable=True, chunk_size=3)
    m2 = build()
    # ptrain == train(sharded=True); pin chunk_size so both sides consume
    # the same per-chunk key sequence
    m2.train(N=6, disable=True, chunk_size=3, sharded=True)

    for l, (lay1, lay2) in enumerate(zip(m1.all_layer, m2.all_layer)):
        for nd1, nd2 in zip(lay1, lay2):
            if nd1.type != 'gp':
                continue
            np.testing.assert_allclose(
                nd1.para_path, nd2.para_path, rtol=1e-6, atol=1e-10,
                err_msg=f'para trace diverged at layer {l}')
            np.testing.assert_allclose(
                np.asarray(nd1.output), np.asarray(nd2.output),
                rtol=1e-6, atol=1e-10,
                err_msg=f'latents diverged at layer {l}')
