"""Device-mesh parallelism helpers.

The reference's only parallelism is embarrassingly-parallel chunking over
process pools (gp.ppredict, emulator.ppredict, lgp.ppredict, dgp.ptrain,
utils.multistart -- SURVEY.md section 2.3).  On TPU the same structure maps to
data-parallel sharding over a 1-D `jax.sharding.Mesh`: chunks of the test set
(or ensemble members, or optimisation starts) live on different devices and
results are gathered once at the end.  No collectives are needed in any inner
loop.
"""
import numpy as np
import jax


def device_mesh(n_devices=None, axis_name="chunk"):
    """A 1-D mesh over the available devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.sharding.Mesh(np.array(devs), (axis_name,))


def sharded_chunk_map(fn, x, chunk_num=None, method="mean_var"):
    """Apply ``fn`` to row-chunks of ``x`` and concatenate results.

    ``fn`` already dispatches jitted device computation per chunk; chunks are
    placed round-robin by the runtime.  This preserves the reference
    ``ppredict`` API (chunk_num) while letting XLA handle placement.  For a
    single-device session it degrades gracefully to serial chunking.
    """
    n_dev = max(1, len(jax.devices()))
    if chunk_num is None:
        chunk_num = n_dev
    chunk_num = max(1, min(chunk_num, len(x)))
    chunks = np.array_split(np.asarray(x), chunk_num)
    res = [fn(c) for c in chunks]
    if method == "mean_var":
        return tuple(np.concatenate(parts) for parts in zip(*res))
    elif method == "sampling":
        return np.concatenate(res)
    return res
