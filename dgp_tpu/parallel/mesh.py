"""Device-mesh parallelism helpers.

The reference's only parallelism is embarrassingly-parallel chunking over
process pools (gp.ppredict, emulator.ppredict, lgp.ppredict -- SURVEY.md
section 2.3).  On TPU the same structure is data-parallel sharding over a 1-D
`jax.sharding.Mesh`: the test rows are placed across devices with
`NamedSharding` and the (jitted) prediction program is partitioned by GSPMD,
which inserts the single final all-gather.  No collectives appear in any
inner loop.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_mesh(n_devices=None, axis_name="data"):
    """A 1-D mesh over the available devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def n_devices():
    return len(jax.devices())


def shard_rows(*arrays, mesh=None):
    """Row-shard arrays over all devices.

    Pads each array's leading axis to a multiple of the device count (edge
    mode, so padded rows are valid inputs) and `device_put`s it with a
    ('data', None, ...) `NamedSharding`.  Returns (sharded_arrays, n_orig);
    single-device sessions get the inputs back untouched.
    """
    n = arrays[0].shape[0]
    if mesh is None:
        mesh = device_mesh()
    n_dev = mesh.devices.size
    if n_dev == 1 or n < n_dev:
        return tuple(jnp.asarray(a) for a in arrays), n
    pad = (-n) % n_dev
    out = []
    for a in arrays:
        a = jnp.asarray(a)
        if pad:
            a = jnp.concatenate([a] + [a[-1:]] * pad, axis=0)
        spec = P(mesh.axis_names[0], *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out), n


def shard_latent_state(state, mesh=None):
    """Row-shard a CompiledDGP (latents, params) state over the mesh.

    Latent layers are (n, width) arrays whose leading axis is the data axis
    the whole SEM program is batched over; placing them with a ('data', None)
    sharding makes GSPMD partition every chunk program (ESS candidate
    evaluations, batched M-step factorisations, NN refresh) across devices,
    inserting the log-lik psum reductions and boundary gathers
    automatically.  Params are tiny and stay replicated.  Single-device
    sessions get the state back untouched."""
    latents, params = state
    if mesh is None:
        mesh = device_mesh()
    if mesh.devices.size == 1:
        return state
    sh = NamedSharding(mesh, P(mesh.axis_names[0], None))
    return tuple(jax.device_put(a, sh) for a in latents), params


def trim_rows(out, n):
    """Undo shard_rows padding on every array in a result pytree."""
    return jax.tree_util.tree_map(lambda o: np.asarray(o)[:n], out)


def assert_sharded(x, min_devices=2):
    """Raise unless `x` is laid out across at least `min_devices` devices
    (used by tests to prove placement actually happened)."""
    devs = {s.device for s in x.addressable_shards}
    if len(devs) < min_devices:
        raise AssertionError(
            f"expected >= {min_devices} devices, got {len(devs)}")


def sharded_chunk_map(fn, x, chunk_num=None, method="mean_var"):
    """Apply ``fn`` to row-chunks of ``x`` and concatenate results (host-side
    fallback used where the jnp-level sharded path does not apply, e.g.
    sampling draws that are cheap relative to chunking)."""
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
