"""Device->host fetch discipline.

Over the axon TPU tunnel, a device->host transfer REQUESTED while its
producer is still executing can take minutes (measured 212 s vs 0.2 s for
block-then-read of the same k-means fit -- see vecchia/nn.py::_host).
Every host read of a freshly dispatched result must wait for readiness
first; ``block_until_ready`` on an already-ready tree is a no-op, so this
is free insurance everywhere else.
"""
import jax
import numpy as np


def install_blocking_fetch():
    """Patch ``jax.Array._value`` to wait for readiness before the host
    copy.  Over the axon tunnel, ``_single_device_array_to_np_array`` on an
    array whose producer is still executing takes ~200 s (a server-side
    polling path); ``block_until_ready`` first makes the same fetch
    instant.  This covers every host read -- including jit LOWERING, which
    fetches closed-over constants (mlir ir_constant) whose host->device
    transfers are still in flight at trace time.  No-op on CPU and on
    already-ready arrays, so it is safe to install unconditionally."""
    from jax._src import array as _jarray

    prop = _jarray.ArrayImpl.__dict__.get('_value')
    if (prop is None or not isinstance(prop, property)
            or getattr(prop.fget, '__name__', '') == '_dgp_tpu_blocking_value'):
        return

    import os
    dbg = os.environ.get('DGP_TPU_DEBUG_FETCH')

    def _dgp_tpu_blocking_value(self):
        try:
            self.block_until_ready()
        except Exception:
            pass
        if not dbg:
            return prop.fget(self)
        import time
        import sys
        print(f"[fetch start {self.shape} {self.dtype}]",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        out = prop.fget(self)
        el = time.perf_counter() - t0
        print(f"[fetch {self.shape} {self.dtype}: {el*1e3:.0f} ms]",
              file=sys.stderr, flush=True)
        return out

    _jarray.ArrayImpl._value = property(_dgp_tpu_blocking_value)


def fetch(tree):
    """Block until ``tree`` is ready, then transfer it to host in one
    pipelined ``device_get``."""
    jax.block_until_ready(tree)
    return jax.device_get(tree)


def fetch_np(a):
    """Block, then fetch a single array as ``np.ndarray``."""
    jax.block_until_ready(a)
    return np.asarray(a)
