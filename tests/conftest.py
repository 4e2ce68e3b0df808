import os

# Default: run the test suite on a virtual 8-device CPU mesh so multi-chip
# sharding paths are exercised without TPU hardware.  NOTE: jax may already
# have been imported by the interpreter's sitecustomize, so the env vars
# alone are not enough -- the config must be updated directly.
#
# DGP_TPU_TESTS=1 keeps the real backend instead, for the `-m tpu` subset
# that exercises the Mosaic-lowered Pallas kernels on an actual chip:
#   DGP_TPU_TESTS=1 python -m pytest tests/test_tpu.py -m tpu -q
_ON_TPU = bool(os.environ.get("DGP_TPU_TESTS"))

import jax  # noqa: E402

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
