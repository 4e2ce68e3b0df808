from . import kernels, linalg, moments, special, lbfgs  # noqa: F401
