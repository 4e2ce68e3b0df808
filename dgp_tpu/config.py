"""Global configuration for dgp_tpu.

The library computes Gaussian-process kernel matrices whose conditioning is
set by the nugget (default 1e-6 as in the reference, dgpsi/kernel_class.py:86).
Factorising such matrices reliably requires float64, so x64 is enabled at
import.  Individual compute paths (notably the Vecchia path, whose blocks are
tiny and re-jittered) can be run in float32 for TPU speed via
``set_default_dtype('float32')``.
"""
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
# GP linear algebra (ill-conditioned solves, tiny conditional variances)
# cannot tolerate bf16 MXU passes: run float32 matmuls at full precision.
jax.config.update("jax_default_matmul_precision", "highest")

_DEFAULT_DTYPE = jnp.float64


def set_default_dtype(dtype):
    """Set the working dtype for model state ('float32' or 'float64')."""
    global _DEFAULT_DTYPE
    _DEFAULT_DTYPE = jnp.dtype(dtype).type


def default_dtype():
    """The framework-wide working dtype (see :func:`set_default_dtype`)."""
    return _DEFAULT_DTYPE


# Numerical knobs --------------------------------------------------------
#: multiples of mean(diag) tried (in order) when a Cholesky factorisation
#: produces non-finite values.
CHOLESKY_JITTERS = (0.0, 1e-12, 1e-10, 1e-8, 1e-6, 1e-4)

#: speculative candidates evaluated per ESS rejection-loop launch (the
#: bracket recursion is deterministic under rejection, so K candidates can
#: be checked in one batched likelihood evaluation; see dgp_tpu/ess.py).
#: On TPU a fused launch costs ~0.7 ms regardless of K while each extra
#: candidate adds ~25 us, so a wide batch makes extra rejection rounds rare.
ESS_SPEC = 8

#: speculative width for LARGE models (n >= ESS_SPEC_LARGE_THRESHOLD).  At
#: n=1e5 each candidate's fused-kernel pass costs real compute (~0.6 GFLOP),
#: so a narrower batch wins even with occasional extra rejection rounds:
#: measured on a v5e-1 at n=1e5, K=4 runs the I-step ~12% faster than K=8
#: while K=16 is ~25% slower.
ESS_SPEC_LARGE = 4
ESS_SPEC_LARGE_THRESHOLD = 50_000


def ess_spec(n):
    """Speculative ESS width for a model with n data points."""
    return ESS_SPEC_LARGE if n >= ESS_SPEC_LARGE_THRESHOLD else ESS_SPEC

#: cap on the per-node M-step function-evaluation budget.  The reference
#: hands scipy L-BFGS-B maxfun = max(30, 20 + 5D) (kernel_class.py:542); in
#: stochastic EM the M-step only needs an improvement step, not convergence,
#: and each node re-optimisation starts warm from the previous iteration, so
#: a tighter budget preserves the stationary behaviour (quality gated by the
#: bench RMSE / parity suite) at roughly half the M-step cost.  16 is the
#: measured floor: at cap=8 a nugget_est node initialised far below its
#: optimum (the 1e-6 default vs a ~1e-2 noise level at n=5000) cannot climb
#: out before the scale estimate degenerates (vecchia_SI parity RMSE 2.23
#: vs 0.013 at cap=16).  Set to None to restore the reference budget
#: exactly.
#:
#: Validated round 3 across the reference-anchored parity matrix
#: (tools/mstep_cap_compare.py, MSTEP_CAP_COMPARE.json): cap=None produces
#: IDENTICAL quality numbers on dgp_poisson / negbin / linked (the warm
#: restarts converge within the cap) and a 0.004-nat train-NLL change on
#: motorcycle (0.3554 vs 0.3598) at ~2.7x the M-step wall time -- the cap
#: is not the source of any measured parity gap.
#:
#: cap=12 was evaluated for LARGE n in round 4 (12% faster SEM iterations at
#: n=1e5: 258 vs 290 ms/iter on v5e) and REJECTED: over 3 paired seeds of a
#: 48-iteration n=1e5 train-from-scratch, rmse-vs-truth moved 0.0080->0.0094,
#: 0.0115->0.0103, 0.0089->0.0105 (mean 0.0095->0.0101) -- within seed noise
#: but directionally worse on 2/3 pairs; not worth the headline.
MSTEP_MAXFUN_CAP = 16

# env override (used by tools/mstep_cap_compare.py to A/B the cap against
# the reference budget across the gated parity matrix)
import os as _os  # noqa: E402

_cap_env = _os.environ.get('DGP_TPU_MSTEP_CAP')
if _cap_env is not None:
    MSTEP_MAXFUN_CAP = (None if _cap_env.lower() in ('none', '')
                        else int(_cap_env))
del _os, _cap_env
