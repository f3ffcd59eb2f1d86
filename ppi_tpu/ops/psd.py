"""Positive-definiteness guards, branchless and jit-safe.

The reference guards every covariance update with ``try: cholesky except:
regularize-or-revert`` (reference: ppi/policies.py:259-268, 479-516, 832-846).
Python exceptions don't exist under jit, so the TPU-native design is: run the
Cholesky, detect failure through NaNs in the factor, and select the fallback
with ``jnp.where`` / ``lax.cond``. An eigenvalue floor provides the
"regularize" path without data-dependent control flow.
"""

import jax.numpy as jnp


def symmetric(mat: jnp.ndarray) -> jnp.ndarray:
    """Symmetrize an (estimated) covariance (reference: ppi/policies.py:53-56)."""
    return 0.5 * (mat + jnp.swapaxes(mat, -1, -2))


def factorized(mat: jnp.ndarray) -> jnp.ndarray:
    """Zero the off-diagonals (reference: ppi/policies.py:59-62)."""
    return jnp.diag(jnp.diagonal(mat))


def default_jitter(dtype) -> float:
    return 1e-6 if jnp.dtype(dtype) == jnp.float64 else 1e-5


def safe_cholesky(a: jnp.ndarray, jitter: float | None = None):
    """Cholesky with additive jitter; returns ``(chol, ok)``.

    ``ok`` is a scalar bool: True iff the factorization succeeded (XLA returns
    NaNs rather than raising on a non-PD input).
    """
    d = a.shape[-1]
    if jitter is None:
        jitter = default_jitter(a.dtype)
    chol = jnp.linalg.cholesky(a + jitter * jnp.eye(d, dtype=a.dtype))
    ok = jnp.all(jnp.isfinite(chol))
    return chol, ok


def cholesky_or_fallback(a: jnp.ndarray, fallback_chol: jnp.ndarray, jitter=None):
    """Try ``chol(a)``; on failure return the previous factor (the reference's
    "revert to previous moments" path) without branching.

    Returns (chol, a_or_fallback_cov, ok).
    """
    chol, ok = safe_cholesky(a, jitter)
    chol = jnp.where(ok, chol, fallback_chol)
    cov = chol @ chol.T
    return chol, cov, ok


def psd_floor(a: jnp.ndarray, floor: float) -> jnp.ndarray:
    """Project a symmetric matrix to the PSD cone with eigenvalues >= floor.

    Branchless replacement for the reference's Woodbury/eigendecomposition
    singularity fallbacks (reference: ppi/algorithms.py:266-280, 307-324).
    """
    w, v = jnp.linalg.eigh(symmetric(a))
    w = jnp.maximum(w, floor)
    return (v * w[None, :]) @ v.T
