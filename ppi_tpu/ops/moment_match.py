"""Weighted M-projection (moment matching) for vector and matrix-valued samples.

The core Gibbs-posterior update: fit a (matrix-)normal distribution to
importance-weighted samples. Counterpart of ``m_projection`` /
``m_projection_mavn`` (reference: ppi/policies.py:78-143), redesigned for the
MXU: the weighted second-moment contractions are expressed as single large
matmuls (weights folded in as sqrt-scalings of the residuals), and the
iterative matrix-normal flip-flop runs a *fixed* number of iterations under
``lax.scan`` so the whole update stays inside one compiled program.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ppi_tpu.ops.weighting import log_weight_stats
from ppi_tpu.ops.psd import symmetric


# Dispatch to the fused Pallas kernel on TPU for batches where the fusion
# wins (measured: >= 6x at N=4096, d=640; see ppi_tpu/ops/pallas_ops.py).
PALLAS_MIN_ELEMENTS = 4096 * 64


def m_projection(log_w: jnp.ndarray, samples: jnp.ndarray,
                 use_pallas: str = "auto"):
    """Weighted Gaussian moment match on vector samples.

    Args:
      log_w: (N,) unnormalized log-weights (may contain -inf for masked lanes).
      samples: (N, d).
      use_pallas: "auto" (TPU + large batch), "never", or "always".

    Returns:
      mu (d,), sigma (d, d), ess (scalar).
    """
    n, d = samples.shape
    if use_pallas == "always" or (
            use_pallas == "auto" and jax.default_backend() == "tpu"
            and n * d >= PALLAS_MIN_ELEMENTS and d >= 8):
        from ppi_tpu.ops.pallas_ops import m_projection_pallas
        return m_projection_pallas(log_w, samples)
    _, nw, ess = log_weight_stats(log_w)
    mu = nw @ samples
    dist = samples - mu[None, :]
    # Fold the weights into the residuals so the covariance is one MXU matmul.
    x = jnp.sqrt(nw)[:, None] * dist
    sigma = symmetric(x.T @ x)
    return mu, sigma, ess


@partial(jax.jit, static_argnames=("iterations", "update_out"))
def m_projection_mavn(
    log_w: jnp.ndarray,
    samples: jnp.ndarray,
    covariance_in: jnp.ndarray,
    covariance_out: jnp.ndarray,
    iterations: int = 1,
    update_out: bool = False,
):
    """Weighted matrix-normal moment match with flip-flop U/V MLE iterations.

    Args:
      log_w: (N,) unnormalized log-weights.
      samples: (N, d_in, d_out) matrix-valued samples.
      covariance_in: (d_in, d_in) initial row covariance U.
      covariance_out: (d_out, d_out) initial column covariance V (used through
        its diagonal only, matching the factorized treatment of the reference).
      iterations: number of flip-flop iterations (static).
      update_out: whether to also re-estimate the column covariance (static).

    Returns:
      mean (d_in, d_out), covariance_in, covariance_out, ess.
    """
    n, d_in, d_out = samples.shape
    _, nw, ess = log_weight_stats(log_w)
    mean = jnp.einsum("b,bij->ij", nw, samples)
    diff = samples - mean[None, ...]
    # Pre-scale residuals by sqrt weights once; both flip-flop contractions
    # then become plain matmuls over the flattened (batch*other-dim) axis.
    wdiff = jnp.sqrt(nw)[:, None, None] * diff

    def body(carry, _):
        cov_in, cov_out = carry
        # U' = sum_b w_b X_b V^-1 X_b^T / d_out  with V kept factorized.
        out_inv_sqrt = jax.lax.rsqrt(jnp.diagonal(cov_out))
        a = wdiff * out_inv_sqrt[None, None, :]  # (N, d_in, d_out)
        a2 = jnp.transpose(a, (1, 0, 2)).reshape(d_in, n * d_out)
        cov_in_new = symmetric(a2 @ a2.T) / d_out
        if update_out:
            in_inv_sqrt = jax.lax.rsqrt(jnp.diagonal(cov_in_new))
            b = wdiff * in_inv_sqrt[None, :, None]
            b2 = jnp.transpose(b, (2, 0, 1)).reshape(d_out, n * d_in)
            cov_out_new = symmetric(b2 @ b2.T) / d_in
        else:
            cov_out_new = cov_out
        return (cov_in_new, cov_out_new), None

    (covariance_in, covariance_out), _ = jax.lax.scan(
        body, (covariance_in, covariance_out), None, length=iterations
    )
    return mean, covariance_in, covariance_out, ess
