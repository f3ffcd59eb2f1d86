"""Importance-weight utilities shared by every PPI solver.

Self-normalized importance sampling bookkeeping: log-weight normalization,
effective sample size (ESS) and weight entropy. These are the jit-safe
counterparts of the logsumexp/ESS expressions the reference inlines throughout
(reference: ppi/policies.py:78-93, ppi/algorithms.py:443-444, 550-554).
All functions accept log-weights that may contain ``-inf`` (masked lanes from
diverged rollouts); ``logsumexp`` handles those exactly, so a NaN cost never
poisons the batch — it just carries zero weight.
"""

import jax.numpy as jnp
from jax.scipy.special import logsumexp


def normalize_log_weights(log_w: jnp.ndarray) -> jnp.ndarray:
    """Normalize log-weights so that ``exp(log_nw)`` sums to one."""
    return log_w - logsumexp(log_w)


def effective_sample_size(log_nw: jnp.ndarray) -> jnp.ndarray:
    """Kish effective sample size from *normalized* log-weights.

    ESS = 1 / sum(w_i^2) = exp(-logsumexp(2 log_nw)).
    """
    return jnp.exp(-logsumexp(2.0 * log_nw))


def weight_entropy(log_nw: jnp.ndarray) -> jnp.ndarray:
    """Shannon entropy term sum(w log w) of normalized weights (reference
    logs this as ``weight_ent``; reference: ppi/algorithms.py:127)."""
    nw = jnp.exp(log_nw)
    # w log w -> 0 as w -> 0; where() keeps the -inf * 0 product out.
    return jnp.sum(jnp.where(nw > 0.0, log_nw * nw, 0.0))


def log_weight_stats(log_w: jnp.ndarray):
    """Return (log_nw, nw, ess) in one pass."""
    log_nw = normalize_log_weights(log_w)
    nw = jnp.exp(log_nw)
    return log_nw, nw, effective_sample_size(log_nw)


def select_row(params: jnp.ndarray, log_w: jnp.ndarray) -> jnp.ndarray:
    """Extract the argmax-weight row of ``params`` (N, ...) as a one-hot
    contraction over the sample axis.

    ``params[jnp.argmax(log_w)]`` is a dynamic-slice along the sample axis;
    under a sample-sharded mesh the SPMD partitioner must all-gather the
    ENTIRE batch onto every device to serve it (observed: an
    f32[16384,H,d] all-gather in the compiled LBPS step). The one-hot
    einsum reduces over the sharded axis instead, so each device contributes
    a partial sum and only the selected (H, d) row is all-reduced —
    collective traffic drops from O(N H d) to O(H d).
    """
    onehot = (jnp.arange(log_w.shape[0]) == jnp.argmax(log_w)).astype(
        params.dtype)
    return jnp.einsum("b,b...->...", onehot, params)
