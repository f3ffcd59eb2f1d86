"""Prior-design helpers: actuator-range moments and action limiting.

Counterpart of ``design_moments`` / ``Limiter`` (reference:
ppi/policies.py:40-75). The limiter is a plain clip expressed so it fuses
into the sampling einsum under jit; "no limiter" is the same clip with
infinite bounds, keeping one code path (no Python branching under trace).
"""

import jax.numpy as jnp


def design_moments(lower: jnp.ndarray, upper: jnp.ndarray, ratio: float):
    """Matrix-normal prior moments that explore an actuator box.

    Mean at the box centre; total per-action variance (half-range)^2 split
    between the input scale (ratio) and the output covariance (variance/ratio)
    so that covariance_in * covariance_out recovers the box variance.
    """
    mean = 0.5 * (upper + lower)
    action_variance = 0.25 * (upper - lower) ** 2
    covariance_in = jnp.asarray([ratio])
    covariance_out = jnp.diag(action_variance / ratio)
    return mean, covariance_in, covariance_out


def unbounded_like(action_dim: int):
    """(lower, upper) bounds representing "no limiter"."""
    return (jnp.full((action_dim,), -jnp.inf), jnp.full((action_dim,), jnp.inf))


def clip_actions(x: jnp.ndarray, lower: jnp.ndarray, upper: jnp.ndarray):
    """Clip the trailing action dimension into [lower, upper].

    When the trailing axis is wider than the bounds (derivative channels
    appended to the action channels), only the leading ``len(lower)`` entries
    are clipped; derivative channels pass through, matching the reference's
    limiter applied before the derivative concat only for feature policies.
    """
    d = lower.shape[0]
    if x.shape[-1] == d:
        return jnp.clip(x, lower, upper)
    head = jnp.clip(x[..., :d], lower, upper)
    return jnp.concatenate([head, x[..., d:]], axis=-1)
