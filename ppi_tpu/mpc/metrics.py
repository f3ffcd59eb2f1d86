"""Control-quality metrics: FFT smoothness and signal power.

Counterpart of the reference metrics (reference: mpc/metrics.py:9-50) on
``jnp.fft``: Sm = 2 * sum(amplitude * frequency) of the single-sided spectrum
(from "Regularizing Action Policies for Smooth Control with Reinforcement
Learning"), evaluated for the action-norm signal and per-dimension max.
"""

import jax.numpy as jnp


def _smoothness_1d(signal: jnp.ndarray, freqs: jnp.ndarray):
    n = signal.shape[0]
    amp = 2.0 * jnp.abs(jnp.fft.fft(signal)[: n // 2]) / n
    return 2.0 * jnp.sum(amp * freqs), amp


def fft_smoothness(action_sequence: jnp.ndarray, dt: float):
    """Returns (Sm, per-dim max Sm, spectrum, freqs, action-norm signal)."""
    n, d = action_sequence.shape
    freqs = jnp.linspace(0.0, 0.5 / dt, n // 2)
    per_dim = jnp.stack([
        _smoothness_1d(action_sequence[:, i], freqs)[0] for i in range(d)])
    norm_signal = jnp.linalg.norm(action_sequence, axis=1)
    sm, spectrum = _smoothness_1d(norm_signal, freqs)
    return sm, jnp.max(per_dim), spectrum, freqs, norm_signal


def signal_power(action_sequence: jnp.ndarray):
    """Mean L2 norm of the action signal (reference: mpc/metrics.py:43-50)."""
    return jnp.linalg.norm(action_sequence, axis=1).mean()
