"""Power-law (1/f^beta) Gaussian noise via on-device FFT.

Replaces the ``colorednoise`` NumPy dependency used by the coloured-noise
policy (reference: ppi/policies.py:1241-1243). Standard spectral synthesis:
scale the rFFT spectrum of white Gaussian noise by f^(-beta/2), normalize to
unit output variance, inverse transform — as jit-compiled ``jnp.fft`` with
explicit PRNG keys.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("shape",))
def powerlaw_psd_gaussian(key: jax.Array, beta, shape: tuple) -> jnp.ndarray:
    """Gaussian noise with S(f) ~ f^{-beta} along the LAST axis of ``shape``.

    beta = 0 is white noise, 1 pink, 2 red/Brownian.
    """
    n = shape[-1]
    if n == 1:
        return jax.random.normal(key, shape)
    f = jnp.fft.rfftfreq(n)
    # Avoid the f=0 pole by reusing the first nonzero frequency's amplitude.
    amp = jnp.where(f == 0.0, f[1], f) ** (-beta / 2.0)
    # Unit-variance normalization: the DC bin carries no variance and the
    # Nyquist bin (even n) is real-only so it counts at half weight.
    nyq_w = 0.5 * (1.0 + (n % 2))
    var_w = amp[1:] ** 2
    var_w = var_w.at[-1].multiply(nyq_w)
    sigma = 2.0 * jnp.sqrt(jnp.sum(var_w)) / n

    k_re, k_im = jax.random.split(key)
    fshape = shape[:-1] + (f.shape[0],)
    sr = jax.random.normal(k_re, fshape) * amp
    si = jax.random.normal(k_im, fshape) * amp
    # A real signal needs real DC (and Nyquist for even n) components.
    imag_mask = jnp.ones(f.shape[0]).at[0].set(0.0)
    if n % 2 == 0:
        imag_mask = imag_mask.at[-1].set(0.0)
    spectrum = sr + 1j * (si * imag_mask)
    return jnp.fft.irfft(spectrum, n=n, axis=-1) / sigma
