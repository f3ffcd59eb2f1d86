"""Base-sample generators as PRNG-key functions.

Counterpart of the reference's sampler classes (reference:
ppi/samplers.py:14-102), redesigned around explicit JAX key threading:

  * ``MONTE_CARLO``      — i.i.d. standard normal draws.
  * ``QUASI_MONTE_CARLO``— scrambled Sobol + inverse-CDF (on-device digital
                           net; see ppi_tpu.ops.qmc).
  * ``CUBATURE``         — the 2d deterministic sigma points sqrt(d)*[I; -I].

Every generator returns *standard-normal* base samples; the affine map to the
policy's distribution happens in the policy layer, so QMC/cubature structure
is preserved through the transform exactly as in the reference.

Elite-particle injection (the reference's ``Particles`` sampler used for iCEM
sample reuse, reference: ppi/samplers.py:67-102) is a combinator here:
``inject_particles`` overwrites the first k lanes of a base-sample batch with
a stored particle buffer under a static-shape mask.
"""

import enum
from functools import partial

import jax
import jax.numpy as jnp

from ppi_tpu.ops.qmc import sobol_normal


class SamplerKind(enum.Enum):
    MONTE_CARLO = "MonteCarlo"
    QUASI_MONTE_CARLO = "QuasiMonteCarlo"
    CUBATURE = "CubatureQuadrature"
    PARTICLES = "Particles"  # Monte Carlo + elite-particle injection


# CLI-name registry, mirroring the reference's name-based resolution UX
# (reference: run_mpc.py:33-35).
BY_NAME = {k.value: k for k in SamplerKind}
BY_NAME.update({"mc": SamplerKind.MONTE_CARLO, "qmc": SamplerKind.QUASI_MONTE_CARLO,
                "quad": SamplerKind.CUBATURE})


def cubature_points(dim: int) -> jnp.ndarray:
    """(2*dim, dim) unscented/cubature sigma points sqrt(d) * [+e_i; -e_i]."""
    eye = jnp.eye(dim)
    return jnp.sqrt(float(dim)) * jnp.concatenate([eye, -eye], axis=0)


@partial(jax.jit, static_argnames=("kind", "n", "dim"))
def draw_base(kind: SamplerKind, key: jax.Array, n: int, dim: int) -> jnp.ndarray:
    """(n, dim) standard-normal(-structured) base samples."""
    if kind in (SamplerKind.MONTE_CARLO, SamplerKind.PARTICLES):
        return jax.random.normal(key, (n, dim))
    if kind == SamplerKind.QUASI_MONTE_CARLO:
        return sobol_normal(key, n, dim)
    if kind == SamplerKind.CUBATURE:
        if n != 2 * dim:
            raise ValueError(
                f"Cubature quadrature produces exactly 2*dim={2*dim} samples; "
                f"got n_samples={n}. Set n_samples accordingly.")
        return cubature_points(dim)
    raise ValueError(f"Unknown sampler kind {kind}")


def inject_particles(samples: jnp.ndarray, particles: jnp.ndarray,
                     n_particles: jnp.ndarray) -> jnp.ndarray:
    """Overwrite the first ``n_particles`` lanes of ``samples`` with particles.

    ``particles`` is a fixed-size (K, ...) buffer; ``n_particles`` (traced
    scalar) says how many of its rows are live. Static-shape equivalent of the
    reference's in-place row copy (reference: ppi/samplers.py:93-98).
    """
    k = particles.shape[0]
    take = jnp.minimum(n_particles, min(k, samples.shape[0]))
    lane = jnp.arange(samples.shape[0])
    use = lane < take
    # Broadcast the particle buffer onto the leading lanes (buffer may be
    # shorter than the batch; index clamp keeps shapes static).
    src = particles[jnp.minimum(lane, k - 1)]
    return jnp.where(use.reshape((-1,) + (1,) * (samples.ndim - 1)), src, samples)
