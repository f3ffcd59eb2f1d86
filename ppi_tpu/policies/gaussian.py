"""Vector-valued Gaussian policy for episodic optimization.

Counterpart of ``GaussianPolicy`` (reference: ppi/policies.py:234-281) as a
pure-function family over a pytree state: sampling, the weighted M-projection
update with a branchless PD guard, entropy and covariance reset are all
jit-safe, so a full optimizer iteration (sample -> evaluate -> update) is one
compiled program.
"""

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from ppi_tpu import ops
from ppi_tpu.samplers import SamplerKind, draw_base, inject_particles

SIGMA_MIN = 1e-6
# Pivot-conditioning threshold for the degenerate-covariance rank guard.
# Calibrated from both sides: a rank-deficient weighted fit whose Cholesky
# "succeeds" leaves its smallest pivot at the fp-noise floor ~5e-4 relative
# (measured at N=64; exactly-singular fits otherwise NaN outright), while a
# HEALTHY anisotropic fit has pivot ratio ~ 1/std_ratio (measured: 1.05e-2
# at std ratio 100, 3.4e-3 at 300, 9.9e-4 at 1000). 2e-3 keeps 4x margin
# above the singular-success floor — so both sides of the success/NaN knife
# edge still classify as degenerate and the repair stays deterministic —
# without rejecting genuine posteriors below condition ~2.5e5 (the earlier
# 1e-2 silently froze covariance adaptation at std ratios >~ 100).
RANK_TOL = 2e-3


class GaussianState(struct.PyTreeNode):
    mu: jax.Array          # (d,)
    sigma: jax.Array       # (d, d)
    chol: jax.Array        # (d, d) cholesky of sigma
    sigma_init: jax.Array  # (d, d)
    map_sequence: jax.Array  # (d,) best sample seen by elite methods
    particles: jax.Array   # (K, d) iCEM reuse buffer (K >= 1)
    n_particles: jax.Array  # scalar int32: live rows in the buffer


@dataclasses.dataclass(frozen=True)
class Gaussian:
    """Family config (static); all numbers live in ``GaussianState``."""

    dim: int
    sampler: SamplerKind = SamplerKind.MONTE_CARLO
    diagonal: bool = False  # factorized covariance (CEM convention)
    max_particles: int = 1  # iCEM reuse buffer capacity

    name = "Gaussian"

    def init(self, mu: jnp.ndarray, sigma: jnp.ndarray) -> GaussianState:
        chol = jnp.linalg.cholesky(sigma)
        k = max(1, self.max_particles)
        return GaussianState(
            mu=mu, sigma=sigma, chol=chol, sigma_init=sigma,
            map_sequence=mu,
            particles=jnp.zeros((k, self.dim), sigma.dtype),
            n_particles=jnp.zeros((), jnp.int32),
        )

    def sample(self, state: GaussianState, key: jax.Array, n: int):
        """Returns (samples, params); params are what weighted_update consumes
        (identical for the plain Gaussian)."""
        z = draw_base(self.sampler, key, n, self.dim)
        if self.sampler == SamplerKind.PARTICLES:
            # iCEM elite reuse: elites re-enter through the base batch and are
            # re-transformed, matching the matrix-normal families (and the
            # reference's Particles sampler, ppi/samplers.py:67-102).
            z = inject_particles(z, state.particles, state.n_particles)
        samples = state.mu[None, :] + z @ state.chol.T
        return samples, samples

    def set_particles(self, state: GaussianState, particles, n_live):
        """Store reuse particles (elite params) into the fixed-size buffer."""
        k = state.particles.shape[0]
        buf = jnp.zeros_like(state.particles)
        take = min(k, particles.shape[0])
        buf = buf.at[:take].set(particles[:take])
        return state.replace(
            particles=buf,
            n_particles=jnp.minimum(jnp.asarray(n_live, jnp.int32), k))

    def weighted_update(self, state: GaussianState, log_w, params,
                        update_covariance: bool = True):
        mu_new, sigma_new, ess = ops.m_projection(log_w, params)
        if self.diagonal:
            sigma_new = ops.factorized(sigma_new)
        if update_covariance:
            chol_new, ok = ops.safe_cholesky(sigma_new, jitter=0.0)
            # Rank guard: a weight-collapsed batch (ESS -> d or below) fits a
            # numerically singular sigma whose jnp Cholesky can still
            # "succeed" with ~0 pivots (NumPy's raises there, so the
            # reference reverts — ppi/policies.py:259-268). Detect it by
            # pivot conditioning (RANK_TOL, relative) and treat it as a
            # failure so the repair below is the SAME on both sides of the
            # success/NaN fp knife edge: an exactly rank-deficient fit (e.g.
            # two effective samples in d=3) sits precisely where Cholesky
            # success is decided by rounding noise, and "floor the fit" vs
            # "revert to previous" are wildly different posteriors (found by
            # the solver fuzz suite: shift-equivariance of MPPI-cov broke
            # only under the 8-device CPU config whose fusion rounds the
            # other way). Healthy updates are untouched bit-for-bit.
            pivots = jnp.diagonal(chol_new)
            degenerate = ~(jnp.min(pivots) > RANK_TOL * jnp.max(pivots))
            ok = ok & ~degenerate
            # PD guard (reference: ppi/policies.py:259-268): on failure keep
            # the previous covariance, regularized — branchless select.
            sigma_reg = state.sigma + SIGMA_MIN * jnp.eye(self.dim)
            sigma_sel = jnp.where(ok, sigma_new, sigma_reg)
            chol_sel = jnp.where(ok, chol_new, jnp.linalg.cholesky(sigma_reg))
        else:
            sigma_sel, chol_sel = state.sigma, state.chol
        kl = ops.multivariate_gaussian_kl(mu_new, sigma_sel, state.mu, state.sigma)
        new_state = state.replace(mu=mu_new, sigma=sigma_sel, chol=chol_sel)
        return new_state, ess, kl

    def smooth_update(self, state: GaussianState, mu, sigma, alpha):
        mu_s = alpha * mu + (1.0 - alpha) * state.mu
        sigma_s = alpha * sigma + (1.0 - alpha) * state.sigma
        chol, _ = ops.safe_cholesky(sigma_s, jitter=0.0)
        return state.replace(mu=mu_s, sigma=sigma_s, chol=chol)

    def entropy(self, state: GaussianState):
        return ops.multivariate_gaussian_entropy(state.sigma, self.dim)

    def reset_covariance(self, state: GaussianState) -> GaussianState:
        return state.replace(
            sigma=state.sigma_init,
            chol=jnp.linalg.cholesky(state.sigma_init))

    def predict_mean(self, state: GaussianState):
        return state.mu

    def set_map_sequence(self, state: GaussianState, seq) -> GaussianState:
        return state.replace(map_sequence=seq)

    # Episodic vector policies have no time axis; these are no-ops kept for
    # interface uniformity with the matrix-valued families.
    def compute_prior(self, state, t):
        return state

    def update_timesteps(self, state, t, anneal=1.0):
        return state
