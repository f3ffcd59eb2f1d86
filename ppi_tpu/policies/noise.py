"""Diagonal per-timestep noise policies: white, coloured, smoothed.

Counterparts of ``WhiteNoiseIid`` / ``ColouredNoise`` /
``SmoothExplorationNoise`` / ``SmoothActionNoise`` (reference:
ppi/policies.py:1107-1326). These priors keep an independent (mean, std) per
(timestep, action) cell — the cheap baseline family for MPPI/CEM-style MPC.

TPU-first notes:
  * coloured 1/f^beta exploration noise is synthesized with on-device
    ``jnp.fft`` (ppi_tpu.ops.fftnoise) instead of the NumPy ``colorednoise``
    package;
  * the reference's first-order causal smoothing loop (reference:
    ppi/policies.py:1257-1268) is a linear recurrence
    y_t = (1-b) y_{t-1} + b x_t and runs as ``jax.lax.associative_scan`` —
    O(log H) depth instead of a Python loop over time.
"""

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from ppi_tpu import ops
from ppi_tpu.ops.fftnoise import powerlaw_psd_gaussian
from ppi_tpu.policies.design import clip_actions
from ppi_tpu.policies.kernels import time_remap_matrix
from ppi_tpu.samplers import SamplerKind, inject_particles


class NoiseState(struct.PyTreeNode):
    t: jax.Array            # (H,)
    mean: jax.Array         # (H, d_a) offset from mean_fn
    std: jax.Array          # (H, d_a)
    sigma_row: jax.Array    # (d_a,) per-action std of the prior
    mean_fn: jax.Array      # (d_a,)
    lower: jax.Array
    upper: jax.Array
    map_sequence: jax.Array  # (H, d_a) actions of the best sample
    particles: jax.Array     # (K, H, d_a)
    n_particles: jax.Array


def ema_smooth(x: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Causal first-order smoothing along axis -2 (time):
    y_0 = x_0; y_t = (1 - beta) * y_{t-1} + beta * x_t.

    Implemented as an associative scan over the affine maps
    (a_t, b_t) with y_t = a_t * y_{t-1} + b_t.
    """
    h = x.shape[-2]
    a = jnp.full((h,), 1.0 - beta).at[0].set(1.0)
    a = a.reshape((1,) * (x.ndim - 2) + (h, 1))
    b = (beta * x).at[..., 0, :].set(x[..., 0, :])

    def combine(l, r):
        (a1, b1), (a2, b2) = l, r
        return a1 * a2, a2 * b1 + b2

    _, y = jax.lax.associative_scan(combine, (jnp.broadcast_to(a, x.shape), b),
                                    axis=-2)
    return y


@dataclasses.dataclass(frozen=True)
class WhiteNoiseIid:
    """Independent Gaussian exploration noise per (t, action) cell
    (reference: ppi/policies.py:1107-1195)."""

    horizon: int
    action_dim: int
    sampler: SamplerKind = SamplerKind.MONTE_CARLO
    use_derivatives: bool = False
    max_particles: int = 1
    beta: float = 2.0  # colour exponent / smoothing coefficient (subfamilies)

    name = "WhiteNoiseIid"

    @property
    def dim_features(self) -> int:
        return self.horizon

    @property
    def dim_sample(self) -> int:
        return self.horizon * self.action_dim

    def init(self, time_sequence, mean, covariance_in, covariance_out,
             lower=None, upper=None) -> NoiseState:
        h, d_a = self.horizon, self.action_dim
        if lower is None:
            lower = jnp.full((d_a,), -jnp.inf)
            upper = jnp.full((d_a,), jnp.inf)
        sigma_row = jnp.sqrt(jnp.diagonal(covariance_out)
                             * jnp.reshape(covariance_in, ()))
        k = max(1, self.max_particles)
        return NoiseState(
            t=time_sequence,
            mean=jnp.zeros((h, d_a)),
            std=jnp.tile(sigma_row[None, :], (h, 1)),
            sigma_row=sigma_row,
            mean_fn=mean,
            lower=lower, upper=upper,
            map_sequence=jnp.zeros((h, d_a)),
            particles=jnp.zeros((k, h, d_a)),
            n_particles=jnp.zeros((), jnp.int32),
        )

    # ---- noise synthesis (overridden by subfamilies) ----------------------

    def base_noise(self, state: NoiseState, key, n: int):
        z = jax.random.normal(key, (n, self.horizon, self.action_dim))
        if self.sampler == SamplerKind.PARTICLES:
            z = inject_particles(z, state.particles, state.n_particles)
        return z

    def synth(self, state: NoiseState, z):
        xs = state.mean_fn[None, None, :] + state.mean[None] + state.std[None] * z
        return clip_actions(xs, state.lower, state.upper)

    def sample(self, state: NoiseState, key, n: int):
        xs = self.synth(state, self.base_noise(state, key, n))
        return xs, xs

    # ---- update -----------------------------------------------------------

    def weighted_update(self, state: NoiseState, log_w, params,
                        update_covariance: bool = True):
        _, nw, ess = ops.log_weight_stats(log_w)
        # shard-friendly MAP extraction (ops.select_row): a one-hot reduction
        # over the sample axis, not a dynamic-slice that would all-gather the
        # batch on a sample-sharded mesh
        state = state.replace(map_sequence=ops.select_row(params, log_w))
        corrected = params - state.mean_fn[None, None, :]
        mean = jnp.einsum("b,bij->ij", nw, corrected)
        if update_covariance:
            diff = corrected - mean[None]
            std = jnp.sqrt(jnp.einsum("b,bij->ij", nw, diff * diff))
        else:
            std = state.std
        return state.replace(mean=mean, std=std), ess, jnp.zeros(())

    # ---- diagnostics / resets ---------------------------------------------

    def entropy(self, state: NoiseState):
        # MVN entropy of the (H*d_a)-diagonal: no H*d_a matrix needed.
        var = jnp.maximum(state.std ** 2, 1e-30)
        d = self.dim_sample
        return 0.5 * jnp.sum(jnp.log(var)) + (d / 2.0) * (1.0 + jnp.log(2.0 * jnp.pi))

    def reset_covariance(self, state: NoiseState):
        return state.replace(
            std=jnp.tile(state.sigma_row[None, :], (self.horizon, 1)))

    def predict_mean(self, state: NoiseState):
        return state.mean_fn[None, :] + state.mean

    def predict(self, state: NoiseState):
        return self.predict_mean(state), state.std ** 2

    def map_action_sequence(self, state: NoiseState):
        return state.map_sequence

    def set_map_sequence(self, state, seq):
        return state.replace(map_sequence=seq)

    def set_particles(self, state: NoiseState, particles, n_live):
        k = state.particles.shape[0]
        take = min(k, particles.shape[0])
        buf = jnp.zeros_like(state.particles).at[:take].set(particles[:take])
        return state.replace(particles=buf,
                             n_particles=jnp.minimum(
                                 jnp.asarray(n_live, jnp.int32), k))

    def compute_prior(self, state, t):
        return state.replace(t=t)

    # ---- receding horizon -------------------------------------------------

    def update_timesteps(self, state: NoiseState, t, anneal=1.0):
        """Index-remap the overlapping window; re-inflate the variance of
        newly exposed steps to the prior (reference: ppi/policies.py:1176-1188)."""
        remap = time_remap_matrix(t, state.t)
        std_prior = jnp.tile(state.sigma_row[None, :], (self.horizon, 1))
        mean = remap @ state.mean
        fresh = (jnp.eye(self.horizon) - remap @ remap.T) @ std_prior
        std = jnp.sqrt((remap @ state.std) ** 2 + fresh ** 2)
        std = anneal * std + (1.0 - anneal) * std_prior
        return state.replace(t=t, mean=mean, std=std)


@dataclasses.dataclass(frozen=True)
class ColouredNoise(WhiteNoiseIid):
    """1/f^beta-correlated exploration noise (reference:
    ppi/policies.py:1198-1254). beta=2 (default) gives red/Brownian noise —
    the iCEM exploration prior."""

    name = "ColouredNoise"

    def base_noise(self, state: NoiseState, key, n: int):
        if self.horizon > 1:
            # temporal correlations along the last (FFT) axis, then move time
            # back to axis -2
            z = powerlaw_psd_gaussian(
                key, self.beta, (n, self.action_dim, self.horizon))
            z = jnp.transpose(z, (0, 2, 1))
        else:
            z = jax.random.normal(key, (n, self.horizon, self.action_dim))
        if self.sampler == SamplerKind.PARTICLES:
            z = inject_particles(z, state.particles, state.n_particles)
        return z

    def update_timesteps(self, state: NoiseState, t, anneal=1.0):
        state = super().update_timesteps(state, t, anneal)
        if self.sampler == SamplerKind.PARTICLES:
            # Shift reuse particles one step forward in time, repeating the
            # final action (reference: ppi/policies.py:1228-1236).
            p = state.particles
            shifted = jnp.concatenate([p[:, 1:, :], p[:, -1:, :]], axis=1)
            state = state.replace(particles=shifted)
        return state


@dataclasses.dataclass(frozen=True)
class SmoothExplorationNoise(WhiteNoiseIid):
    """Causally smoothed *noise*: the EMA filter runs on the standard-normal
    draws before scaling (reference: ppi/policies.py:1271-1311).
    beta in (0, 1) is the filter coefficient."""

    beta: float = 0.5
    name = "SmoothExplorationNoise"

    def __post_init__(self):
        assert 0.0 < self.beta < 1.0, f"smoothing beta must be in (0,1), got {self.beta}"

    def base_noise(self, state: NoiseState, key, n: int):
        z = jax.random.normal(key, (n, self.horizon, self.action_dim))
        z = ema_smooth(z, self.beta)
        if self.sampler == SamplerKind.PARTICLES:
            z = inject_particles(z, state.particles, state.n_particles)
        return z


@dataclasses.dataclass(frozen=True)
class SmoothActionNoise(SmoothExplorationNoise):
    """Causally smoothed *actions*: the commonly implemented variant that
    filters the full action sequence, mean included (reference:
    ppi/policies.py:1314-1326)."""

    name = "SmoothActionNoise"

    def base_noise(self, state: NoiseState, key, n: int):
        z = jax.random.normal(key, (n, self.horizon, self.action_dim))
        if self.sampler == SamplerKind.PARTICLES:
            z = inject_particles(z, state.particles, state.n_particles)
        return z

    def synth(self, state: NoiseState, z):
        xs = state.mean_fn[None, None, :] + state.mean[None] + state.std[None] * z
        xs = ema_smooth(xs, self.beta)
        return clip_actions(xs, state.lower, state.upper)
