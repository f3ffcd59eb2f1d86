"""Shared machinery for matrix-valued (trajectory) policies.

A policy over action sequences A in R^{H x d_a} is a matrix normal
MN(M, U, V): row covariance U couples timesteps/features, column covariance V
couples action dimensions. Counterpart of ``BasePrimitive`` (reference:
ppi/policies.py:288-390) with two TPU-first changes:

  * state is a pytree (``flax.struct``) and every operation is a pure
    function, so policies ride through jit/vmap/scan/shard_map unchanged;
  * the MN sampling map ``M + L_U Z L_V^T`` runs as two batched matmuls
    (MXU) rather than a 3-operand einsum, and elite-particle injection for
    iCEM is a static-shape masked select on the base samples.
"""

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from ppi_tpu import ops
from ppi_tpu.samplers import SamplerKind, draw_base, inject_particles

SIGMA_MIN = 1e-6


class MatrixNormalState(struct.PyTreeNode):
    """Moments + auxiliaries of a matrix-normal trajectory prior."""

    t: jax.Array             # (H,) time window
    mean: jax.Array          # (m, d_a) weight-/function-space mean offset
    cov_in: jax.Array        # (m, m)
    chol_in: jax.Array       # (m, m)
    cov_out: jax.Array       # (d_a, d_a)
    chol_out: jax.Array      # (d_a, d_a)
    cov_in_init: jax.Array   # (m, m) for covariance resets
    mean_fn: jax.Array       # (d_a,) constant mean function
    lower: jax.Array         # (d_a,) actuator bounds (±inf when unbounded)
    upper: jax.Array
    map_sequence: jax.Array  # MAP/elite sample in *param* space (m, d_a)
    particles: jax.Array     # (K, m, d_a) reuse buffer (K >= 1)
    n_particles: jax.Array   # scalar int32: live rows in the buffer


@dataclasses.dataclass(frozen=True)
class MatrixPolicyBase:
    """Static configuration shared by feature/kernel/noise families."""

    horizon: int
    action_dim: int
    sampler: SamplerKind = SamplerKind.MONTE_CARLO
    use_derivatives: bool = False
    max_particles: int = 1
    track_entropy: bool = False  # matrix-normal entropy is O(m^3); off by
    track_kl: bool = False       # default like the reference's perf mode
    mavn_iterations: int = 1

    @property
    def dim_features(self) -> int:
        raise NotImplementedError

    @property
    def dim_sample(self) -> int:
        return self.dim_features * self.action_dim

    # ---- sampling ---------------------------------------------------------

    def base_sample(self, state: MatrixNormalState, key, n: int):
        """(n, m, d_a) standard-normal base draws with particle injection."""
        z = draw_base(self.sampler, key, n, self.dim_sample).reshape(
            n, self.dim_features, self.action_dim)
        if self.sampler == SamplerKind.PARTICLES:
            z = inject_particles(z, state.particles, state.n_particles)
        return z

    def transform_base(self, state: MatrixNormalState, z):
        """M + L_U Z L_V^T as two batched MXU matmuls; (n, m, d_a).

        Layout note (measured r3, do not retry): reshaping the L_U
        contraction to one (m, m) @ (m, n*d_a) matmul or a raw
        dot_general wins 1.56 -> 1.2 ms in ISOLATION but is neutral-to-
        2x-slower inside the full jitted PPI iteration — XLA propagates
        the transposed intermediate layout into the rollout/update and
        loses more than the matmul saves. The einsum form fuses best
        end-to-end (RESULTS.md negative results)."""
        zz = jnp.einsum("ki,bij->bkj", state.chol_in, z)
        return state.mean[None] + zz @ state.chol_out.T

    # ---- posterior update -------------------------------------------------

    def mavn_update(self, state: MatrixNormalState, log_w, samples,
                    update_covariance: bool = True,
                    revert_mean_on_failure: bool = True):
        """Matrix-normal moment match with a branchless PD guard.

        Mirrors the try/except revert logic of the reference
        (ppi/policies.py:479-516 features / 804-848 kernels): if the fitted
        input covariance is not PD, keep the previous covariance; the mean
        reverts too for feature policies but not kernel policies.
        """
        mean_new, cov_in_new, _, ess = ops.m_projection_mavn(
            log_w, samples, state.cov_in, state.cov_out,
            iterations=self.mavn_iterations, update_out=False)
        jitter = 1e-12 if cov_in_new.dtype == jnp.float64 else 1e-6
        cov_in_new = cov_in_new + jitter * jnp.eye(self.dim_features,
                                                   dtype=cov_in_new.dtype)
        chol_new, pd_ok = ops.safe_cholesky(cov_in_new, jitter=0.0)

        if update_covariance:
            cov_in_sel = jnp.where(pd_ok, cov_in_new, state.cov_in)
            chol_sel = jnp.where(pd_ok, chol_new, state.chol_in)
        else:
            cov_in_sel, chol_sel = state.cov_in, state.chol_in
        if revert_mean_on_failure:
            mean_sel = jnp.where(pd_ok, mean_new, state.mean)
        else:
            mean_sel = mean_new
        ess = jnp.where(pd_ok, ess, jnp.asarray(samples.shape[0], ess.dtype))

        if self.track_kl:
            kl = ops.matrix_gaussian_kl(
                mean_sel, cov_in_sel, state.cov_out,
                state.mean, state.cov_in, state.cov_out)
            kl = jnp.where(pd_ok, kl, 0.0)
        else:
            kl = jnp.zeros(())
        new_state = state.replace(mean=mean_sel, cov_in=cov_in_sel,
                                  chol_in=chol_sel)
        return new_state, ess, kl

    def smooth_update(self, state: MatrixNormalState, mean, cov_in, alpha):
        mean_s = alpha * mean + (1.0 - alpha) * state.mean
        cov_s = alpha * cov_in + (1.0 - alpha) * state.cov_in
        chol, _ = ops.safe_cholesky(cov_s, jitter=0.0)
        return state.replace(mean=mean_s, cov_in=cov_s, chol_in=chol)

    # ---- diagnostics ------------------------------------------------------

    def entropy(self, state: MatrixNormalState):
        if not self.track_entropy:
            return jnp.zeros(())
        return ops.matrix_normal_entropy(
            state.cov_in, state.cov_out, self.dim_features, self.action_dim)

    def reset_covariance(self, state: MatrixNormalState):
        chol, _ = ops.safe_cholesky(state.cov_in_init, jitter=0.0)
        return state.replace(cov_in=state.cov_in_init, chol_in=chol)

    def set_map_sequence(self, state: MatrixNormalState, seq):
        return state.replace(map_sequence=seq)

    def set_particles(self, state: MatrixNormalState, particles, n_live):
        """Store reuse particles (elite params) into the fixed-size buffer."""
        k = state.particles.shape[0]
        buf = jnp.zeros_like(state.particles)
        take = min(k, particles.shape[0])
        buf = buf.at[:take].set(particles[:take])
        return state.replace(
            particles=buf,
            n_particles=jnp.minimum(jnp.asarray(n_live, jnp.int32), k))

    def compute_prior(self, state: MatrixNormalState, t):
        return state.replace(t=t)

    # Families override:
    def sample(self, state, key, n):
        raise NotImplementedError

    def weighted_update(self, state, log_w, params, update_covariance=True):
        raise NotImplementedError

    def update_timesteps(self, state, t, anneal=1.0):
        raise NotImplementedError


def init_particle_buffer(max_particles: int, m: int, d_a: int):
    k = max(1, max_particles)
    return jnp.zeros((k, m, d_a)), jnp.zeros((), jnp.int32)
