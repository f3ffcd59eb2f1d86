"""Weight-space (feature) trajectory priors: RBF and quadrature-RFF.

Counterpart of ``BaseFeatures`` / ``RbfFeatures`` / ``RffFeatures``
(reference: ppi/policies.py:393-663). Actions are a linear model
``a(t) = mean_fn + Phi(t) W`` with a matrix-normal prior on W; an optional
derivative channel appends ``dPhi(t) W``. Feature matrices are (H, m) and the
per-sample trajectory synthesis is one batched (H, m) x (n, m, d_a) matmul —
the dominant FLOPs land on the MXU.

The scalable long-horizon path: m << H features make sampling and
conditioning O(m^3) + O(H m) instead of the kernel policies' O(H^3)
(SURVEY.md §5 "sequence parallelism" analogue).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ppi_tpu import ops
from ppi_tpu.policies.design import clip_actions
from ppi_tpu.policies.primitives import (
    MatrixNormalState,
    MatrixPolicyBase,
    init_particle_buffer,
)


class FeatureState(MatrixNormalState):
    pass


@dataclasses.dataclass(frozen=True)
class BaseFeatures(MatrixPolicyBase):
    """Common sampling/update/conditioning for feature families."""

    add_bias: bool = False

    # ---- family-specific basis functions ---------------------------------
    def feat(self, state: FeatureState, t: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def dfeat(self, state: FeatureState, t: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def _with_bias(self, blocks, t, d_dt: bool):
        """Append the bias column (ones for feat, zeros for dfeat)."""
        if self.add_bias:
            col = jnp.zeros_like(t)[:, None] if d_dt else jnp.ones_like(t)[:, None]
            blocks = blocks + (col,)
        return jnp.concatenate(blocks, axis=1)

    # ---- API --------------------------------------------------------------
    def _init_common(self, time_sequence, mean, covariance_in, covariance_out,
                     lower, upper):
        m = self.dim_features
        d_a = self.action_dim
        cov_in = covariance_in.reshape(()) * jnp.eye(m)
        chol_in, _ = ops.safe_cholesky(cov_in, jitter=0.0)
        chol_out, _ = ops.safe_cholesky(covariance_out, jitter=0.0)
        particles, n_particles = init_particle_buffer(self.max_particles, m, d_a)
        return dict(
            t=time_sequence,
            mean=jnp.zeros((m, d_a)),
            cov_in=cov_in, chol_in=chol_in,
            cov_out=covariance_out, chol_out=chol_out,
            cov_in_init=cov_in,
            mean_fn=mean,
            lower=lower, upper=upper,
            map_sequence=jnp.zeros((m, d_a)),
            particles=particles, n_particles=n_particles,
        )

    def sample(self, state: FeatureState, key, n: int):
        """Returns (actions (n, H, d_out), params = weight samples (n, m, d_a)).

        d_out = 2*d_a with the derivative channel, else d_a.
        """
        z = self.base_sample(state, key, n)
        ws = self.transform_base(state, z)
        feat_t = self.feat(state, state.t)             # (H, m)
        xs = state.mean_fn[None, None, :] + jnp.einsum(
            "ki,bij->bkj", feat_t, ws)                 # (n, H, d_a)
        if self.use_derivatives:
            dxs = jnp.einsum("ki,bij->bkj", self.dfeat(state, state.t), ws)
            ys = jnp.concatenate([xs, dxs], axis=-1)
        else:
            ys = xs
        return clip_actions(ys, state.lower, state.upper), ws

    def weighted_update(self, state, log_w, params, update_covariance=True):
        # Feature policies fit in weight space; mean reverts on PD failure
        # (reference: ppi/policies.py:479-516).
        return self.mavn_update(state, log_w, params,
                                update_covariance=update_covariance,
                                revert_mean_on_failure=True)

    def predict_mean(self, state: FeatureState):
        feat_t = self.feat(state, state.t)
        mu = state.mean_fn[None, :] + feat_t @ state.mean
        return clip_actions(mu, state.lower, state.upper)

    def map_action_sequence(self, state: FeatureState):
        """MAP/elite sample mapped from weight space to actions (the elite
        solvers store weight samples for feature policies)."""
        feat_t = self.feat(state, state.t)
        mu = state.mean_fn[None, :] + feat_t @ state.map_sequence
        return clip_actions(mu, state.lower, state.upper)

    def predict(self, state: FeatureState):
        """(mean (H, d_a), sigma_in (H, H), sigma_out (d_a, d_a), std (H, d_a))."""
        feat_t = self.feat(state, state.t)
        mu = self.predict_mean(state)
        sigma_in = feat_t @ state.cov_in @ feat_t.T
        sigma_out = state.cov_out
        std = jnp.sqrt(jnp.outer(jnp.diagonal(sigma_in), jnp.diagonal(sigma_out)))
        return mu, sigma_in, sigma_out, std

    def condition(self, state: FeatureState, t, action):
        """Bayesian linear conditioning of the weight prior on (t, action)
        pairs (Minka's linear-Gaussian update; reference:
        ppi/policies.py:449-459)."""
        f = self.feat(state, t)                       # (q, m)
        cov0_inv = jnp.linalg.inv(state.cov_in)
        s_xx = f.T @ f + cov0_inv
        s_yx = (action - state.mean_fn[None, :]).T @ f + state.mean.T @ cov0_inv
        mean_new = jnp.linalg.solve(s_xx, s_yx.T)
        cov_new = jnp.linalg.inv(s_xx)
        cov_new = ops.symmetric(cov_new)
        chol, _ = ops.safe_cholesky(cov_new, jitter=0.0)
        return state.replace(mean=mean_new, cov_in=cov_new, chol_in=chol)

    def update_timesteps(self, state: FeatureState, t, anneal=1.0):
        """Receding-horizon shift: features are global in time, so only the
        window moves; annealing pulls the weight covariance back toward the
        prior (reference: ppi/policies.py:396-402)."""
        cov = anneal * state.cov_in + (1.0 - anneal) * state.cov_in_init
        chol, _ = ops.safe_cholesky(cov, jitter=0.0)
        return state.replace(t=t, cov_in=cov, chol_in=chol)


@dataclasses.dataclass(frozen=True)
class RbfFeatures(BaseFeatures):
    """Normalized radial-basis features with uniformly spaced centres
    (reference: ppi/policies.py:519-590)."""

    n_features: int = 10
    lengthscale: float = 1.0
    # Centres are anchored to the *initial* full time range at construction
    # (the MPC window in state.t shifts; the basis does not). Static floats so
    # the config stays hashable and `feat` is a pure function of t.
    t_min: float = 0.0
    t_max: float = 1.0

    name = "RbfFeatures"

    @property
    def dim_features(self) -> int:
        return self.n_features + (1 if self.add_bias else 0)

    @property
    def _ls(self) -> float:
        return self.lengthscale / np.sqrt(2.0)

    @property
    def _norm(self) -> float:
        return 1.0 / np.sqrt(np.sqrt(np.pi) * self.n_features * self._ls)

    def with_time_range(self, time_sequence) -> "RbfFeatures":
        return dataclasses.replace(
            self, t_min=float(time_sequence[0]), t_max=float(time_sequence[-1]))

    def init(self, time_sequence, mean, covariance_in, covariance_out,
             lower=None, upper=None) -> FeatureState:
        assert self.lengthscale > 0.0
        if lower is None:
            lower = jnp.full((self.action_dim,), -jnp.inf)
            upper = jnp.full((self.action_dim,), jnp.inf)
        common = self._init_common(time_sequence, mean, covariance_in,
                                   covariance_out, lower, upper)
        return FeatureState(**common)

    def _centres(self) -> jnp.ndarray:
        return jnp.asarray(
            np.linspace(self.t_min, self.t_max, self.n_features))

    def feat(self, state, t):
        c = self._centres()
        diff = (t[:, None] - c[None, :]) / self._ls
        f = self._norm * jnp.exp(-0.5 * diff * diff)
        return self._with_bias((f,), t, d_dt=False)

    def dfeat(self, state, t):
        c = self._centres()
        diff = t[:, None] - c[None, :]
        g = diff / self._ls
        f = -self._norm * diff / (self._ls ** 2) * jnp.exp(-0.5 * g * g)
        return self._with_bias((f,), t, d_dt=True)


@dataclasses.dataclass(frozen=True)
class RffFeatures(BaseFeatures):
    """Gauss-Hermite quadrature random Fourier features of the SE kernel
    (reference: ppi/policies.py:593-663): cos/sin features at the positive
    Hermite nodes, weighted by the quadrature weights — a deterministic,
    spectrally exact m-feature approximation."""

    order: int = 10
    lengthscale: float = 1.0

    name = "RffFeatures"

    @property
    def dim_features(self) -> int:
        return 2 * self.order + (1 if self.add_bias else 0)

    def _nodes(self):
        x, w = np.polynomial.hermite.hermgauss(2 * self.order)
        freqs = np.sqrt(2.0) * x[self.order:] / self.lengthscale
        weights = 2.0 * w[self.order:] / np.sqrt(np.pi)
        return jnp.asarray(freqs), jnp.asarray(weights)

    def init(self, time_sequence, mean, covariance_in, covariance_out,
             lower=None, upper=None) -> FeatureState:
        assert self.lengthscale > 0.0
        if lower is None:
            lower = jnp.full((self.action_dim,), -jnp.inf)
            upper = jnp.full((self.action_dim,), jnp.inf)
        common = self._init_common(time_sequence, mean, covariance_in,
                                   covariance_out, lower, upper)
        return FeatureState(**common)

    def feat(self, state, t):
        freqs, weights = self._nodes()
        phase = t[:, None] * freqs[None, :]
        sw = jnp.sqrt(weights)[None, :]
        return self._with_bias(
            (jnp.cos(phase) * sw, jnp.sin(phase) * sw), t, d_dt=False)

    def dfeat(self, state, t):
        freqs, weights = self._nodes()
        phase = t[:, None] * freqs[None, :]
        fw = (freqs * jnp.sqrt(weights))[None, :]
        return self._with_bias(
            (-jnp.sin(phase) * fw, jnp.cos(phase) * fw), t, d_dt=True)
