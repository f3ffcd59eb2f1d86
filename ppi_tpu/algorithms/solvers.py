"""The PPI solver zoo: CEM, iCEM, REPS, MORE, MPPI(±cov), AIS, LBPS, ESSPS.

Counterparts of the algorithm classes (reference: ppi/algorithms.py:101-623).
Every ``update`` is a pure jit-safe function (policy-state in, policy-state
out); the SciPy temperature searches are replaced by the in-graph vectorized
solvers of ``ppi_tpu.ops.scalar_opt``, so a full solver iteration — including
temperature selection — is a single compiled program with no host round trip.

Weight conventions (identical to the reference):
  * elite methods use log-weights 0 for elites, -1e12 otherwise;
  * temperature methods use log w = -alpha * normalized-costs;
  * invalid (NaN-cost) lanes additionally get -inf (see algorithms.base).
"""

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from ppi_tpu import ops
from ppi_tpu.algorithms.base import (
    Batch,
    masked_max,
    masked_min,
    minmax_normalize,
)
from ppi_tpu.ops.scalar_opt import (
    ALPHA_LOWER,
    ALPHA_UPPER,
    grid_zoom_min,
    grid_zoom_root_decreasing,
    minimize_newton,
)

ELITE_NEG = -1e12


def _log_weight_diagnostics(log_w):
    log_nw = ops.normalize_log_weights(log_w)
    return ops.effective_sample_size(log_nw), ops.weight_entropy(log_nw)


@dataclasses.dataclass(frozen=True)
class SolverBase:
    """Default no-op reset; subclasses override update()."""

    def reset(self, family, state):
        return state

    def update(self, family, state, batch: Batch) -> Tuple:
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Cem(SolverBase):
    """Cross-entropy method: uniform weight on the top-k elite samples
    (reference: ppi/algorithms.py:101-128)."""

    n_elites: int = 10

    name = "CEM"

    def reset(self, family, state):
        return family.reset_covariance(state)

    def _elite_log_weights(self, batch: Batch):
        screened = jnp.where(batch.valid, batch.costs, jnp.inf)
        _, elite_idx = jax.lax.top_k(-screened, self.n_elites)
        log_w = jnp.full(batch.costs.shape, ELITE_NEG)
        log_w = log_w.at[elite_idx].set(0.0)
        return log_w + batch.log_valid, elite_idx

    def update(self, family, state, batch: Batch):
        log_w, elite_idx = self._elite_log_weights(batch)
        state, ess, kl = family.weighted_update(state, log_w, batch.params)
        state = family.set_map_sequence(state, batch.params[elite_idx[0]])
        _, weight_ent = _log_weight_diagnostics(log_w)
        stats = {"ess": ess, "kl": kl, "weight_ent": weight_ent,
                 "alpha": jnp.zeros(())}
        return state, stats


@dataclasses.dataclass(frozen=True)
class ICem(Cem):
    """iCEM: CEM plus elite-sample reuse — the top ``sample_reuse_pc *
    n_elites`` samples are stored as particles and injected into the next
    batch's base draws (reference: ppi/algorithms.py:131-165)."""

    sample_reuse_pc: float = 0.33

    name = "iCEM"

    @property
    def n_reuse(self) -> int:
        return int(self.sample_reuse_pc * self.n_elites)

    def update(self, family, state, batch: Batch):
        log_w, elite_idx = self._elite_log_weights(batch)
        state, ess, kl = family.weighted_update(state, log_w, batch.params)
        state = family.set_map_sequence(state, batch.params[elite_idx[0]])
        if self.n_reuse > 0:
            state = family.set_particles(
                state, batch.params[elite_idx[: self.n_reuse]], self.n_reuse)
        _, weight_ent = _log_weight_diagnostics(log_w)
        stats = {"ess": ess, "kl": kl, "weight_ent": weight_ent,
                 "alpha": jnp.zeros(())}
        return state, stats


@dataclasses.dataclass(frozen=True)
class Reps(SolverBase):
    """Relative entropy policy search: temperature from the KL-bounded dual
    g(a) = eps/a + log(mean e^{-a c}) / a, minimized in-graph
    (reference: ppi/algorithms.py:168-221)."""

    epsilon: float = 1.0

    name = "REPS"

    def update(self, family, state, batch: Batch):
        costs_n = minmax_normalize(batch.costs, batch.valid)
        n_valid = jnp.sum(batch.valid)

        def dual(alpha):
            log_w = -alpha * costs_n + batch.log_valid
            log_mean_w = logsumexp(log_w) - jnp.log(n_valid)
            return self.epsilon / alpha + log_mean_w / alpha

        # latency-optimal vectorized zoom search (see ops.scalar_opt:
        # the 32-step golden polish was ~1 ms of sequential tiny
        # kernels in the update's critical path)
        alpha = grid_zoom_min(dual, ALPHA_LOWER, ALPHA_UPPER)
        log_w = -alpha * costs_n + batch.log_valid
        state, ess, kl = family.weighted_update(state, log_w, batch.params)
        return state, {"ess": ess, "kl": kl, "alpha": alpha}


@dataclasses.dataclass(frozen=True)
class MppiBase(SolverBase):
    """Model-predictive path integral: fixed inverse temperature on
    min-shifted costs (reference: ppi/algorithms.py:455-492)."""

    alpha: float = 10.0

    update_covariance = False
    name = "MPPI"

    def update(self, family, state, batch: Batch):
        shifted = batch.costs - masked_min(batch.costs, batch.valid)
        log_w = -self.alpha * shifted + batch.log_valid
        state, ess, kl = family.weighted_update(
            state, log_w, batch.params,
            update_covariance=self.update_covariance)
        return state, {"ess": ess, "kl": kl,
                       "alpha": jnp.asarray(self.alpha, jnp.float32)}


@dataclasses.dataclass(frozen=True)
class Mppi(MppiBase):
    update_covariance = False


@dataclasses.dataclass(frozen=True)
class MppiUpdateCovariance(MppiBase):
    update_covariance = True
    name = "MPPI-cov"


@dataclasses.dataclass(frozen=True)
class Ais(SolverBase):
    """Adaptive importance sampling: fixed temperature on min-max-normalized
    costs (reference: ppi/algorithms.py:495-519)."""

    alpha: float = 10.0

    name = "AIS"

    def update(self, family, state, batch: Batch):
        costs_n = minmax_normalize(batch.costs, batch.valid)
        log_w = -self.alpha * costs_n + batch.log_valid
        state, ess, kl = family.weighted_update(state, log_w, batch.params)
        return state, {"ess": ess, "kl": kl,
                       "alpha": jnp.asarray(self.alpha, jnp.float32)}


@dataclasses.dataclass(frozen=True)
class Lbps(SolverBase):
    """Lower-bound policy search ("SNISLB"): pick the temperature minimizing
    the SNIS concentration bound E_w[c] + lambda / sqrt(ESS) with
    lambda = sqrt((1-delta)/delta) (reference: ppi/algorithms.py:522-577)."""

    delta: float = 0.9

    name = "SNISLB"

    def update(self, family, state, batch: Batch):
        costs_n = minmax_normalize(batch.costs, batch.valid)
        lam = jnp.sqrt((1.0 - self.delta) / self.delta)

        def lower_bound(alpha):
            log_w = -alpha * costs_n + batch.log_valid
            log_nw = log_w - logsumexp(log_w)
            nw = jnp.exp(log_nw)
            ess = jnp.exp(-logsumexp(2.0 * log_nw))
            expected_cost = jnp.sum(nw * costs_n)
            return expected_cost + lam / jnp.sqrt(ess)

        alpha = grid_zoom_min(lower_bound, ALPHA_LOWER, ALPHA_UPPER)
        log_w = -alpha * costs_n + batch.log_valid
        state, ess, kl = family.weighted_update(state, log_w, batch.params)
        return state, {"ess": ess, "kl": kl, "alpha": alpha}


@dataclasses.dataclass(frozen=True)
class Essps(SolverBase):
    """Effective-sample-size policy search: choose the temperature whose SNIS
    ESS matches a target elite count — a monotone root find, solved by
    in-graph bisection (reference: ppi/algorithms.py:580-623)."""

    n_elites: int = 10

    name = "ESSPS"

    def update(self, family, state, batch: Batch):
        costs_n = minmax_normalize(batch.costs, batch.valid)

        def ess_of(alpha):
            log_w = -alpha * costs_n + batch.log_valid
            log_nw = log_w - logsumexp(log_w)
            return jnp.exp(-logsumexp(2.0 * log_nw))

        alpha = grid_zoom_root_decreasing(
            ess_of, float(self.n_elites), ALPHA_LOWER, ALPHA_UPPER)
        log_w = -alpha * costs_n + batch.log_valid
        state, ess, kl = family.weighted_update(state, log_w, batch.params)
        _, weight_ent = _log_weight_diagnostics(log_w)
        return state, {"ess": ess, "kl": kl, "alpha": alpha,
                       "weight_ent": weight_ent}


# ---------------------------------------------------------------------------
# MORE
# ---------------------------------------------------------------------------

def _quadratic_features(w: jnp.ndarray):
    """[1, x, upper-triangle(x x^T)] feature map (the explicit closed form of
    the reference's PolynomialFeatures(2); reference: ppi/algorithms.py:245)."""
    n, d = w.shape
    iu, ju = jnp.triu_indices(d)
    quad = w[:, iu] * w[:, ju]
    return jnp.concatenate([jnp.ones((n, 1)), w, quad], axis=1), (iu, ju)


@dataclasses.dataclass(frozen=True)
class More(SolverBase):
    """Model-based relative entropy stochastic search.

    Fits a quadratic reward surrogate by (closed-form) ridge regression, then
    solves the 2-parameter (eta, omega) dual of the KL- and entropy-
    constrained Gaussian update, and applies a PD-safe interpolated update
    (reference: ppi/algorithms.py:224-452).

    TPU-native deviations from the reference, by design:
      * ridge fit via normal equations (one MXU matmul + cholesky solve)
        instead of sklearn;
      * R is projected onto the strictly-negative-definite cone by eigenvalue
        clipping (branchless) instead of the try/except Woodbury fallbacks;
      * the dual is minimized by fixed-iteration BFGS in log-parameters;
      * the PD line search evaluates its 3 interpolation candidates in
        parallel and selects the first PD one with KL <= epsilon. (The
        reference applies the *last tried* candidate when no candidate
        satisfies the bound — an apparent control-flow inversion at
        algorithms.py:435-438 that we do not replicate; we keep the previous
        policy instead, which is the fail-safe reading of the same guard.)
    """

    epsilon: float = 0.1
    base_entropy: float = -100.0
    entropy_rate: float = 0.99
    dimension: int = 2
    ridge_coeff: float = 1e-5

    name = "MORE"

    def _fit_quadratic(self, w, rewards, valid):
        d = self.dimension
        feats, (iu, ju) = _quadratic_features(w)
        fmask = feats * valid[:, None]
        gram = fmask.T @ fmask + self.ridge_coeff * jnp.eye(feats.shape[1])
        rhs = fmask.T @ (rewards * valid)
        coef = jnp.linalg.solve(gram, rhs)
        r0 = coef[0]
        r_lin = coef[1:1 + d]
        c_quad = coef[1 + d:]
        r_mat = jnp.zeros((d, d)).at[iu, ju].set(c_quad)
        r_mat = 0.5 * (r_mat + r_mat.T)  # symmetric; halves off-diagonals,
        # keeps diagonals (both triangles carry the diagonal)
        pred = jnp.einsum("bi,ij,bj->b", w, r_mat, w) + w @ r_lin + r0
        resid = jnp.where(valid, rewards - pred, 0.0)
        rmse = jnp.sqrt(jnp.sum(resid ** 2) / jnp.maximum(jnp.sum(valid), 1))
        return r0, r_lin, r_mat, rmse

    def update(self, family, state, batch: Batch):
        d = self.dimension
        w = batch.params
        rewards = -batch.costs
        rewards = rewards - masked_max(rewards, batch.valid)
        rewards = rewards / (masked_max(jnp.abs(rewards), batch.valid)
                             + jnp.finfo(rewards.dtype).tiny)
        rewards = rewards * 100.0
        # Invalid lanes carry NaN/inf through the arithmetic above; zero them
        # so the masked ridge fit (feats * valid) stays NaN-free — NaN * 0 is
        # NaN, not 0 — and the ESS diagnostic stays finite on heavily-masked
        # batches (base-loop contract C1: all-invalid => vacuous update).
        rewards = jnp.where(batch.valid, rewards, 0.0)

        r0, r_lin, r_mat, rmse = self._fit_quadratic(w, rewards, batch.valid)
        # strictly negative-definite projection of the curvature
        evals, evecs = jnp.linalg.eigh(r_mat)
        evals = jnp.minimum(evals, -1e-9)
        r_nd = (evecs * evals[None, :]) @ evecs.T

        q_cov, b_mean = state.sigma, state.mu
        q_chol = state.chol
        q_inv = jax.scipy.linalg.cho_solve((q_chol, True), jnp.eye(d))
        ent_n = ops.multivariate_gaussian_entropy(q_cov, d)
        beta = self.entropy_rate * (ent_n - self.base_entropy) + self.base_entropy
        logdet_q = 2.0 * jnp.sum(jnp.log(jnp.diagonal(q_chol)))
        ent_q = d * jnp.log(2.0 * jnp.pi) + logdet_q

        def dual(x):
            eta, omega = jnp.exp(x[0]), jnp.exp(x[1])
            f_prec = eta * q_inv - 2.0 * r_nd          # PD: eta Q^-1 + |2R|
            f_cov = jnp.linalg.inv(f_prec)
            f_vec = eta * jax.scipy.linalg.cho_solve((q_chol, True), b_mean) + r_lin
            f_f_f = f_vec @ f_cov @ f_vec
            b_q_b = b_mean @ jax.scipy.linalg.cho_solve((q_chol, True), b_mean)
            eta_omega = eta + omega
            sign, ld = jnp.linalg.slogdet(2.0 * jnp.pi * eta_omega * f_cov)
            del sign
            return (self.epsilon * eta - beta * omega
                    + 0.5 * (f_f_f - b_q_b * eta - eta * ent_q + ld * eta_omega))

        x0 = jnp.zeros(2)
        x, _ = minimize_newton(dual, x0, iters=30)
        x = jnp.clip(x, jnp.log(ALPHA_LOWER), jnp.log(ALPHA_UPPER))
        eta, omega = jnp.exp(x[0]), jnp.exp(x[1])

        f_prec = eta * q_inv - 2.0 * r_nd
        f_cov = jnp.linalg.inv(f_prec)
        f_vec = eta * jax.scipy.linalg.cho_solve((q_chol, True), b_mean) + r_lin
        mu_f = f_cov @ f_vec
        sigma_f = ops.symmetric((eta + omega) * f_cov)

        # PD-guarded interpolated update, candidates evaluated in parallel
        sigma_inv = q_inv
        sigma_f_inv = jnp.linalg.inv(sigma_f)
        g_mat = sigma_inv - sigma_f_inv
        m_mat = g_mat @ q_cov @ g_mat
        nu = sigma_inv @ b_mean
        nu_f = sigma_f_inv @ mu_f

        def candidate(t):
            prec_t = (1 - t) * sigma_inv + t * sigma_f_inv + 0.5 * t * t * m_mat
            sigma_t = jnp.linalg.inv(ops.symmetric(prec_t))
            mu_t = sigma_t @ ((1 - t) * nu + t * nu_f)
            chol_t, pd = ops.safe_cholesky(ops.symmetric(sigma_t), jitter=0.0)
            kl_t = ops.multivariate_gaussian_kl(mu_t, sigma_t, b_mean, q_cov)
            ok = pd & (kl_t <= self.epsilon) & jnp.all(jnp.isfinite(mu_t))
            del chol_t
            return mu_t, sigma_t, kl_t, ok

        ts = jnp.array([1.0, 0.5, 0.25])
        mus, sigmas, kls, oks = jax.vmap(candidate)(ts)
        first = jnp.argmax(oks)          # first True (argmax of bools)
        any_ok = jnp.any(oks)
        mu_sel = jnp.where(any_ok, mus[first], b_mean)
        sigma_sel = jnp.where(any_ok, sigmas[first], q_cov)
        kl = jnp.where(any_ok, kls[first], 0.0)
        state = family.smooth_update(state, mu_sel, sigma_sel, 1.0)

        log_w = rewards / eta + batch.log_valid
        ess, _ = _log_weight_diagnostics(log_w)
        ent = ops.multivariate_gaussian_entropy(sigma_sel, d)
        stats = {"alpha": 1.0 / eta, "omega": omega, "kl": kl, "ent": ent,
                 "ess": ess, "fit": rmse}
        return state, stats
