"""Function-space (GP kernel) trajectory priors.

Counterpart of ``BaseKernel`` and the kernel zoo (reference:
ppi/policies.py:666-1104, 1329-1410): squared-exponential, Matérn 1/2-3/2-5/2,
periodic, white-noise, and the linear-Gaussian-dynamical-system (integrator
chain) kernel. The prior over an action sequence is a GP evaluated on the H
planning timesteps, so U = K(t, t) is (H, H).

TPU-first notes:
  * kernel hyperparameters live in the state pytree (``hyper``), so
    marginal-likelihood fits differentiate straight through ``k`` with
    ``jax.grad`` — no autograd/SciPy;
  * the receding-horizon conditioning shift (``update_timesteps``) uses the
    cached prior Cholesky and triangular solves instead of explicit inverses;
  * the LGDS kernel is built in closed form from the integrator-chain
    transition polynomials as one masked (H, H*order) matmul — not the
    reference's O(H) Python loop of dense matrix powers
    (reference: ppi/policies.py:1371-1384).
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

SQRT3 = float(np.sqrt(3.0))
SQRT5 = float(np.sqrt(5.0))


class KernelState(MatrixNormalState):
    hyper: jax.Array = None       # kernel hyperparameters (sigma, ls[, period])
    cov_prior: jax.Array = None   # K(t, t) prior on the current window
    chol_prior: jax.Array = None


# ---------------------------------------------------------------------------
# kernel functions k(hyper, t1, t2) -> (|t1|, |t2|) gram matrices
# ---------------------------------------------------------------------------

def _pairwise_diff(t1, t2):
    return t1[:, None] - t2[None, :]


def k_squared_exponential(hyper, t1, t2, eps=1e-8):
    sigma, ls = hyper[0], hyper[1]
    d = _pairwise_diff(t1, t2) / ls
    k = sigma * jnp.exp(-0.5 * d * d)
    if t1.shape[0] == t2.shape[0]:
        k = k + 1e-3 * sigma * jnp.eye(t1.shape[0])
    return k


def _abs_diff_safe(t1, t2, eps):
    ad = jnp.abs(_pairwise_diff(t1, t2))
    return jnp.where(ad == 0.0, eps, ad)


def k_matern12(hyper, t1, t2, eps=1e-8):
    sigma, ls = hyper[0], hyper[1]
    return sigma * jnp.exp(-_abs_diff_safe(t1, t2, eps) / ls)


def k_matern32(hyper, t1, t2, eps=1e-8):
    sigma, ls = hyper[0], hyper[1]
    d = SQRT3 * _abs_diff_safe(t1, t2, eps) / ls
    return sigma * (1.0 + d) * jnp.exp(-d)


def k_matern52(hyper, t1, t2, eps=1e-8):
    sigma, ls = hyper[0], hyper[1]
    d = SQRT5 * _abs_diff_safe(t1, t2, eps) / ls
    return sigma * (1.0 + d + d * d / 3.0) * jnp.exp(-d)


def k_periodic(hyper, t1, t2, eps=1e-8):
    sigma, ls, period = hyper[0], hyper[1], hyper[2]
    ad = _abs_diff_safe(t1, t2, eps)
    s = jnp.sin(jnp.pi * ad / period)
    k = sigma * jnp.exp(-2.0 * s * s / ls)
    if t1.shape[0] == t2.shape[0]:
        k = k + 1e-3 * sigma * jnp.eye(t1.shape[0])
    return k


def k_white(hyper, t1, t2, eps=1e-8):
    sigma = hyper[0]
    return sigma * (jnp.abs(_pairwise_diff(t1, t2)) == 0.0).astype(t1.dtype)


def lgds_phi(order: int, j_dt: jnp.ndarray) -> jnp.ndarray:
    """First row of the integrator-chain transition matrix A^j as a function
    of elapsed time j*dt: [1, j dt, (j dt)^2/2][:order]. A is unipotent, so
    A^j is the exact flow over time j*dt — no matrix powers needed."""
    cols = [jnp.ones_like(j_dt)]
    if order >= 2:
        cols.append(j_dt)
    if order >= 3:
        cols.append(0.5 * j_dt * j_dt)
    return jnp.stack(cols, axis=-1)  # (..., order)


def k_lgds(hyper, t1, t2, order: int = 2, q0_scale: float = 1e-3,
           disturbance: float = 1e-6):
    """Gram matrix of the position component of an integrator-chain GP.

    The chain x_{k+1} = A x_k + w_k with process noise only on the highest
    derivative (Q = sigma e_d e_d^T) gives, for the position component at
    steps r, c (uniform timestep dt):

      K[r, c] = q0 * phi(r)·phi(c)                       (initial covariance)
              + sigma * sum_{k=1..min(r,c)} g(r-k) g(c-k) (process noise)
              + disturbance * delta_rc

    where phi(j) is the full first row of A^j and g(j) = phi(j)[order-1] is
    its last entry ((j dt)^{order-1}/(order-1)!). The sum over k is a masked
    outer product: one (H, H) matmul of lower-triangular "impulse response"
    matrices — closed form, MXU-shaped.

    Only defined on a single uniform time grid (t1 is t2), like the
    reference's (reference: ppi/policies.py:1371-1384).
    """
    sigma = hyper[0]
    n = t1.shape[0]
    dt = t1[1] - t1[0] if n > 1 else jnp.asarray(1.0, t1.dtype)
    j = jnp.arange(n, dtype=t1.dtype)
    phi = lgds_phi(order, j * dt)          # (n, order)
    # g_mat[r, k] = g(r - k) for k <= r else 0  (impulse response to noise
    # injected at step k, observed at step r). Noise enters at k = 1..n-1.
    rr = jnp.arange(n)[:, None]
    kk = jnp.arange(n)[None, :]
    lag = (rr - kk).astype(t1.dtype) * dt
    g = lgds_phi(order, lag)[..., order - 1]      # (n, n): g(r-k)
    g = jnp.where((rr >= kk) & (kk >= 1), g, 0.0)
    k_proc = sigma * (g @ g.T)
    k_init = q0_scale * (phi @ phi.T)
    return k_init + k_proc + disturbance * jnp.eye(n, dtype=t1.dtype)


KERNELS = {
    "SquaredExponentialKernel": (k_squared_exponential, 2),
    "Matern12Kernel": (k_matern12, 2),
    "Matern32Kernel": (k_matern32, 2),
    "Matern52Kernel": (k_matern52, 2),
    "PeriodicKernel": (k_periodic, 3),
    "WhiteNoiseKernel": (k_white, 1),
}


@dataclasses.dataclass(frozen=True)
class BaseKernel(MatrixPolicyBase):
    """GP trajectory prior with receding-horizon conditioning."""

    kernel: str = "SquaredExponentialKernel"
    lgds_order: int = 2  # only used by the LGDS family
    shift_eps: float = 1e-5

    name = "BaseKernel"

    # hyperparameter box constraints for marginal-likelihood fits
    # (reference: ppi/policies.py:866, 921, 980, 1042)
    @property
    def param_bounds(self):
        return {
            "SquaredExponentialKernel": ((1e-5, 1e6), (1e-5, 1e3)),
            "PeriodicKernel": ((1e-3, 1e6), (1e-4, 1e3), (1e-3, 1e3)),
            "WhiteNoiseKernel": ((1e-5, 1e6),),
        }.get(self.kernel, ((1e-5, 1e6), (1e-3, 1e3)))

    @property
    def dim_features(self) -> int:
        return self.horizon

    def k(self, state: "KernelState", t1, t2):
        if self.kernel == "LinearGaussianDynamicalSystemKernel":
            return k_lgds(state.hyper, t1, t2, order=self.lgds_order)
        fn, _ = KERNELS[self.kernel]
        return fn(state.hyper, t1, t2)

    # ---- construction -----------------------------------------------------

    def init(self, time_sequence, mean, covariance_in, covariance_out,
             lengthscale=1.0, period=1.0, lower=None, upper=None) -> KernelState:
        """covariance_in is the scalar kernel variance (shape (1,)), matching
        the reference's constructor contract (reference: ppi/policies.py:884)."""
        d_a = self.action_dim
        h = self.horizon
        assert time_sequence.shape[0] == h
        if lower is None:
            lower = jnp.full((d_a,), -jnp.inf)
            upper = jnp.full((d_a,), jnp.inf)
        sigma = jnp.reshape(covariance_in, ())
        if self.kernel == "PeriodicKernel":
            hyper = jnp.stack([sigma, jnp.asarray(lengthscale),
                               jnp.asarray(period)])
        elif self.kernel in ("WhiteNoiseKernel",
                             "LinearGaussianDynamicalSystemKernel"):
            hyper = jnp.stack([sigma])
        else:
            hyper = jnp.stack([sigma, jnp.asarray(lengthscale)])

        chol_out, _ = ops.safe_cholesky(covariance_out, jitter=0.0)
        particles, n_particles = init_particle_buffer(self.max_particles, h, d_a)
        state = KernelState(
            t=time_sequence,
            mean=jnp.zeros((h, d_a)),
            cov_in=jnp.eye(h), chol_in=jnp.eye(h),
            cov_out=covariance_out, chol_out=chol_out,
            cov_in_init=jnp.eye(h),
            mean_fn=mean,
            lower=lower, upper=upper,
            map_sequence=jnp.zeros((h, d_a)),
            particles=particles, n_particles=n_particles,
            hyper=hyper,
            cov_prior=jnp.eye(h), chol_prior=jnp.eye(h),
        )
        cov = self.k(state, time_sequence, time_sequence)
        chol, _ = ops.safe_cholesky(cov, jitter=0.0)
        return state.replace(cov_in=cov, chol_in=chol, cov_in_init=cov,
                             cov_prior=cov, chol_prior=chol)

    # ---- sampling / update ------------------------------------------------

    def sample(self, state: KernelState, key, n: int):
        z = self.base_sample(state, key, n)
        xs = state.mean_fn[None, None, :] + self.transform_base(state, z)
        xs = clip_actions(xs, state.lower, state.upper)
        return xs, xs

    def weighted_update(self, state, log_w, params, update_covariance=True):
        # Kernel policies fit in function space on mean-corrected samples; the
        # MAP sequence is tracked, and the mean does NOT revert on PD failure
        # (reference: ppi/policies.py:804-848).
        state = state.replace(
            map_sequence=ops.select_row(params, log_w)
            - state.mean_fn[None, :])
        corrected = params - state.mean_fn[None, None, :]
        return self.mavn_update(state, log_w, corrected,
                                update_covariance=update_covariance,
                                revert_mean_on_failure=False)

    def predict_mean(self, state: KernelState):
        mu = state.mean_fn[None, :] + state.mean
        return clip_actions(mu, state.lower, state.upper)

    def predict(self, state: KernelState):
        mu = state.mean_fn[None, :] + state.mean
        sigma_in, sigma_out = state.cov_in, state.cov_out
        std = jnp.sqrt(jnp.outer(jnp.diagonal(sigma_in), jnp.diagonal(sigma_out)))
        return mu, sigma_in, sigma_out, std

    def map_action_sequence(self, state: KernelState):
        return state.mean_fn[None, :] + state.map_sequence

    # ---- receding horizon -------------------------------------------------

    def compute_prior(self, state: KernelState, t):
        """Precompute the prior gram + Cholesky on the planning window
        (reference: ppi/policies.py:747-753)."""
        cov_prior = self.k(state, t, t)
        chol_prior, _ = ops.safe_cholesky(cov_prior, jitter=0.0)
        return state.replace(t=t, cov_prior=cov_prior, chol_prior=chol_prior)

    def update_timesteps(self, state: KernelState, t, anneal=1.0):
        """Shift the GP posterior onto a new time window.

        The current posterior (mean, cov_in) on window t_old is mapped onto
        t_new through the prior cross-covariances, with the posterior
        *information* annealed toward the prior and jitter for conditioning
        (reference: ppi/policies.py:761-791). A no-op when the window is
        unchanged (lax.cond — jit-safe version of the reference's
        timesteps_match early-out).
        """

        def shift(state):
            p_chol = state.chol_prior
            solve = lambda b: jax.scipy.linalg.cho_solve((p_chol, True), b)
            # Information gained relative to the prior, sandwiched by P^-1.
            gain = solve(solve(state.cov_prior - state.cov_in).T).T
            cross = self.k(state, t, state.t)
            mean_new = cross @ solve(state.mean)
            # The prior mean function carries the actuator-range offset; clip
            # in action space then remove the offset again.
            mean_new = clip_actions(mean_new + state.mean_fn[None, :],
                                    state.lower, state.upper) - state.mean_fn[None, :]
            sigma = state.hyper[0]
            cov_new = (
                self.k(state, t, t)
                - anneal * cross @ gain @ cross.T
                + self.shift_eps * sigma * jnp.eye(self.horizon)
            )
            chol_new, pd_ok = ops.safe_cholesky(cov_new, jitter=0.0)
            # If the shifted covariance lost PD (extreme anneal/weights), fall
            # back to the prior on the new window.
            prior_new = self.k(state, t, t)
            prior_chol, _ = ops.safe_cholesky(prior_new, jitter=0.0)
            cov_new = jnp.where(pd_ok, cov_new, prior_new)
            chol_new = jnp.where(pd_ok, chol_new, prior_chol)
            return state.replace(t=t, mean=mean_new, cov_in=cov_new,
                                 chol_in=chol_new)

        same = jnp.all(t == state.t)
        return jax.lax.cond(same, lambda s: s.replace(t=t), shift, state)

    # ---- conditioning / likelihood ---------------------------------------

    def condition(self, state: KernelState, t, action):
        """Exact GP conditioning of the *prior* on (t, action) observations
        (reference: ppi/policies.py:793-802)."""
        cov_p = self.k(state, t, t)
        cov_tp = self.k(state, state.t, t)
        sol = jnp.linalg.solve(cov_p, cov_tp.T)          # (q, H)
        mean = sol.T @ (action - state.mean_fn[None, :])
        cov = state.cov_in - cov_tp @ sol
        cov = ops.symmetric(cov)
        chol, _ = ops.safe_cholesky(cov)
        cov = chol @ chol.T
        return state.replace(mean=mean, cov_in=cov, chol_in=chol)

    def optimize_hyper(self, state: KernelState, target_matrix,
                       steps: int = 200, lr: float = 0.05) -> KernelState:
        """In-the-loop kernel hyperparameter optimization: minimize
        ``hyper_nll`` of a target (H, d_a) action matrix over log-hyper with
        in-graph Adam, then rebuild the prior grams from the optimum.

        The on-device counterpart of the reference's marginal-likelihood fit
        (reference: ppi/policies.py:696-713, `can_optimize` at 920) — there
        SciPy L-BFGS-B on the host, here a fixed-iteration jit-safe loop.
        Hyperparameters are clamped to the family's ``param_bounds``.
        """
        n_hyper = int(state.hyper.shape[0])
        bounds = jnp.asarray(self.param_bounds, dtype=jnp.float32)[:n_hyper]
        lo, hi = bounds[:, 0], bounds[:, 1]

        def objective(log_hyper):
            hyper = jnp.clip(jnp.exp(log_hyper), lo, hi)
            return self.hyper_nll(state, hyper, target_matrix)

        grad_fn = jax.value_and_grad(objective)

        def body(carry, _):
            x, m, v, i = carry
            val, g = grad_fn(x)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            mhat = m / (1.0 - 0.9 ** (i + 1.0))
            vhat = v / (1.0 - 0.999 ** (i + 1.0))
            x = x - lr * mhat / (jnp.sqrt(vhat) + 1e-8)
            return (x, m, v, i + 1.0), val

        x0 = jnp.log(jnp.clip(state.hyper, lo, hi))
        (x, _, _, _), _ = jax.lax.scan(
            body, (x0, jnp.zeros_like(x0), jnp.zeros_like(x0), 0.0), None,
            length=steps)
        hyper = jnp.clip(jnp.exp(x), lo, hi)
        trial = state.replace(hyper=hyper)
        cov = self.k(trial, state.t, state.t)
        chol, _ = ops.safe_cholesky(cov, jitter=0.0)
        return trial.replace(cov_in=cov, chol_in=chol, cov_in_init=cov,
                             cov_prior=cov, chol_prior=chol)

    def hyper_nll(self, state: KernelState, hyper, target_matrix):
        """Negative log-density of a target (H, d_a) matrix under the prior
        with the given hyperparameters — the objective of the reference's
        hyperparameter fit (reference: ppi/policies.py:696-708), here a pure
        function of ``hyper`` so it is directly ``jax.grad``-able."""
        trial = state.replace(hyper=hyper)
        cov_in = self.k(trial, state.t, state.t)
        chol_in, _ = ops.safe_cholesky(cov_in)
        # MN(0, K, V) log-density of the target
        diff = target_matrix
        u_inv_diff = jax.scipy.linalg.cho_solve((chol_in, True), diff)
        v_inv = jax.scipy.linalg.cho_solve(
            (state.chol_out, True), jnp.eye(self.action_dim))
        quad = jnp.sum(diff * (u_inv_diff @ v_inv))
        logdet = (self.action_dim * 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol_in)))
                  + self.horizon * 2.0 * jnp.sum(jnp.log(jnp.diagonal(state.chol_out))))
        const = self.dim_sample * jnp.log(2.0 * jnp.pi)
        return 0.5 * (quad + logdet + const)

    def loglikelihood(self, state: KernelState, x):
        """Average matrix-normal log-likelihood of (n, H, d_a) samples
        (reference: ppi/policies.py:716-733)."""
        n = x.shape[0]
        diff = x - state.mean[None] - state.mean_fn[None, None, :]
        u_inv_diff = jax.scipy.linalg.cho_solve((state.chol_in, True),
                                                jnp.transpose(diff, (1, 0, 2)).reshape(self.horizon, -1))
        u_inv_diff = u_inv_diff.reshape(self.horizon, n, self.action_dim).transpose(1, 0, 2)
        v_inv = jax.scipy.linalg.cho_solve(
            (state.chol_out, True), jnp.eye(self.action_dim))
        quad = jnp.einsum("bij,bik,kj->", diff, u_inv_diff, v_inv)
        llh = -0.5 * quad / n
        llh -= 0.5 * self.dim_sample * jnp.log(2.0 * jnp.pi)
        llh -= 0.5 * self.action_dim * 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(state.chol_in)))
        llh -= 0.5 * self.horizon * 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(state.chol_out)))
        return llh


def time_remap_matrix(t_new, t_old):
    """(H, H) 0/1 matrix R with R[i, j] = 1 iff t_new[i] == t_old[j]: the
    index remap used by delta-correlated priors on a shifted window
    (reference: ppi/policies.py:1093-1104)."""
    return (jnp.abs(t_new[:, None] - t_old[None, :]) == 0.0).astype(t_new.dtype)


@dataclasses.dataclass(frozen=True)
class WhiteNoiseKernelPolicy(BaseKernel):
    """Delta-correlated GP prior: the horizon shift is an index remap rather
    than a conditioning solve (reference: ppi/policies.py:1040-1104)."""

    kernel: str = "WhiteNoiseKernel"
    name = "WhiteNoiseKernel"

    def update_timesteps(self, state: KernelState, t, anneal=1.0):
        def shift(state):
            remap = time_remap_matrix(t, state.t)
            cov_new = self.k(state, t, t)
            mean = remap @ state.mean
            cov = remap @ state.cov_in @ remap.T
            cov = cov + (jnp.eye(self.horizon) - remap @ remap.T) @ cov_new
            cov = ops.symmetric(cov)
            chol, pd_ok = ops.safe_cholesky(cov)
            cov = jnp.where(pd_ok, cov, cov_new)
            chol = jnp.where(pd_ok, chol, jnp.linalg.cholesky(
                cov_new + 1e-6 * jnp.eye(self.horizon)))
            return state.replace(t=t, mean=mean, cov_in=cov, chol_in=chol)

        same = jnp.all(t == state.t)
        return jax.lax.cond(same, lambda s: s.replace(t=t), shift, state)


@dataclasses.dataclass(frozen=True)
class LgdsKernelPolicy(BaseKernel):
    """Integrator-chain (GP-prior-linear) kernel policy
    (reference: ppi/policies.py:1329-1410)."""

    kernel: str = "LinearGaussianDynamicalSystemKernel"
    name = "LinearGaussianDynamicalSystemKernel"

    def condition(self, state: KernelState, t, action):
        """Condition on actions at timesteps drawn from the *current grid*:
        the LGDS gram is only defined on its uniform grid, so conditioning
        selects sub-blocks of the existing covariance by time match
        (reference: ppi/policies.py:1386-1394)."""
        sel = time_remap_matrix(t, state.t)          # (q, H)
        cov0 = state.cov_in
        cov_p = sel @ cov0 @ sel.T                   # (q, q)
        cov_tp = cov0 @ sel.T                        # (H, q)
        sol = jnp.linalg.solve(cov_p, cov_tp.T)
        mean = sol.T @ (action - state.mean_fn[None, :])
        cov = ops.symmetric(cov0 - cov_tp @ sol)
        chol, _ = ops.safe_cholesky(cov)
        cov = chol @ chol.T
        return state.replace(mean=mean, cov_in=cov, chol_in=chol)
