"""Golden-value tests for the math layer against NumPy/SciPy oracles.

The reference ships no tests; these formalize its de-facto verification
strategy (SURVEY.md §4): every closed-form quantity in the math layer is
checked against an independent NumPy implementation of the same formula.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import logsumexp as scipy_lse

from ppi_tpu import ops
from ppi_tpu.ops.qmc import sobol_normal, sobol_uniform
from ppi_tpu.ops.fftnoise import powerlaw_psd_gaussian


def np_m_projection(log_w, samples):
    log_nw = log_w - scipy_lse(log_w)
    nw = np.exp(log_nw)
    ess = np.exp(-scipy_lse(2 * log_nw))
    mu = np.einsum("b,bi->i", nw, samples)
    dist = samples - mu[None, :]
    sigma = np.einsum("b,bi,bj->ij", nw, dist, dist)
    return mu, 0.5 * (sigma + sigma.T), ess


class TestWeighting:
    def test_ess_uniform(self):
        log_w = jnp.zeros(100)
        log_nw = ops.normalize_log_weights(log_w)
        assert np.isclose(ops.effective_sample_size(log_nw), 100.0, rtol=1e-3)

    def test_ess_single(self):
        log_w = jnp.array([-1e12] * 9 + [0.0])
        log_nw = ops.normalize_log_weights(log_w)
        assert np.isclose(ops.effective_sample_size(log_nw), 1.0, rtol=1e-3)

    def test_masked_lanes_are_inert(self, rng):
        costs = rng.normal(size=20).astype(np.float32)
        log_w = -costs
        masked = np.concatenate([log_w, [-np.inf, -np.inf]])
        log_nw_a = ops.normalize_log_weights(jnp.array(log_w))
        log_nw_b = ops.normalize_log_weights(jnp.array(masked))[:20]
        np.testing.assert_allclose(log_nw_a, log_nw_b, rtol=1e-6)

    def test_weight_entropy(self, rng):
        log_w = rng.normal(size=16).astype(np.float32)
        log_nw = log_w - scipy_lse(log_w)
        expect = np.sum(log_nw * np.exp(log_nw))
        got = ops.weight_entropy(jnp.array(log_nw))
        np.testing.assert_allclose(got, expect, rtol=1e-5)


class TestMProjection:
    def test_matches_numpy_oracle(self, rng):
        n, d = 200, 7
        samples = rng.normal(size=(n, d)).astype(np.float32)
        log_w = rng.normal(size=n).astype(np.float32)
        mu_np, sig_np, ess_np = np_m_projection(log_w, samples)
        mu, sig, ess = ops.m_projection(jnp.array(log_w), jnp.array(samples))
        np.testing.assert_allclose(mu, mu_np, atol=1e-5)
        np.testing.assert_allclose(sig, sig_np, atol=1e-5)
        np.testing.assert_allclose(ess, ess_np, rtol=1e-5)

    def test_mavn_matches_flipflop_oracle(self, rng):
        n, d_in, d_out = 64, 10, 3
        samples = rng.normal(size=(n, d_in, d_out)).astype(np.float32)
        log_w = rng.normal(size=n).astype(np.float32)
        cov_in0 = np.eye(d_in, dtype=np.float32)
        cov_out0 = np.diag(rng.uniform(0.5, 2.0, d_out)).astype(np.float32)

        # independent NumPy oracle of the weighted flip-flop MLE
        log_nw = log_w - scipy_lse(log_w)
        nw = np.exp(log_nw)
        mu = np.einsum("b,bij->ij", nw, samples)
        diff = samples - mu[None]
        cov_out = cov_out0.copy()
        out_inv = np.diag(1.0 / np.diag(cov_out))
        cov_in = np.einsum("b,bij,jk,blk->il", nw, diff, out_inv, diff) / d_out
        in_inv = np.diag(1.0 / np.diag(cov_in))
        cov_out = np.einsum("b,bij,ik,bkl->jl", nw, diff, in_inv, diff) / d_in

        m, ci, co, ess = ops.m_projection_mavn(
            jnp.array(log_w), jnp.array(samples), jnp.array(cov_in0),
            jnp.array(cov_out0), iterations=1, update_out=True,
        )
        np.testing.assert_allclose(m, mu, atol=1e-5)
        np.testing.assert_allclose(ci, 0.5 * (cov_in + cov_in.T), atol=1e-4)
        np.testing.assert_allclose(co, 0.5 * (cov_out + cov_out.T), atol=1e-4)

    def test_mavn_multiple_iterations_converge(self, rng):
        n, d_in, d_out = 256, 8, 2
        samples = rng.normal(size=(n, d_in, d_out)).astype(np.float32)
        log_w = np.zeros(n, np.float32)
        m, ci, co, _ = ops.m_projection_mavn(
            jnp.array(log_w), jnp.array(samples), jnp.eye(d_in),
            jnp.eye(d_out), iterations=5, update_out=True,
        )
        assert np.all(np.isfinite(ci)) and np.all(np.isfinite(co))
        # kron(V, U) should approximate the flattened sample covariance scale:
        # trace(U) * trace(V) ~ total variance * correction
        assert np.linalg.eigvalsh(np.asarray(ci)).min() > 0


class TestDivergences:
    def test_mvn_kl_identity_zero(self):
        mu = jnp.zeros(4)
        sig = jnp.eye(4)
        kl = ops.multivariate_gaussian_kl(mu, sig, mu, sig)
        assert np.isclose(kl, 0.0, atol=1e-6)

    def test_mvn_kl_oracle(self, rng):
        d = 5
        a = rng.normal(size=(d, d))
        s1 = a @ a.T + d * np.eye(d)
        b = rng.normal(size=(d, d))
        s2 = b @ b.T + d * np.eye(d)
        m1, m2 = rng.normal(size=d), rng.normal(size=d)
        diff = m2 - m1
        expect = 0.5 * (
            np.log(np.linalg.det(s2)) - np.log(np.linalg.det(s1))
            + np.trace(np.linalg.solve(s2, s1))
            + diff @ np.linalg.solve(s2, diff) - d
        )
        got = ops.multivariate_gaussian_kl(
            jnp.array(m1, jnp.float32), jnp.array(s1, jnp.float32),
            jnp.array(m2, jnp.float32), jnp.array(s2, jnp.float32))
        np.testing.assert_allclose(got, expect, rtol=1e-4)

    def test_mvn_entropy_oracle(self):
        sig = np.diag([1.0, 2.0, 3.0]).astype(np.float32)
        expect = 0.5 * np.log(np.linalg.det(sig)) + 1.5 * (1 + np.log(2 * np.pi))
        got = ops.multivariate_gaussian_entropy(jnp.array(sig), 3)
        np.testing.assert_allclose(got, expect, rtol=1e-5)

    def test_matrix_kl_identity_zero(self, rng):
        n, p = 6, 3
        m = rng.normal(size=(n, p)).astype(np.float32)
        a = rng.normal(size=(n, n)).astype(np.float32)
        u = a @ a.T + n * np.eye(n, dtype=np.float32)
        v = np.diag(rng.uniform(0.5, 1.5, p)).astype(np.float32)
        kl = ops.matrix_gaussian_kl(m, u, v, m, u, v)
        assert np.isclose(kl, 0.0, atol=1e-3)

    def test_matrix_kl_scale_invariance(self, rng):
        # MN(M, U, V) == MN(M, cU, V/c): the KL must not change.
        n, p = 5, 2
        m1 = rng.normal(size=(n, p)).astype(np.float32)
        m2 = rng.normal(size=(n, p)).astype(np.float32)
        a = rng.normal(size=(n, n)).astype(np.float32)
        u = a @ a.T + n * np.eye(n, dtype=np.float32)
        v = np.diag([0.5, 2.0]).astype(np.float32)
        kl_a = ops.matrix_gaussian_kl(m1, u, v, m2, u, v)
        kl_b = ops.matrix_gaussian_kl(m1, 10.0 * u, v / 10.0, m2, u, v)
        np.testing.assert_allclose(kl_a, kl_b, rtol=1e-3, atol=1e-3)

    def test_matrix_normal_entropy_matches_mvn(self, rng):
        # MN(M, U, V) = N(vec M, kron(V, U)): entropies must agree.
        n, p = 4, 3
        a = rng.normal(size=(n, n)).astype(np.float32)
        u = (a @ a.T + n * np.eye(n)).astype(np.float32)
        v = np.diag(rng.uniform(0.5, 2.0, p)).astype(np.float32)
        ent_mn = ops.matrix_normal_entropy(jnp.array(u), jnp.array(v), n, p)
        ent_mvn = ops.multivariate_gaussian_entropy(
            jnp.array(np.kron(v, u), jnp.float32), n * p)
        np.testing.assert_allclose(ent_mn, ent_mvn, rtol=1e-4)

    def test_vec_fortran_order(self):
        x = jnp.arange(6.0).reshape(2, 3)
        expect = np.asarray(x).reshape(-1, 1, order="F")
        np.testing.assert_allclose(ops.vec(x), expect)


class TestPsd:
    def test_safe_cholesky_ok(self):
        a = jnp.eye(3) * 2.0
        chol, ok = ops.safe_cholesky(a, jitter=0.0)
        assert bool(ok)
        np.testing.assert_allclose(chol @ chol.T, a, atol=1e-6)

    def test_safe_cholesky_detects_failure(self):
        a = jnp.diag(jnp.array([1.0, -1.0]))
        _, ok = ops.safe_cholesky(a, jitter=0.0)
        assert not bool(ok)

    def test_cholesky_or_fallback_reverts(self):
        bad = jnp.diag(jnp.array([1.0, -5.0]))
        prev = jnp.linalg.cholesky(jnp.eye(2) * 4.0)
        chol, cov, ok = ops.cholesky_or_fallback(bad, prev, jitter=0.0)
        assert not bool(ok)
        np.testing.assert_allclose(cov, np.eye(2) * 4.0, atol=1e-6)

    def test_psd_floor(self):
        a = jnp.diag(jnp.array([2.0, -3.0]))
        out = ops.psd_floor(a, 1e-3)
        w = np.linalg.eigvalsh(np.asarray(out))
        assert w.min() >= 1e-3 - 1e-6


class TestScalarOpt:
    def test_golden_section_quadratic(self):
        fn = lambda x: (x - 3.0) ** 2
        x = ops.golden_section_min(fn, 0.1, 100.0, iters=60)
        np.testing.assert_allclose(x, 3.0, rtol=1e-4)

    def test_grid_golden_reps_dual(self, rng):
        # REPS dual on normalized costs: the in-graph search must find a value
        # at least as good as (a) scipy L-BFGS-B from the reference's x0 and
        # (b) an exhaustive dense grid. (L-BFGS-B itself terminates early on
        # this nearly-flat dual, so "match scipy" is not the right oracle.)
        from scipy.optimize import minimize
        costs = rng.uniform(size=64).astype(np.float32)
        costs = (costs - costs.min()) / (costs.max() - costs.min())
        eps = 0.5

        def dual_np(alpha):
            w = np.exp(-alpha * costs)
            return eps / alpha + np.log(w.mean()) / alpha

        res = minimize(lambda a: dual_np(a.item()), x0=np.array([1.0]),
                       method="L-BFGS-B", bounds=((1e-5, 5e2),))
        dense = min(dual_np(a) for a in np.logspace(-5, np.log10(5e2), 4096))
        cj = jnp.array(costs)

        def dual_jax(alpha):
            from jax.scipy.special import logsumexp
            return eps / alpha + (logsumexp(-alpha * cj) - jnp.log(cj.shape[0])) / alpha

        x = ops.grid_golden_min(dual_jax)
        found = float(dual_jax(x))
        assert found <= res.fun + 1e-3
        np.testing.assert_allclose(found, dense, rtol=1e-2, atol=1e-3)

    def test_bisect_matches_ess_target(self, rng):
        from jax.scipy.special import logsumexp
        costs = jnp.array(rng.uniform(size=128).astype(np.float32))

        def ess_of_alpha(alpha):
            log_w = -alpha * costs
            log_nw = log_w - logsumexp(log_w)
            return jnp.exp(-logsumexp(2 * log_nw))

        alpha = ops.bisect_decreasing(ess_of_alpha, 10.0)
        np.testing.assert_allclose(ess_of_alpha(alpha), 10.0, rtol=1e-2)

    def test_grid_zoom_matches_golden_on_duals(self, rng):
        """The latency-optimal zoom searches (the solvers' default since
        round 3) must agree with the golden/bisection references on the
        actual PPI duals to well inside temperature sensitivity."""
        from jax.scipy.special import logsumexp
        costs = jnp.array(rng.uniform(size=256).astype(np.float32))
        costs = (costs - costs.min()) / (costs.max() - costs.min())

        def reps_dual(alpha):
            return 0.5 / alpha + (logsumexp(-alpha * costs)
                                  - jnp.log(costs.shape[0])) / alpha

        def lbps_bound(alpha):
            log_w = -alpha * costs
            log_nw = log_w - logsumexp(log_w)
            nw = jnp.exp(log_nw)
            ess = jnp.exp(-logsumexp(2.0 * log_nw))
            return jnp.sum(nw * costs) + 3.0 / jnp.sqrt(ess)

        for dual in (reps_dual, lbps_bound):
            a_golden = float(ops.grid_golden_min(dual))
            a_zoom = float(ops.grid_zoom_min(dual))
            # dual VALUES must match tightly (the duals are flat at the
            # minimum, so the alphas themselves may differ more)
            np.testing.assert_allclose(float(dual(a_zoom)),
                                       float(dual(a_golden)),
                                       rtol=1e-3, atol=1e-4)

        def ess_of_alpha(alpha):
            log_w = -alpha * costs
            log_nw = log_w - logsumexp(log_w)
            return jnp.exp(-logsumexp(2 * log_nw))

        a_zoom = ops.grid_zoom_root_decreasing(ess_of_alpha, 10.0)
        np.testing.assert_allclose(ess_of_alpha(a_zoom), 10.0, rtol=1e-2)
        a_bis = ops.bisect_decreasing(ess_of_alpha, 10.0)
        np.testing.assert_allclose(float(a_zoom), float(a_bis), rtol=2e-2)


class TestQmc:
    def test_sobol_uniform_range_and_balance(self):
        key = jax.random.key(0)
        u = sobol_uniform(key, 256, 5)
        assert u.shape == (256, 5)
        assert float(u.min()) > 0.0 and float(u.max()) < 1.0
        # digital-net balance: mean very close to 0.5 for power-of-two n
        np.testing.assert_allclose(np.asarray(u).mean(axis=0), 0.5, atol=0.02)

    def test_sobol_normal_moments(self):
        key = jax.random.key(1)
        z = sobol_normal(key, 1024, 4)
        np.testing.assert_allclose(np.asarray(z).mean(axis=0), 0.0, atol=0.05)
        np.testing.assert_allclose(np.asarray(z).std(axis=0), 1.0, atol=0.05)

    def test_sobol_scrambling_differs_by_key(self):
        a = sobol_uniform(jax.random.key(0), 16, 3)
        b = sobol_uniform(jax.random.key(1), 16, 3)
        assert not np.allclose(a, b)


class TestFftNoise:
    def test_white_noise_statistics(self):
        y = powerlaw_psd_gaussian(jax.random.key(0), 0.0, (512, 128))
        np.testing.assert_allclose(np.asarray(y).std(), 1.0, atol=0.05)

    def test_red_noise_spectrum_slope(self):
        # beta=2 -> power concentrated at low frequencies
        y = np.asarray(powerlaw_psd_gaussian(jax.random.key(0), 2.0, (256, 256)))
        sp = np.abs(np.fft.rfft(y, axis=-1)) ** 2
        mean_sp = sp.mean(axis=0)[1:]
        f = np.fft.rfftfreq(256)[1:]
        slope = np.polyfit(np.log(f), np.log(mean_sp), 1)[0]
        assert -2.6 < slope < -1.4

    def test_unit_variance_all_betas(self):
        for beta in [0.5, 1.0, 2.0]:
            y = np.asarray(powerlaw_psd_gaussian(jax.random.key(2), beta, (2048, 64)))
            assert abs(y.std() - 1.0) < 0.1


class TestPallasMomentMatch:
    """The fused Pallas moment-match kernel (interpret mode on CPU) matches
    the lax oracle, including under large mean offsets (centred single-pass)
    and masked lanes."""

    def test_matches_oracle(self, rng):
        from ppi_tpu.ops.pallas_ops import m_projection_pallas
        n, d = 300, 17
        x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        lw = jnp.asarray(rng.normal(size=n).astype(np.float32))
        mu0, s0, e0 = ops.m_projection(lw, x, use_pallas="never")
        mu1, s1, e1 = m_projection_pallas(lw, x, interpret=True)
        np.testing.assert_allclose(mu1, mu0, atol=1e-5)
        np.testing.assert_allclose(s1, s0, atol=1e-5)
        np.testing.assert_allclose(e1, e0, rtol=1e-4)

    def test_large_mean_offset_precision(self, rng):
        from ppi_tpu.ops.pallas_ops import m_projection_pallas
        n, d = 256, 9
        x = 100.0 + 0.01 * jnp.asarray(
            rng.normal(size=(n, d)).astype(np.float32))
        lw = jnp.zeros(n)
        mu0, s0, _ = ops.m_projection(lw, x, use_pallas="never")
        mu1, s1, _ = m_projection_pallas(lw, x, interpret=True)
        np.testing.assert_allclose(mu1, mu0, rtol=1e-6)
        # covariance scale 1e-4: centring must preserve it
        np.testing.assert_allclose(np.diag(s1), np.diag(s0),
                                   rtol=0.05, atol=1e-7)

    def test_masked_lanes(self, rng):
        from ppi_tpu.ops.pallas_ops import m_projection_pallas
        n, d = 128, 8
        x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        lw = jnp.zeros(n).at[10:20].set(-jnp.inf)
        mu0, s0, e0 = ops.m_projection(lw, x, use_pallas="never")
        mu1, s1, e1 = m_projection_pallas(lw, x, interpret=True)
        np.testing.assert_allclose(mu1, mu0, atol=1e-5)
        np.testing.assert_allclose(e1, e0, rtol=1e-4)
