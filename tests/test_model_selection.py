"""Model-selection pipeline: moment extraction and kernel hyperparameter
fits recover known ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from ppi_tpu.model_selection import (
    action_windows,
    extract_matrix_normal_moments,
    fit_kernel_hyperparams,
    select_model,
)
from ppi_tpu.policies.kernels import k_squared_exponential


class TestExtraction:
    def test_windows_shape(self):
        a = jnp.arange(40.0).reshape(20, 2)
        w = action_windows(a, horizon=5, stride=3)
        assert w.shape == (6, 5, 2)
        np.testing.assert_allclose(w[1, 0], a[3])

    def test_moments_recover_generative_model(self):
        # sample from a known matrix normal and recover its factors
        key = jax.random.key(0)
        h, d_a, n = 8, 2, 4000
        t = jnp.linspace(0, 1, h)
        cov_in = k_squared_exponential(jnp.array([1.0, 0.25]), t, t)
        chol_in = jnp.linalg.cholesky(cov_in)
        cov_out = jnp.diag(jnp.array([0.5, 2.0]))
        z = jax.random.normal(key, (n, h, d_a))
        samples = jnp.einsum("ki,bij->bkj", chol_in, z) @ jnp.sqrt(cov_out)
        mean, ci, co = extract_matrix_normal_moments(samples, iterations=5)
        np.testing.assert_allclose(mean, 0.0, atol=0.1)
        # U and V are identified up to a scale: compare normalized
        sf = np.trace(np.asarray(co)) / np.trace(np.asarray(cov_out))
        np.testing.assert_allclose(np.asarray(co) / sf, cov_out, atol=0.15)
        np.testing.assert_allclose(np.asarray(ci) * sf, cov_in,
                                   atol=0.15, rtol=0.2)


class TestKernelFit:
    def test_recovers_se_hyperparams(self):
        t = jnp.linspace(0.0, 1.0, 16)
        true_hyper = jnp.array([2.0, 0.15])
        target = k_squared_exponential(true_hyper, t, t)
        hyper, kl = fit_kernel_hyperparams(
            k_squared_exponential, t, target, jnp.array([1.0, 1.0]))
        assert float(kl) < 0.1, float(kl)
        # sigma is weakly identified (jitter + KL weighting); the
        # lengthscale is the decision-relevant parameter
        np.testing.assert_allclose(hyper[1], true_hyper[1], rtol=0.1)
        np.testing.assert_allclose(hyper[0], true_hyper[0], rtol=0.35)

    def test_select_model_end_to_end(self):
        rng = np.random.default_rng(0)
        # smooth expert actions: filtered noise
        raw = rng.normal(size=(300, 2)).astype(np.float32)
        smooth = np.stack([np.convolve(raw[:, i], np.ones(10) / 10, "same")
                           for i in range(2)], 1)
        out = select_model(smooth, horizon=12, kernels={
            "SquaredExponentialKernel": (k_squared_exponential, [1.0, 1.0])})
        entry = out["SquaredExponentialKernel"]
        assert np.isfinite(entry["kl"])
        assert entry["param"].shape == (2,)
        assert entry["covariance_out"].shape == (2, 2)
