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


class TestArtifactWiring:
    """model_selection.npz artifact -> run_mpc --model-selection (the
    reference's fitted-prior loader; reference: run_mpc.py:53-61)."""

    def test_save_load_roundtrip(self, tmp_path):
        from ppi_tpu.model_selection import (load_model_selection,
                                             save_model_selection)
        payload = {"SquaredExponentialKernel": {
            "mean": np.array([0.1, -0.2], np.float32),
            "covariance_out": np.eye(2, dtype=np.float32),
            "param": np.array([1.5, 0.07], np.float32),
            "kl": 0.01}}
        path = tmp_path / "model_selection.npz"
        save_model_selection(path, payload)
        back = load_model_selection(path)
        entry = back["SquaredExponentialKernel"]
        np.testing.assert_allclose(entry["mean"], payload[
            "SquaredExponentialKernel"]["mean"])
        np.testing.assert_allclose(entry["param"], [1.5, 0.07])

    def test_run_mpc_consumes_artifact(self, tmp_path):
        """collect (synthetic) expert -> select_model -> run_mpc builds the
        policy from the fitted artifact: the fitted lengthscale and output
        covariance must land in the constructed kernel state."""
        from ppi_tpu.model_selection import (default_kernels,
                                             save_model_selection,
                                             select_model)
        from ppi_tpu.runners import run_mpc

        rng = np.random.default_rng(1)
        raw = rng.normal(size=(200, 1)).astype(np.float32)
        smooth = np.convolve(raw[:, 0], np.ones(8) / 8, "same")[:, None]
        dt = 0.05
        kernels = {"SquaredExponentialKernel":
                   default_kernels(dt)["SquaredExponentialKernel"]}
        payload = select_model(smooth, horizon=8, kernels=kernels,
                               t=dt * jnp.arange(8))
        path = tmp_path / "model_selection.npz"
        save_model_selection(path, payload)

        args = run_mpc.build_parser().parse_args([
            "Mppi", "pendulum", "SquaredExponentialKernel",
            "--timesteps", "10", "--horizon", "8",
            "--n-warmstart-iters", "0", "--no-plots",
            "--model-selection", str(path),
            "MonteCarlo", "--n-samples", "16"])
        ret, track = run_mpc.main(args)
        assert np.isfinite(ret)

    def test_optimize_hyper_improves_nll(self):
        from ppi_tpu.policies import design_moments, make_policy
        from ppi_tpu.policies.kernels import k_squared_exponential

        h, d_a = 12, 1
        t = 0.05 * jnp.arange(h)
        lower, upper = -jnp.ones(1), jnp.ones(1)
        mean, ci, co = design_moments(lower, upper, 100.0)
        fam, state = make_policy("SquaredExponentialKernel", t, d_a, mean,
                                 ci, co, lengthscale=1.0,
                                 lower=lower, upper=upper)
        # target drawn from a much shorter-lengthscale GP
        true = k_squared_exponential(jnp.array([1.0, 0.08]), t, t)
        chol = jnp.linalg.cholesky(true + 1e-8 * jnp.eye(h))
        target = chol @ jax.random.normal(jax.random.key(0), (h, d_a))
        nll0 = float(fam.hyper_nll(state, state.hyper, target))
        new = fam.optimize_hyper(state, target, steps=300)
        nll1 = float(fam.hyper_nll(state, new.hyper, target))
        assert nll1 < nll0
        assert not np.allclose(np.asarray(new.hyper),
                               np.asarray(state.hyper))
        # the rebuilt prior grams reflect the new hyperparameters
        np.testing.assert_allclose(
            np.asarray(new.cov_in),
            np.asarray(k_squared_exponential(new.hyper, t, t)), rtol=1e-5)
