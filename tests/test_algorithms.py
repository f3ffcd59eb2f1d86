"""Convergence tests of each PPI solver on analytic benchmarks with fixed
PRNG keys, plus unit checks of the weighting schemes (SURVEY.md §4 item b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppi_tpu import algorithms
from ppi_tpu.algorithms import make_solver, solve, solve_scan
from ppi_tpu.algorithms.base import Batch, mask_costs
from ppi_tpu.envs.functions import NoisySphere, Rosenbrock, make_function
from ppi_tpu.policies.gaussian import Gaussian


def run_solver(solver, dim=5, n_samples=128, n_iters=40, seed=0,
               function=None, sigma0=0.5, diagonal=False):
    fam = Gaussian(dim=dim, diagonal=diagonal)
    state = fam.init(jnp.ones(dim), sigma0 * jnp.eye(dim))
    f = function if function is not None else NoisySphere(dim=dim)
    state, trace = solve_scan(solver, fam, state, f, jax.random.key(seed),
                              n_samples, n_iters)
    return fam, state, trace


class TestConvergence:
    """Each solver must drive NoisySphere (d=5) close to its optimum at 0 —
    the canonical bring-up check (reference Makefile:8-9 config scaled down)."""

    @pytest.mark.parametrize("name,kwargs,cost_factor,mu_tol", [
        # fixed-covariance MPPI converges in the *mean* while the sampled
        # cost floor stays at tr(A Sigma) — check the mean, not the cost
        ("Mppi", dict(alpha=10.0), 1.0, 0.5),
        # covariance-adapting methods can collapse slightly off-optimum on a
        # noisy objective; check strong cost reduction instead
        ("MppiUpdateCovariance", dict(alpha=10.0), 0.05, 1.0),
        ("Cem", dict(n_elites=20), 0.05, 1.0),
        ("Reps", dict(epsilon=2.0), 0.05, 0.5),
        ("Ais", dict(alpha=10.0), 0.05, 0.5),
        ("Lbps", dict(delta=0.5), 0.05, 0.5),
        ("Essps", dict(n_elites=20), 0.05, 0.5),
    ])
    def test_noisy_sphere(self, name, kwargs, cost_factor, mu_tol):
        solver = make_solver(name, **kwargs)
        diagonal = name == "Cem"
        fam, state, trace = run_solver(solver, diagonal=diagonal)
        final_cost = float(trace["mean"][-1])
        initial_cost = float(trace["mean"][0])
        assert np.isfinite(final_cost)
        assert final_cost < cost_factor * initial_cost, (
            f"{name}: {initial_cost} -> {final_cost}")
        assert float(jnp.linalg.norm(state.mu)) < mu_tol

    def test_more_noisy_sphere(self):
        solver = make_solver("More", epsilon=0.1, base_entropy=-100.0,
                             entropy_rate=0.99, dimension=5)
        fam, state, trace = run_solver(solver, n_iters=60)
        assert float(trace["mean"][-1]) < 0.1 * float(trace["mean"][0])

    def test_reps_rosenbrock(self):
        solver = make_solver("Reps", epsilon=1.0)
        fam, state, trace = run_solver(
            solver, dim=3, function=Rosenbrock(dim=3), n_iters=80,
            n_samples=256)
        assert float(trace["mean"][-1]) < 0.05 * float(trace["mean"][0])


class TestWeighting:
    def setup_method(self, _):
        self.fam = Gaussian(dim=3)
        self.state = self.fam.init(jnp.zeros(3), jnp.eye(3))

    def make_batch(self, costs):
        costs = jnp.asarray(costs)
        c, v, lv = mask_costs(costs)
        params = jnp.tile(jnp.arange(costs.shape[0], dtype=jnp.float32)
                          [:, None], (1, 3))
        return Batch(c, params, v, lv)

    def test_cem_selects_elites(self):
        solver = algorithms.Cem(n_elites=2)
        batch = self.make_batch([5.0, 1.0, 3.0, 0.5, 9.0])
        state, stats = solver.update(self.fam, self.state, batch)
        # elites are samples 3 (cost .5) and 1 (cost 1): mean of their params
        np.testing.assert_allclose(np.asarray(state.mu), [2.0, 2.0, 2.0],
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(state.map_sequence),
                                   [3.0, 3.0, 3.0], atol=1e-6)
        assert float(stats["ess"]) == pytest.approx(2.0, rel=1e-3)

    def test_nan_lane_excluded(self):
        solver = algorithms.Cem(n_elites=2)
        batch = self.make_batch([np.nan, 1.0, 3.0, 0.5, 9.0])
        state, stats = solver.update(self.fam, self.state, batch)
        np.testing.assert_allclose(np.asarray(state.mu), [2.0, 2.0, 2.0],
                                   atol=1e-4)

    def test_all_nan_is_vacuous(self):
        solver = algorithms.Mppi(alpha=5.0)
        batch = self.make_batch([np.nan] * 4)
        state, stats = solver.update(self.fam, self.state, batch)
        assert np.all(np.isfinite(np.asarray(state.mu)))
        assert float(stats["ess"]) == pytest.approx(4.0, rel=1e-3)

    def test_essps_hits_target_ess(self):
        solver = algorithms.Essps(n_elites=8)
        key = jax.random.key(0)
        costs = jax.random.uniform(key, (64,))
        c, v, lv = mask_costs(costs)
        params = jax.random.normal(jax.random.key(1), (64, 3))
        state, stats = solver.update(self.fam, self.state,
                                     Batch(c, params, v, lv))
        assert float(stats["ess"]) == pytest.approx(8.0, rel=0.05)

    def test_mppi_weights_match_oracle(self):
        solver = algorithms.Mppi(alpha=3.0)
        costs = np.array([2.0, 1.0, 4.0], np.float32)
        batch = self.make_batch(costs)
        state, _ = solver.update(self.fam, self.state, batch)
        w = np.exp(-3.0 * (costs - costs.min()))
        w /= w.sum()
        expect = (w[:, None] * np.asarray(batch.params)).sum(0)
        np.testing.assert_allclose(np.asarray(state.mu), expect, atol=1e-5)

    def test_icem_stores_particles(self):
        from ppi_tpu.policies import make_policy
        fam, state = make_policy(
            "ColouredNoise", time_sequence=jnp.linspace(0, 1, 10),
            action_dimension=2, mean=jnp.zeros(2),
            covariance_in=jnp.array([1.0]), covariance_out=jnp.eye(2),
            sampler="Particles", max_particles=3)
        solver = algorithms.iCem(n_elites=9)  # n_reuse = 2
        xs, params = fam.sample(state, jax.random.key(0), 32)
        costs = jnp.arange(32.0)
        c, v, lv = mask_costs(costs)
        state, stats = solver.update(fam, state, Batch(c, params, v, lv))
        assert int(state.n_particles) == 2
        np.testing.assert_allclose(np.asarray(state.particles[0]),
                                   np.asarray(params[0]), atol=1e-6)

    def test_icem_reused_elites_reappear_in_next_batch(self):
        """Pin of the iCEM 33% sample-reuse semantics (VERDICT r2 weak #3):
        after one ICem update, the stored elites — time-shifted by the
        receding-horizon move, as the reference does for coloured noise
        (reference: ppi/policies.py:1228-1236) — deterministically occupy
        the leading lanes of the NEXT batch (reference row-copy injection,
        ppi/samplers.py:93-98 + algorithms.py:162-163): those lanes are
        key-independent and equal the re-synthesized elite action
        sequences."""
        from ppi_tpu.policies import make_policy
        t = jnp.linspace(0, 1, 10)
        fam, state = make_policy(
            "ColouredNoise", time_sequence=t, action_dimension=2,
            mean=jnp.zeros(2), covariance_in=jnp.array([1.0]),
            covariance_out=jnp.eye(2), sampler="Particles", max_particles=3)
        solver = algorithms.iCem(n_elites=10)  # n_reuse = 3
        xs, params = fam.sample(state, jax.random.key(0), 16)
        elite_rows = [7, 2, 11]
        costs = 10.0 + jnp.arange(16.0)
        for rank, row in enumerate(elite_rows):
            costs = costs.at[row].set(float(rank))
        c, v, lv = mask_costs(costs)
        state, _ = solver.update(fam, state, Batch(c, params, v, lv))
        assert int(state.n_particles) == 3
        np.testing.assert_allclose(np.asarray(state.particles),
                                   np.asarray(params[jnp.array(elite_rows)]),
                                   atol=1e-6)
        # receding-horizon move: particles must shift one step in time,
        # repeating the final action
        state = fam.update_timesteps(state, t)
        expect_shift = jnp.concatenate(
            [params[jnp.array(elite_rows)][:, 1:, :],
             params[jnp.array(elite_rows)][:, -1:, :]], axis=1)
        np.testing.assert_allclose(np.asarray(state.particles),
                                   np.asarray(expect_shift), atol=1e-6)
        # next batch: the leading n_reuse lanes are the reused elites —
        # identical under different keys, equal to their re-synthesis, and
        # the remaining lanes are fresh (key-dependent) exploration
        xs_a, _ = fam.sample(state, jax.random.key(1), 16)
        xs_b, _ = fam.sample(state, jax.random.key(2), 16)
        np.testing.assert_allclose(np.asarray(xs_a[:3]),
                                   np.asarray(xs_b[:3]), atol=1e-6)
        expect_actions = fam.synth(state, expect_shift)
        np.testing.assert_allclose(np.asarray(xs_a[:3]),
                                   np.asarray(expect_actions), atol=1e-5)

    def test_icem_on_episodic_gaussian(self):
        """iCem on the plain episodic Gaussian (run_opt's family; r3 fuzz
        found this crashed — no particle support). Elites are stored and
        reappear in the next batch through the same base-lane injection as
        the matrix families (reference: ppi/samplers.py:93-98)."""
        from ppi_tpu.policies.gaussian import Gaussian
        from ppi_tpu.samplers import SamplerKind
        fam = Gaussian(dim=3, sampler=SamplerKind.PARTICLES, max_particles=3)
        state = fam.init(jnp.zeros(3), jnp.eye(3))
        _, params = fam.sample(state, jax.random.key(0), 16)
        solver = algorithms.iCem(n_elites=10)  # n_reuse = 3
        elite_rows = [5, 9, 1]
        costs = 10.0 + jnp.arange(16.0)
        for rank, row in enumerate(elite_rows):
            costs = costs.at[row].set(float(rank))
        c, v, lv = mask_costs(costs)
        state, _ = solver.update(fam, state, Batch(c, params, v, lv))
        assert int(state.n_particles) == 3
        np.testing.assert_allclose(np.asarray(state.particles),
                                   np.asarray(params[jnp.array(elite_rows)]),
                                   atol=1e-6)
        # leading lanes of the next batch are key-independent and equal the
        # re-transformed elites (mu + particle @ chol.T, the same quirky
        # base-space injection the reference uses)
        xs_a, _ = fam.sample(state, jax.random.key(1), 16)
        xs_b, _ = fam.sample(state, jax.random.key(2), 16)
        np.testing.assert_allclose(np.asarray(xs_a[:3]),
                                   np.asarray(xs_b[:3]), atol=1e-6)
        expect = state.mu[None, :] + state.particles @ state.chol.T
        np.testing.assert_allclose(np.asarray(xs_a[:3]), np.asarray(expect),
                                   atol=1e-5)
        assert float(jnp.abs(xs_a[3:] - xs_b[3:]).max()) > 1e-3


class TestLoopParity:
    def test_host_loop_matches_scan(self):
        solver = algorithms.Mppi(alpha=10.0)
        fam = Gaussian(dim=3)
        state0 = fam.init(jnp.ones(3), 0.3 * jnp.eye(3))
        f = NoisySphere(dim=3)
        key = jax.random.key(7)
        s1, t1 = solve_scan(solver, fam, state0, f, key, 64, 10)
        s2, t2 = solve(solver, fam, state0, f, key, 64, 10)
        np.testing.assert_allclose(np.asarray(s1.mu), np.asarray(s2.mu),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(t1["mean"]),
                                   np.asarray(t2["mean"]), rtol=1e-4)

    def test_callback_early_stop(self):
        solver = algorithms.Mppi(alpha=10.0)
        fam = Gaussian(dim=3)
        state0 = fam.init(jnp.ones(3), 0.3 * jnp.eye(3))
        calls = []

        def cb(i, f, actions, costs, state):
            calls.append(i)
            return i >= 2

        _, trace = solve(solver, fam, state0, NoisySphere(dim=3),
                         jax.random.key(0), 32, 10, callback=cb)
        assert calls == [0, 1, 2]
        assert trace["mean"].shape[0] == 3

    def test_trace_keys_match_reference_telemetry(self):
        # the trace must expose the reference's telemetry channels
        solver = algorithms.Reps(epsilon=1.0)
        fam, state, trace = run_solver(solver, n_iters=3)
        for key in ["mean", "std", "ess", "kl", "alpha", "ent"]:
            assert key in trace, key
            assert trace[key].shape[0] == 3
