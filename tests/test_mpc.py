"""End-to-end MPC tests on the analytic environments: the minimum full-stack
slice (policy -> solver -> batched rollouts -> receding-horizon loop),
SURVEY.md §7 Milestone B."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppi_tpu.algorithms import make_solver
from ppi_tpu.envs.base import batch_rollout, mpc_objective, rollout
from ppi_tpu.envs.classic import Cartpole, Pendulum
from ppi_tpu.mpc import Mpc, fft_smoothness, signal_power
from ppi_tpu.policies import design_moments, make_policy


def make_agent(env, policy_name="WhiteNoiseIid", solver_name="Mppi",
               horizon=20, timesteps=60, n_samples=64, **kw):
    t_seq = env.dt * jnp.arange(horizon)
    mean, cov_in, cov_out = design_moments(env.action_low, env.action_high,
                                           ratio=1000.0)
    pol_kw = dict(lower=env.action_low, upper=env.action_high)
    if policy_name in ("SquaredExponentialKernel",):
        pol_kw["lengthscale"] = 4 * env.dt
    if kw.get("sampler"):
        pol_kw["sampler"] = kw.pop("sampler")
    if kw.get("max_particles"):
        pol_kw["max_particles"] = kw.pop("max_particles")
    fam, pol = make_policy(policy_name, t_seq, env.action_dim, mean, cov_in,
                           cov_out, **pol_kw)
    solver = make_solver(solver_name, alpha=10.0, n_elites=10, epsilon=1.0,
                         delta=0.9)
    agent = Mpc(env=env, solver=solver, family=fam, timesteps=timesteps,
                horizon=horizon, n_samples=n_samples, **kw)
    return agent, pol


class TestRollout:
    def test_rollout_shapes(self):
        env = Pendulum()
        s0 = env.reset(jax.random.key(0))
        acts = jnp.zeros((15, 1))
        final, rewards = rollout(env, s0, acts)
        assert rewards.shape == (15,)
        assert int(final.t) == 15

    def test_batch_rollout_vmaps(self):
        env = Pendulum()
        s0 = env.reset(jax.random.key(0))
        acts = 0.1 * jax.random.normal(jax.random.key(1), (8, 15, 1))
        _, rewards = batch_rollout(env, s0, acts)
        assert rewards.shape == (8, 15)

    def test_divergence_poisons_own_lane_only(self):
        env = Pendulum()
        s0 = env.reset(jax.random.key(0))
        acts = jnp.zeros((4, 10, 1))
        # lane 2 gets NaN actions -> NaN state -> NaN rewards in lane 2 only
        acts = acts.at[2].set(jnp.nan)
        f = mpc_objective(env, s0)
        costs = f(None, acts)
        assert np.isnan(np.asarray(costs)[2])
        assert np.isfinite(np.asarray(costs)[[0, 1, 3]]).all()

    def test_horizon_mask_zeroes_tail(self):
        env = Pendulum()
        s0 = env.reset(jax.random.key(0))
        acts = jnp.zeros((2, 10, 1))
        mask = jnp.ones(10).at[5:].set(0.0)
        full = mpc_objective(env, s0)(None, acts)
        masked = mpc_objective(env, s0, mask)(None, acts)
        assert float(masked[0]) != float(full[0])
        _, rewards = batch_rollout(env, s0, acts)
        np.testing.assert_allclose(np.asarray(masked),
                                   -np.asarray(rewards[:, :5]).sum(1),
                                   rtol=1e-5)


class TestMpcPendulum:
    @pytest.mark.parametrize("policy,solver,warm", [
        ("WhiteNoiseIid", "Mppi", 0),
        ("ColouredNoise", "Mppi", 0),
        # weaker/greedier solvers need the reference's warm start
        # (run_mpc.py default: 50 warm-start iterations)
        ("SquaredExponentialKernel", "Lbps", 30),
        ("WhiteNoiseIid", "Cem", 30),
    ])
    def test_swing_up(self, policy, solver, warm):
        env = Pendulum()
        agent, pol = make_agent(env, policy, solver)
        carry = agent.init(pol, jax.random.key(0))
        es = env.reset(jax.random.key(1))
        if warm:
            carry, _ = agent.warm_start(carry, es, n_iters=warm)
        carry, es, track = agent.run_episode_scan(carry, es, collect=False)
        rewards = np.asarray(track["reward"])
        # swing-up: final reward near 0 (upright), far better than start
        assert rewards[-5:].mean() > -1.0, rewards[-5:]
        assert rewards[-5:].mean() > rewards[:5].mean() + 5.0

    def test_episode_scan_matches_host_loop(self):
        env = Pendulum()
        agent, pol = make_agent(env, timesteps=10)
        carry = agent.init(pol, jax.random.key(0))
        es = env.reset(jax.random.key(1))
        _, _, t1 = agent.run_episode_scan(carry, es, collect=False)
        _, _, t2 = agent.run_episode(carry, es)
        np.testing.assert_allclose(np.asarray(t1["reward"]),
                                   np.asarray(t2["reward"]), atol=1e-4)

    def test_warm_start_improves_initial_plan(self):
        env = Pendulum()
        agent, pol = make_agent(env, solver_name="Reps", timesteps=40)
        carry = agent.init(pol, jax.random.key(0))
        es = env.reset(jax.random.key(1))
        carry2, trace = agent.warm_start(carry, es, n_iters=30)
        assert float(trace["mean"][-1]) < float(trace["mean"][0])

    def test_icem_with_particle_reuse(self):
        env = Pendulum()
        agent, pol = make_agent(env, "ColouredNoise", "iCem",
                                sampler="Particles", max_particles=4,
                                use_map=True, timesteps=40)
        carry = agent.init(pol, jax.random.key(0))
        es = env.reset(jax.random.key(1))
        carry, _ = agent.warm_start(carry, es, n_iters=30)
        carry, es, track = agent.run_episode_scan(carry, es, collect=False)
        rewards = np.asarray(track["reward"])
        assert rewards[-5:].mean() > rewards[:5].mean() + 3.0


class TestMpcCartpole:
    def test_swing_up_cartpole(self):
        env = Cartpole()
        agent, pol = make_agent(env, "ColouredNoise", "Mppi", horizon=40,
                                timesteps=120, n_samples=128)
        carry = agent.init(pol, jax.random.key(0))
        es = env.reset(jax.random.key(1))
        carry, es, track = agent.run_episode_scan(carry, es, collect=False)
        rewards = np.asarray(track["reward"])
        # upright-ish at the end: cos(theta) near 1
        assert rewards[-10:].mean() > 0.5, rewards[-10:]


class TestUnroll:
    def test_unrolled_control_step_matches(self):
        """The scan-unroll latency lever (studies/adroit_latency.py) is a
        pure scheduling choice: the control step's action must agree with
        the unroll=1 program to fp tolerance (fusion may reassociate)."""
        env = Pendulum()
        agent1, pol = make_agent(env, "SquaredExponentialKernel", "Lbps")
        agent4, _ = make_agent(env, "SquaredExponentialKernel", "Lbps",
                               unroll=4)
        carry = agent1.init(pol, jax.random.key(0))
        es = env.reset(jax.random.key(1))
        a1, c1, _ = agent1.control_step(carry, es, jnp.zeros((), jnp.int32))
        a4, c4, _ = agent4.control_step(carry, es, jnp.zeros((), jnp.int32))
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a4),
                                   rtol=1e-5, atol=1e-6)
        m1 = agent1.family.predict_mean(c1.policy)
        m4 = agent4.family.predict_mean(c4.policy)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m4),
                                   rtol=1e-4, atol=1e-5)


class TestMetrics:
    def test_smoothness_orders_signals(self):
        dt = 0.05
        t = np.arange(200) * dt
        # offset keeps the action-norm from rectifying the sinusoid
        slow = np.stack([2.0 + np.sin(2 * np.pi * 0.5 * t)], 1)
        fast = np.stack([2.0 + np.sin(2 * np.pi * 5.0 * t)], 1)
        sm_slow, *_ = fft_smoothness(jnp.array(slow), dt)
        sm_fast, *_ = fft_smoothness(jnp.array(fast), dt)
        assert float(sm_fast) > 5 * float(sm_slow)

    def test_signal_power(self):
        a = jnp.ones((50, 2))
        assert float(signal_power(a)) == pytest.approx(np.sqrt(2.0), rel=1e-5)


class TestMapActionExtraction:
    def test_use_map_with_feature_policy(self):
        """iCEM's MAP action extraction must work for weight-space (feature)
        policies too — the MAP is mapped through the basis."""
        env = Pendulum()
        t_seq = env.dt * jnp.arange(15)
        mean, ci, co = design_moments(env.action_low, env.action_high, 1000.0)
        fam, pol = make_policy("RffFeatures", t_seq, 1, mean, ci, co,
                               order=6, lengthscale=0.3, sampler="Particles",
                               max_particles=3, lower=env.action_low,
                               upper=env.action_high)
        from ppi_tpu.algorithms import make_solver
        agent = Mpc(env=env, solver=make_solver("iCem", n_elites=10),
                    family=fam, timesteps=10, horizon=15, n_samples=32,
                    use_map=True)
        carry = agent.init(pol, jax.random.key(0))
        es = env.reset(jax.random.key(1))
        action, carry, _ = agent.control_step(carry, es, jnp.asarray(0))
        assert np.isfinite(np.asarray(action)).all()
        # within actuator bounds
        assert float(jnp.abs(action[0])) <= float(env.action_high[0]) + 1e-6


class TestResumableEpisode:
    """Mid-episode checkpoint/resume (VERDICT r3 next #8): the chunked
    episode loop equals the single-scan episode, and a kill-and-resume
    from a serialized checkpoint reproduces the interrupted run's tail."""

    def test_chunked_equals_scan_and_resume_is_exact(self, tmp_path):
        env = Pendulum()
        agent, pol = make_agent(env, timesteps=18, horizon=10, n_samples=16)
        carry0 = agent.init(pol, jax.random.key(0))
        es0 = env.reset(jax.random.key(1))

        _, _, tr_scan = agent.run_episode_scan(carry0, es0, collect=False)

        snap = {}

        def on_chunk(t, c, es, tracks):
            if t == 12:
                snap.update(t=t, carry=c, es=es)

        _, ef_a, tr_full = agent.run_episode_resumable(
            carry0, es0, chunk=6, on_chunk=on_chunk)
        # chunked == one-scan episode (same per-step program)
        np.testing.assert_allclose(np.asarray(tr_full["reward"]),
                                   np.asarray(tr_scan["reward"]),
                                   rtol=1e-5, atol=1e-5)

        # kill-and-resume: serialize the t=12 snapshot through the real
        # checkpoint format, restore into fresh pytrees, continue
        from ppi_tpu.utils import load_checkpoint, save_checkpoint
        path = tmp_path / "ck.npz"
        save_checkpoint(path, (snap["carry"], snap["es"]), step=snap["t"])
        (carry_r, es_r), t_r = load_checkpoint(path, (carry0, es0))
        assert t_r == 12
        _, ef_b, tr_tail = agent.run_episode_resumable(
            carry_r, es_r, start=t_r, chunk=6)
        # the resumed tail is the SAME program on the SAME inputs:
        # bitwise-equal rewards and identical final state
        np.testing.assert_array_equal(np.asarray(tr_tail["reward"]),
                                      np.asarray(tr_full["reward"][12:]))
        np.testing.assert_array_equal(np.asarray(ef_b.qpos),
                                      np.asarray(ef_a.qpos))
