"""Engine-backed task environments: reacher and the door-v0-class task."""

import jax
import jax.numpy as jnp
import numpy as np

from ppi_tpu.algorithms import make_solver
from ppi_tpu.envs.base import batch_rollout
from ppi_tpu.envs.door import DOOR, LATCH, Door
from ppi_tpu.envs.reacher import Reacher
from ppi_tpu.mpc import Mpc
from ppi_tpu.policies import design_moments, make_policy


def mppi_agent(env, horizon, timesteps, n_samples, policy="ColouredNoise",
               alpha=5.0):
    mean, ci, co = design_moments(env.action_low, env.action_high,
                                  ratio=1000.0)
    fam, pol = make_policy(policy, env.dt * jnp.arange(horizon),
                           env.action_dim, mean, ci, co,
                           lower=env.action_low, upper=env.action_high)
    agent = Mpc(env=env, solver=make_solver("Mppi", alpha=alpha), family=fam,
                timesteps=timesteps, horizon=horizon, n_samples=n_samples)
    return agent, pol


class TestReacher:
    def test_rollout_finite(self):
        env = Reacher()
        s0 = env.reset(jax.random.key(0))
        acts = 0.5 * jax.random.normal(jax.random.key(1), (8, 25, 2))
        _, rew = batch_rollout(env, s0, acts)
        assert np.isfinite(np.asarray(rew)).all()

    def test_mpc_reaches_target(self):
        env = Reacher()
        agent, pol = mppi_agent(env, horizon=15, timesteps=50, n_samples=64,
                                policy="WhiteNoiseIid")
        carry = agent.init(pol, jax.random.key(0))
        es = env.reset(jax.random.key(1))
        carry, es, track = agent.run_episode_scan(carry, es, collect=False)
        tip = np.asarray(env.fingertip(es.physics.qpos))
        dist = np.linalg.norm(tip - np.asarray(es.target))
        assert dist < 0.08, dist


class TestDoor:
    def test_stays_finite_under_random_actions(self):
        env = Door()
        s0 = env.reset(jax.random.key(0))
        base = s0.physics.qpos[:4]
        acts = base[None, None, :] + 0.5 * jax.random.normal(
            jax.random.key(1), (8, 40, 4))
        _, rew = batch_rollout(env, s0, acts)
        assert np.isfinite(np.asarray(rew)).all()

    def test_door_locked_without_latch(self):
        # pushing the panel with the latch engaged must not open the door
        env = Door()
        s0 = env.reset(jax.random.key(0))
        # command the arm toward the door panel, wrist level
        target = jnp.array([0.4, 0.9, -0.3, 0.0])
        state, _ = jax.lax.scan(
            lambda s, _: env.step(s, target), s0, None, length=40)
        assert float(state.physics.qpos[DOOR]) < 0.15

    def test_mpc_presses_latch_and_opens_door(self):
        env = Door()
        agent, pol = mppi_agent(env, horizon=30, timesteps=150, n_samples=96)
        carry = agent.init(pol, jax.random.key(0))
        es = env.reset(jax.random.key(1))
        carry, _ = agent.warm_start(carry, es, n_iters=20)
        carry, es, track = agent.run_episode_scan(carry, es, collect=False)
        # the latch must have been pressed at some point and the door opened
        assert float(es.physics.qpos[DOOR]) > 0.5, es.physics.qpos
        r = np.asarray(track["reward"])
        assert r[-10:].mean() > r[:10].mean() + 1.0


class TestLocomotion:
    """Engine-backed locomotion/dexterity env family: finite dynamics under
    random torques (MPC-level behavior is exercised on TPU; see RESULTS.md)."""

    def test_cheetah_rollout_finite(self):
        from ppi_tpu.envs.cheetah import Cheetah
        env = Cheetah()
        s0 = env.reset(jax.random.key(0))
        acts = 15.0 * jax.random.normal(jax.random.key(1), (4, 30, 6))
        _, rew = batch_rollout(env, s0, acts)
        assert np.isfinite(np.asarray(rew)).all()

    def test_hopper_rollout_finite(self):
        from ppi_tpu.envs.hopper import Hopper
        env = Hopper()
        s0 = env.reset(jax.random.key(0))
        acts = 20.0 * jax.random.normal(jax.random.key(1), (4, 30, 3))
        _, rew = batch_rollout(env, s0, acts)
        assert np.isfinite(np.asarray(rew)).all()

    def test_finger_spinner_responds_to_contact(self):
        from ppi_tpu.envs.finger import FingerSpin
        env = FingerSpin()
        s0 = env.reset(jax.random.key(0))
        acts = 2.0 * jax.random.normal(jax.random.key(1), (8, 60, 2))
        fs, rew = batch_rollout(env, s0, acts)
        assert np.isfinite(np.asarray(rew)).all()
        # at least one random flick makes the spinner move
        assert np.abs(np.asarray(fs.physics.qvel[:, 2])).max() > 0.1


class TestHammer:
    def test_scripted_strikes_seat_the_nail(self):
        from ppi_tpu.envs.hammer import Hammer
        env = Hammer()
        s0 = env.reset(jax.random.key(0))

        def script(s, t):
            phase = (t % 25) / 25.0
            target = jnp.where(phase < 0.6,
                               jnp.array([0.0, 1.12, -1.51, -0.04]),
                               jnp.array([0.0, 0.3, -1.6, 0.9]))
            s, r = env.step(s, target)
            return s, s.physics.qpos[4]

        s, depth = jax.lax.scan(script, s0, jnp.arange(120))
        assert np.isfinite(np.asarray(depth)).all()
        assert bool(env.success(s)), float(depth.max())

    def test_nail_holds_without_impacts(self):
        from ppi_tpu.envs.hammer import Hammer
        env = Hammer()
        s0 = env.reset(jax.random.key(0))
        hold = s0.physics.qpos[:4]
        s, _ = jax.lax.scan(lambda s, _: env.step(s, hold), s0, None,
                            length=60)
        assert float(s.physics.qpos[4]) < 1e-3  # friction holds the nail


class TestFetchPush:
    def test_box_held_by_friction(self):
        from ppi_tpu.envs.push import FetchPush
        env = FetchPush()
        s0 = env.reset(jax.random.key(0))
        hold = s0.physics.qpos[:4]
        s, _ = jax.lax.scan(lambda s, _: env.step(s, hold), s0, None,
                            length=50)
        # the box must not creep without being touched
        assert float(jnp.abs(s.physics.qpos[4:]).max()) < 1e-3

    def test_rollout_finite(self):
        from ppi_tpu.envs.push import FetchPush
        env = FetchPush()
        s0 = env.reset(jax.random.key(0))
        base = s0.physics.qpos[:4]
        acts = base[None, None, :] + 0.6 * jax.random.normal(
            jax.random.key(1), (6, 40, 4))
        fs, rew = batch_rollout(env, s0, acts)
        assert np.isfinite(np.asarray(rew)).all()


class TestWalkerWalkVariant:
    def test_dm_control_reward_bounded_and_distinct(self):
        """walker~walk (dm_control tolerance shaping) vs walker2d (gym
        shaping) are distinct envs on the same embodiment
        (reference: run_mpc.py:37, 44)."""
        import jax
        from ppi_tpu.envs.walker import Walker, WalkerWalk

        gym_env, dmc_env = Walker(), WalkerWalk()
        s = dmc_env.reset(jax.random.key(0))
        acts = 10.0 * jax.random.normal(jax.random.key(1), (4, 30, 6))
        _, rew_dmc = batch_rollout(dmc_env, s, acts)
        _, rew_gym = batch_rollout(gym_env, gym_env.reset(jax.random.key(0)),
                                   acts)
        rew_dmc = np.asarray(rew_dmc)
        assert np.isfinite(rew_dmc).all()
        # dm_control rewards live in [0, 1]
        assert (rew_dmc >= 0.0).all() and (rew_dmc <= 1.0).all()
        # different shaping than the gym variant
        assert not np.allclose(rew_dmc, np.asarray(rew_gym))

    def test_tolerance_primitive(self):
        import jax.numpy as jnp
        from ppi_tpu.envs.walker import _tolerance

        assert float(_tolerance(jnp.asarray(1.5), 1.0, jnp.inf, 0.5)) == 1.0
        at_margin = float(_tolerance(jnp.asarray(0.5), 1.0, jnp.inf, 0.5))
        np.testing.assert_allclose(at_margin, 0.1, rtol=1e-5)
        far = float(_tolerance(jnp.asarray(-2.0), 1.0, jnp.inf, 0.5))
        assert far < 1e-3
