"""door-v0-adroit and relocate-v0-adroit: the five-digit, 21-actuated-DoF
Adroit-class embodiments (VERDICT r3 next #1; reference: run_mpc.py:36-48 +
the mj_envs 24-30-DoF Adroit hand).

CPU tests use engine="tensor" (the stacked path's whole-graph compile is
device-scale); the stacked-vs-tensor agreement and scripted-oracle e2e
tests are in the opt-in slow tier. MPC-success runs live on TPU
(RESULTS.md + results/goals/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppi_tpu.envs.base import batch_rollout, rollout
from ppi_tpu.envs.door_adroit import DoorAdroit
from ppi_tpu.envs.door_adroit import N_ACT as DOOR_N_ACT
from ppi_tpu.envs.relocate import BALL_RADIUS, TABLE_Z
from ppi_tpu.envs.relocate_adroit import N_ACT, RelocateAdroit


class TestDoorAdroit:
    def test_stays_finite_under_random_actions(self):
        env = DoorAdroit(engine="tensor")
        s0 = env.reset(jax.random.key(0))
        base = s0.physics.qpos[:DOOR_N_ACT]
        acts = base[None, None, :] + 0.4 * jax.random.normal(
            jax.random.key(1), (6, 30, DOOR_N_ACT))
        _, rew = batch_rollout(env, s0, acts)
        assert np.isfinite(np.asarray(rew)).all()

    def test_door_stays_shut_untouched(self):
        env = DoorAdroit(engine="tensor")
        s0 = env.reset(jax.random.key(0))
        acts = jnp.tile(s0.physics.qpos[:DOOR_N_ACT][None], (40, 1))
        sf, _ = rollout(env, s0, acts)
        from ppi_tpu.envs.door_adroit import DOOR
        # bolted: the seal spring pushes but the latch bolt holds
        assert float(sf.physics.qpos[DOOR]) <= env.bolt_depth + 1e-3
        assert not bool(env.success(sf))

    def test_scene_sampled_per_episode(self):
        env = DoorAdroit(engine="tensor")
        f1 = env.reset(jax.random.key(1)).frame
        f2 = env.reset(jax.random.key(2)).frame
        assert float(jnp.linalg.norm(f1 - f2)) > 1e-3
        fixed = DoorAdroit(engine="tensor", fixed_scene=True)
        from ppi_tpu.envs.door_hand import FRAME
        np.testing.assert_allclose(
            np.asarray(fixed.reset(jax.random.key(3)).frame), FRAME)

    def test_five_digits_present(self):
        """21 actuated DoF: 4 arm + 2 wrist + 5 x (ABD, MCP, PIP)."""
        env = DoorAdroit(engine="tensor")
        assert env.action_dim == 21
        assert env.action_low.shape == (21,)
        # ten digit spheres + palm participate in handle contacts
        assert len(env._model.pair_sphere_segment) >= 11

    @pytest.mark.slow
    def test_scripted_open_succeeds(self):
        """Feasibility oracle: press-latch-then-sweep opens the door
        through the five-digit hand (the door_hand.scripted_open strategy
        re-derived for the 2-DoF-wrist kinematics)."""
        from ppi_tpu.envs.door_adroit import scripted_open
        env = DoorAdroit(engine="tensor", fixed_scene=True)
        _, info = scripted_open(env)
        assert info["success"], f"door angle {info['door']:.3f}"


class TestRelocateAdroit:
    def test_stays_finite_under_random_actions(self):
        env = RelocateAdroit(engine="tensor")
        s0 = env.reset(jax.random.key(0))
        base = s0.physics.qpos[:N_ACT]
        acts = base[None, None, :] + 0.4 * jax.random.normal(
            jax.random.key(1), (6, 30, N_ACT))
        _, rew = batch_rollout(env, s0, acts)
        assert np.isfinite(np.asarray(rew)).all()

    def test_ball_rests_on_table(self):
        env = RelocateAdroit(engine="tensor")
        s0 = env.reset(jax.random.key(0))
        acts = jnp.tile(s0.physics.qpos[:N_ACT][None], (40, 1))
        sf, _ = rollout(env, s0, acts)
        _, _, ball = env._sites(sf.physics.qpos)
        assert abs(float(ball[2]) - (TABLE_Z + BALL_RADIUS)) < 0.012

    def test_reset_palm_hovers_ball(self):
        """The level palm caps the nominal ball start: centred in x/y,
        palm bottom ~1 cm above the ball top (the measured hover of the
        working relocate_hand tripod; a 6 mm x-offset steadily squirts
        the ball out during the grip)."""
        env = RelocateAdroit(engine="tensor", fixed_goal=True)
        s0 = env.reset(jax.random.key(0))
        palm, _, ball = env._sites(s0.physics.qpos)
        assert abs(float(palm[0] - ball[0])) < 0.01
        assert abs(float(palm[1] - ball[1])) < 0.02
        gap = float(palm[2] - ball[2])  # centre-to-centre
        assert 0.05 < gap < 0.09

    def test_goals_and_starts_sampled(self):
        from ppi_tpu.envs.relocate import START_RANGE
        env = RelocateAdroit(engine="tensor")
        s1 = env.reset(jax.random.key(1))
        s2 = env.reset(jax.random.key(2))
        assert float(jnp.linalg.norm(s1.target - s2.target)) > 1e-3
        o1 = np.asarray(s1.physics.qpos)[N_ACT:N_ACT + 2]
        o2 = np.asarray(s2.physics.qpos)[N_ACT:N_ACT + 2]
        assert np.linalg.norm(o1 - o2) > 1e-4
        assert (np.abs(np.r_[o1, o2]) <= START_RANGE + 1e-6).all()

    @pytest.mark.slow
    def test_scripted_carry_succeeds(self):
        """Feasibility oracle: five-digit basket grasp + droop-compensated
        IK waypoint carry lands the ball at the in-air goal."""
        from ppi_tpu.envs.relocate_adroit import scripted_carry
        env = RelocateAdroit(engine="tensor", fixed_goal=True)
        sf, info = scripted_carry(env)
        assert info["success"], f"ball-target dist {info['dist']:.3f}"
        _, _, ball = env._sites(sf.physics.qpos)
        assert float(ball[2]) > TABLE_Z + BALL_RADIUS + 0.1
