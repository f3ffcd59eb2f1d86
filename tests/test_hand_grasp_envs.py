"""pen-v0-hand and relocate-v0-hand: the enriched dexterous embodiments on
the shared digit builder (VERDICT r2 next #2; reference: run_mpc.py:41-42 +
mj_envs task semantics).

CPU tests use engine="tensor" (the scalar-SoA graph compiles superlinearly
in DoF on the CPU backend); MPC-success runs live on TPU (test_perf.py and
RESULTS.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from ppi_tpu.envs.base import batch_rollout, rollout
from ppi_tpu.envs.pen import HOLD_POS
from ppi_tpu.envs.pen_hand import PenHand, scripted_reorient
from ppi_tpu.envs.relocate import BALL_RADIUS, TABLE_Z
from ppi_tpu.envs.relocate_hand import RelocateHand, scripted_carry


class TestPenHand:
    def test_stays_finite_under_random_actions(self):
        env = PenHand(engine="tensor")
        s0 = env.reset(jax.random.key(0))
        base = s0.physics.qpos[5:]
        acts = base[None, None, :] + 0.5 * jax.random.normal(
            jax.random.key(1), (6, 30, 6))
        _, rew = batch_rollout(env, s0, acts)
        assert np.isfinite(np.asarray(rew)).all()

    def test_pen_holds_position_untouched(self):
        env = PenHand(engine="tensor")
        s0 = env.reset(jax.random.key(0))
        acts = jnp.tile(s0.physics.qpos[5:][None], (50, 1))
        sf, _ = rollout(env, s0, acts)
        centre, axis = env._pen_pose(sf.physics.qpos)
        assert float(jnp.linalg.norm(centre - jnp.asarray(HOLD_POS))) < 0.03
        assert float(axis[0]) > 0.99

    def test_goals_sampled_per_episode(self):
        env = PenHand(engine="tensor")
        a1 = env.reset(jax.random.key(1)).target_axis
        a2 = env.reset(jax.random.key(2)).target_axis
        assert float(jnp.linalg.norm(a1 - a2)) > 1e-3

    def test_scripted_reorientation_substantial(self):
        """The feasibility oracle: the closed-loop digit controller
        substantially reorients the pen toward the fixed goal through real
        contacts without dropping it (full alignment is the MPC's job —
        the canonical LBPS config reaches Success: True on TPU)."""
        env = PenHand(engine="tensor", fixed_goal=True)
        s0 = env.reset(jax.random.key(0))
        _, ax0 = env._pen_pose(s0.physics.qpos)
        sim0 = float(jnp.dot(ax0, s0.target_axis))
        _, info = scripted_reorient(env, s0)
        assert info["max_similarity"] > sim0 + 0.05
        assert info["final_similarity"] > 0.85
        assert not info["dropped"]


class TestRelocateHand:
    def test_stays_finite_under_random_actions(self):
        env = RelocateHand(engine="tensor")
        s0 = env.reset(jax.random.key(0))
        base = s0.physics.qpos[:10]
        acts = base[None, None, :] + 0.4 * jax.random.normal(
            jax.random.key(1), (6, 30, 10))
        _, rew = batch_rollout(env, s0, acts)
        assert np.isfinite(np.asarray(rew)).all()

    def test_ball_rests_on_table(self):
        env = RelocateHand(engine="tensor")
        s0 = env.reset(jax.random.key(0))
        acts = jnp.tile(s0.physics.qpos[:10][None], (40, 1))
        sf, _ = rollout(env, s0, acts)
        _, _, ball = env._sites(sf.physics.qpos)
        assert abs(float(ball[2]) - (TABLE_Z + BALL_RADIUS)) < 0.012

    def test_goals_sampled_per_episode(self):
        env = RelocateHand(engine="tensor")
        t1 = env.reset(jax.random.key(1)).target
        t2 = env.reset(jax.random.key(2)).target
        assert float(jnp.linalg.norm(t1 - t2)) > 1e-3

    def test_ball_start_sampled_per_episode(self):
        from ppi_tpu.envs.relocate import START_RANGE
        env = RelocateHand(engine="tensor")
        o1 = np.asarray(env.reset(jax.random.key(1)).physics.qpos)[10:12]
        o2 = np.asarray(env.reset(jax.random.key(2)).physics.qpos)[10:12]
        assert np.linalg.norm(o1 - o2) > 1e-4
        assert (np.abs(np.r_[o1, o2]) <= START_RANGE + 1e-6).all()
        fixed = RelocateHand(engine="tensor", fixed_goal=True)
        np.testing.assert_allclose(
            np.asarray(fixed.reset(jax.random.key(3)).physics.qpos)[10:12],
            0.0)

    def test_scripted_digit_grasp_and_carry_succeeds(self):
        """The feasibility oracle: basket-curl the three digits under the
        ball, lift through the carry waypoints, land within the success
        radius of the in-air goal — the digit-grasp analogue of the
        caging-gripper scripted test in test_grasp_envs.py."""
        env = RelocateHand(engine="tensor", fixed_goal=True)
        s0 = env.reset(jax.random.key(0))
        sf, info = scripted_carry(env, s0)
        assert info["success"], f"ball-target dist {info['dist']:.3f}"
        _, _, ball = env._sites(sf.physics.qpos)
        assert float(ball[2]) > TABLE_Z + BALL_RADIUS + 0.1
