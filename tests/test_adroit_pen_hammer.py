"""pen-v0-adroit and hammer-v0-adroit: the r4 completions of the
four-task dexterous coverage on the five-digit Adroit-class hand
(reference: run_mpc.py:36-48 + the mj_envs 24-30-DoF Adroit hand).

CPU tests use engine="tensor" (the stacked path's whole-graph compile is
device-scale); stacked-vs-tensor agreement and grasp/feasibility e2e
live in the opt-in slow tier / on device, as tests/test_adroit_envs.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppi_tpu.envs.base import batch_rollout, rollout
from ppi_tpu.envs.hammer_adroit import HammerAdroit
from ppi_tpu.envs.hammer_adroit import N_ACT as HAM_N_ACT
from ppi_tpu.envs.pen_adroit import PenAdroit
from ppi_tpu.envs.pen_adroit import N_ACT as PEN_N_ACT


class TestPenAdroit:
    def test_stays_finite_under_random_actions(self):
        env = PenAdroit(engine="tensor")
        s0 = env.reset(jax.random.key(0))
        acts = 0.4 * jax.random.normal(jax.random.key(1),
                                       (6, 25, PEN_N_ACT))
        _, rew = batch_rollout(env, s0, acts)
        assert np.isfinite(np.asarray(rew)).all()

    def test_pen_rests_in_cradle_untouched(self):
        """Holding the reset digit posture, the compliant pen must stay
        near the hold point (the cradle + hold springs carry it)."""
        from ppi_tpu.envs.pen import HOLD_POS
        env = PenAdroit(engine="tensor")
        s0 = env.reset(jax.random.key(0))
        hold = s0.physics.qpos[5:5 + PEN_N_ACT]
        acts = jnp.tile(hold[None], (50, 1))
        sf, _ = rollout(env, s0, acts)
        centre, _ = env._pen_pose(sf.physics.qpos)
        assert float(jnp.linalg.norm(centre - jnp.asarray(HOLD_POS))) < 0.1

    def test_goal_sampled_per_episode(self):
        env = PenAdroit(engine="tensor")
        g1 = env.reset(jax.random.key(1)).target_axis
        g2 = env.reset(jax.random.key(2)).target_axis
        assert float(jnp.linalg.norm(g1 - g2)) > 1e-3
        np.testing.assert_allclose(float(jnp.linalg.norm(g1)), 1.0,
                                   rtol=1e-5)

    def test_five_digits_present(self):
        """15 actuated DoF: 5 x (ABD, MCP, PIP); 10 rod contact pairs."""
        env = PenAdroit(engine="tensor")
        assert env.action_dim == 15
        assert len(env._model.pair_sphere_segment) == 10

    def test_similarity_rewards_alignment(self):
        """Reward increases when the pen axis aligns with the goal (the
        mj_envs pen-v0 shaping), all else equal."""
        env = PenAdroit(engine="tensor", fixed_goal=True)
        s0 = env.reset(jax.random.key(0))
        hold = s0.physics.qpos[5:5 + PEN_N_ACT]
        _, r_aligned = env.step(s0, hold)
        tilted = s0.replace(physics=s0.physics.replace(
            qpos=s0.physics.qpos.at[4].set(1.2)))
        _, r_tilted = env.step(tilted, hold)
        assert float(r_aligned) > float(r_tilted)


class TestHammerAdroit:
    def test_stays_finite_under_random_actions(self):
        env = HammerAdroit(engine="tensor")
        s0 = env.reset(jax.random.key(0))
        base = s0.physics.qpos[:HAM_N_ACT]
        acts = base[None, None, :] + 0.4 * jax.random.normal(
            jax.random.key(1), (6, 25, HAM_N_ACT))
        _, rew = batch_rollout(env, s0, acts)
        assert np.isfinite(np.asarray(rew)).all()

    def test_hammer_rests_nail_unset_untouched(self):
        """Holding the hover posture: the free hammer settles on the
        bench, the friction-held nail does not move by gravity."""
        from ppi_tpu.envs.hammer_adroit import HAM_Z, NAIL
        env = HammerAdroit(engine="tensor")
        s0 = env.reset(jax.random.key(0))
        acts = jnp.tile(s0.physics.qpos[:HAM_N_ACT][None], (50, 1))
        sf, _ = rollout(env, s0, acts)
        assert abs(float(sf.physics.qpos[HAM_Z])) < 0.05
        assert float(sf.physics.qpos[NAIL]) < 1e-3
        assert not bool(env.success(sf))

    def test_scene_sampled_per_episode(self):
        env = HammerAdroit(engine="tensor")
        b1 = env.reset(jax.random.key(1)).board
        b2 = env.reset(jax.random.key(2)).board
        assert float(jnp.linalg.norm(b1 - b2)) > 1e-4
        fixed = HammerAdroit(engine="tensor", fixed_scene=True)
        from ppi_tpu.envs.hammer_hand import BOARD_POS
        np.testing.assert_allclose(
            np.asarray(fixed.reset(jax.random.key(3)).board), BOARD_POS)

    def test_five_digits_present(self):
        """21 actuated DoF; palm + ten digit spheres grasp the handle."""
        env = HammerAdroit(engine="tensor")
        assert env.action_dim == 21
        # 11 handle pairs + head-nail strike pair
        assert len(env._model.pair_sphere_segment) >= 12

    def test_digit_cage_passes_under_handle(self):
        """The r5 geometry fix: at the full power wrap (MCP -0.9 /
        PIP -1.9) the finger KNEE spheres reach below the handle
        centreline (palm_r + handle_r = 0.038 under the plate) — the
        cage is geometric, not friction-only (the pre-fix 0.05/0.045
        digits bottomed out ~0.006 under the plate and shed the hammer
        under any arm acceleration)."""
        env = HammerAdroit(engine="tensor", fixed_scene=True)
        from ppi_tpu.envs.hammer_adroit import _grip
        s0 = env.reset(jax.random.key(0))
        cmd = _grip(s0.physics.qpos[:HAM_N_ACT], 0.9, 1.9)
        qpos = s0.physics.qpos.at[:HAM_N_ACT].set(
            jnp.clip(cmd, env.action_low, env.action_high))
        pts = env._sites_soa(qpos, s0.board)
        import numpy as np
        palm = np.asarray(pts[env._palm_geom])
        # knee spheres are digit geom indices 1, 4, 7, 10 (per-finger
        # [prox, knee, tip] triples; thumb at 13)
        knees = np.stack([np.asarray(pts[env._digit_geoms[i]])
                          for i in (1, 4, 7, 10)])
        handle_center_z = palm[2] - 0.018 - 0.020  # palm_r + handle_r
        r_knee = 0.016
        assert (knees[:, 2] - r_knee < handle_center_z).all(), (
            knees[:, 2], handle_center_z)

    def test_knockaway_gate_prices_stray_grip(self):
        """A hammer batted outside the reachable annulus costs
        knockaway_penalty per metre (the grasp-integrity gate)."""
        from ppi_tpu.envs.hammer_adroit import HAM_X
        env = HammerAdroit(engine="tensor", fixed_scene=True)
        s0 = env.reset(jax.random.key(0))
        hold = s0.physics.qpos[:HAM_N_ACT]
        far = s0.replace(physics=s0.physics.replace(
            qpos=s0.physics.qpos.at[HAM_X].set(0.6)))
        _, r_in = env.step(s0, hold)
        _, r_out = env.step(far, hold)
        assert float(r_in) > float(r_out)


@pytest.mark.slow
class TestStackedTensorAgreement:
    """The stacked path (the deployment engine) agrees with the tensor
    oracle on short trajectories — same standard as
    tests/test_adroit_envs.py's slow-tier agreement tests."""

    @pytest.mark.parametrize("make", [
        lambda e: PenAdroit(engine=e),
        lambda e: HammerAdroit(engine=e),
    ])
    def test_engines_agree(self, make):
        env_t = make("tensor")
        env_s = make("stacked")
        s0 = env_t.reset(jax.random.key(0))
        acts = jnp.tile(s0.physics.qpos[None, -env_t.action_dim:] * 0.0,
                        (10, 1))
        if isinstance(env_t, HammerAdroit):
            acts = jnp.tile(s0.physics.qpos[None, :env_t.action_dim],
                            (10, 1))
        sf_t, rew_t = rollout(env_t, s0, acts)
        sf_s, rew_s = rollout(env_s, s0, acts)
        np.testing.assert_allclose(np.asarray(sf_s.physics.qpos),
                                   np.asarray(sf_t.physics.qpos),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(rew_s), np.asarray(rew_t),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.slow
class TestHammerAdroitOracle:
    """Feasibility oracle for the five-digit power wrap (r5): cage the
    free hammer, lift, carry to the board, and seat the nail by
    press-drive (the nail's resistance is a dry-friction bound, so a
    sustained head press drives it; wide arcs shed the aft-stop-less
    wrap — measured across 10+ scripted variants). Pinned to the
    canonical scene; the raised-board regime stays MPC's distribution
    claim, as for hammer_hand's oracle."""

    def test_scripted_power_grip_seats_nail(self):
        from ppi_tpu.envs.hammer_adroit import scripted_hammer_adroit
        from ppi_tpu.envs.hammer_hand import NAIL_DEPTH
        env = HammerAdroit(engine="tensor", fixed_scene=True)
        msgs = []
        state, info = scripted_hammer_adroit(env, log=msgs.append)
        assert info["success"], (info, msgs)
        assert info["nail"] > 0.95 * NAIL_DEPTH
        # the carry phase must actually hold the hammer aloft
        assert any("carried" in m and float(m.split("ham_z=")[1]) > 0.1
                   for m in msgs), msgs
