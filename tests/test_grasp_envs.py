"""pen-v0- and relocate-v0-class environments (the grasp-rich free-body
tasks; reference env zoo: run_mpc.py:41-42)."""

import jax
import jax.numpy as jnp
import numpy as np

from ppi_tpu.envs.base import batch_rollout, rollout
from ppi_tpu.envs.pen import HOLD_POS, PEN_HALF, Pen
from ppi_tpu.envs.relocate import BALL_RADIUS, TABLE_Z, Relocate


def _seg(target, n):
    return np.repeat(np.asarray(target, np.float32)[None, :], n, 0)


class TestRelocate:
    def test_stays_finite_under_random_actions(self):
        env = Relocate()
        s0 = env.reset(jax.random.key(0))
        base = s0.physics.qpos[:6]
        acts = base[None, None, :] + 0.4 * jax.random.normal(
            jax.random.key(1), (8, 30, 6))
        _, rew = batch_rollout(env, s0, acts)
        assert np.isfinite(np.asarray(rew)).all()

    def test_ball_rests_on_table(self):
        # with the arm held at reset, the free ball must sit on the table
        env = Relocate()
        s0 = env.reset(jax.random.key(0))
        acts = jnp.tile(s0.physics.qpos[:6][None], (40, 1))
        sf, _ = rollout(env, s0, acts)
        _, _, ball = env._sites(sf.physics.qpos)
        assert abs(float(ball[2]) - (TABLE_Z + BALL_RADIUS)) < 0.01

    def test_scripted_grasp_and_carry_succeeds(self):
        # feasibility: close the caging fingers, lift, carry to the in-air
        # target (the analogue of the reference's scripted-sine __main__
        # smoke test; reference: ball_in_a_cup.py:664-699)
        env = Relocate()
        s0 = env.reset(jax.random.key(0))
        q0 = np.asarray(s0.physics.qpos[:6])
        grip = [-0.5, 0.5]
        acts = jnp.asarray(np.concatenate([
            _seg(q0, 15),
            _seg(list(q0[:4]) + grip, 25),
            _seg([0.00, -0.45, 1.82, -1.40] + grip, 20),
            _seg([0.07, -0.60, 1.85, -1.28] + grip, 25),
            _seg([0.15, -0.75, 1.88, -1.15] + grip, 25),
            _seg([0.22, -0.87, 1.91, -1.05] + grip, 25),
            _seg([0.291, -1.20, 1.80, -0.75] + grip, 55),
        ]))
        sf, rew = rollout(env, s0, acts)
        assert np.isfinite(np.asarray(rew)).all()
        _, _, ball = env._sites(sf.physics.qpos)
        dist = float(jnp.linalg.norm(ball - env.target))
        assert bool(env.success(sf)), f"ball-target dist {dist:.3f}"
        # the ball must actually have been lifted off the table
        assert float(ball[2]) > TABLE_Z + BALL_RADIUS + 0.1


class TestPen:
    def test_stays_finite_under_random_actions(self):
        env = Pen()
        s0 = env.reset(jax.random.key(0))
        acts = 0.08 * jax.random.normal(jax.random.key(1), (8, 30, 4))
        _, rew = batch_rollout(env, s0, acts)
        assert np.isfinite(np.asarray(rew)).all()

    def test_pen_holds_position_untouched(self):
        # the grasp-compliance springs keep the pen at the hold point
        env = Pen()
        s0 = env.reset(jax.random.key(0))
        acts = jnp.tile(s0.physics.qpos[5:][None], (40, 1))
        sf, _ = rollout(env, s0, acts)
        centre, axis = env._pen_pose(sf.physics.qpos)
        assert float(jnp.linalg.norm(centre - jnp.asarray(HOLD_POS))) < 0.03
        assert float(axis[0]) > 0.99  # still level

    def test_closed_loop_reorientation(self):
        # a proportional fingertip controller substantially reorients the
        # pen toward the target axis (full alignment is the MPC's job)
        env = Pen()
        s0 = env.reset(jax.random.key(0))
        tgt = env._target_axis
        hold = jnp.asarray(HOLD_POS)

        def controller(s):
            c, ax = env._pen_pose(s.physics.qpos)
            delta = PEN_HALF * (tgt - ax)

            def tip_target(plane_dx):
                t = plane_dx / (ax[0] + 1e-6)
                rod_yz = (c - hold)[1:] + t * ax[1:]
                d_yz = (plane_dx / PEN_HALF) * delta[1:]
                mag = jnp.linalg.norm(d_yz) + 1e-9
                press = jnp.minimum(0.010, 2.0 * mag)
                return rod_yz - (d_yz / mag) * (0.027 - press)

            return jnp.concatenate([tip_target(0.06), tip_target(-0.06)])

        def body(s, _):
            s2, r = env.step(s, controller(s))
            c, ax = env._pen_pose(s2.physics.qpos)
            return s2, jnp.dot(ax, tgt)

        sf, sims = jax.lax.scan(body, s0, None, length=150)
        sim0 = float(jnp.dot(jnp.array([1.0, 0.0, 0.0]), tgt))
        assert float(sims[-1]) > 0.88 > sim0
        # and the pen was not dropped
        centre, _ = env._pen_pose(sf.physics.qpos)
        assert float(centre[2]) > HOLD_POS[2] - 0.15
