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
        env = Relocate(fixed_goal=True)
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
        dist = float(jnp.linalg.norm(ball - sf.target))
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
        env = Pen(fixed_goal=True)
        s0 = env.reset(jax.random.key(0))
        tgt = s0.target_axis
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


class TestSampledGoals:
    """Per-episode goal randomization (VERDICT r2 missing #3): different
    reset keys draw different goals from the mj_envs distributions, and
    success is judged against the EPISODE's sampled goal."""

    def test_pen_goals_differ_and_lie_in_distribution(self):
        env = Pen()
        s1 = env.reset(jax.random.key(1))
        s2 = env.reset(jax.random.key(2))
        a1, a2 = np.asarray(s1.target_axis), np.asarray(s2.target_axis)
        assert np.linalg.norm(a1 - a2) > 1e-3
        for a in (a1, a2):
            np.testing.assert_allclose(np.linalg.norm(a), 1.0, rtol=1e-5)

    def test_pen_fixed_goal_is_deterministic(self):
        env = Pen(fixed_goal=True)
        s1 = env.reset(jax.random.key(1))
        s2 = env.reset(jax.random.key(2))
        np.testing.assert_allclose(np.asarray(s1.target_axis),
                                   np.asarray(s2.target_axis))

    def test_relocate_goals_differ_and_success_tracks_goal(self):
        from ppi_tpu.envs.relocate import GOAL_X, GOAL_Y, GOAL_Z
        env = Relocate()
        s1 = env.reset(jax.random.key(1))
        s2 = env.reset(jax.random.key(2))
        t1, t2 = np.asarray(s1.target), np.asarray(s2.target)
        assert np.linalg.norm(t1 - t2) > 1e-3
        for t in (t1, t2):
            assert GOAL_X[0] <= t[0] <= GOAL_X[1]
            assert GOAL_Y[0] <= t[1] <= GOAL_Y[1]
            assert GOAL_Z[0] <= t[2] <= GOAL_Z[1]
        # teleport the ball onto each episode's own goal: success must key
        # on the sampled goal, not a global constant
        from ppi_tpu.envs.relocate import BALL_START, TABLE_Z, BALL_RADIUS

        def at_goal(s):
            q = s.physics.qpos
            q = q.at[6].set(s.target[0] - BALL_START[0])
            q = q.at[7].set(s.target[1] - BALL_START[1])
            q = q.at[8].set(s.target[2] - (TABLE_Z + BALL_RADIUS))
            return s.replace(physics=s.physics.replace(qpos=q))

        assert bool(env.success(at_goal(s1)))
        assert bool(env.success(at_goal(s2)))
        # ...and a state at episode-2's goal fails episode-1's test when the
        # goals differ enough to matter
        if np.linalg.norm(t1 - t2) > 0.1:
            s_cross = at_goal(s2).replace(target=s1.target)
            assert not bool(env.success(s_cross))

    def test_fetch_push_goal_floor_distance(self):
        # the 0.1 m floor is enforced against the EPISODE's sampled box
        # start (Fetch resamples the goal until far from the object)
        from ppi_tpu.envs.push import FetchPush, GOAL_MIN_DIST
        env = FetchPush()
        states = [env.reset(jax.random.key(k)) for k in range(8)]
        targets = [np.asarray(s.target) for s in states]
        starts = [np.asarray(env.box_xy(s)) for s in states]
        assert max(np.linalg.norm(a - b) for a in targets
                   for b in targets) > 1e-3
        for t, s in zip(targets, starts):
            assert np.linalg.norm(t - s) >= GOAL_MIN_DIST - 1e-6

    def test_object_starts_sampled_per_episode(self):
        """mj_envs relocate / Fetch sample the OBJECT position per reset,
        not only the goal; fixed_goal=True pins both (legacy episode)."""
        from ppi_tpu.envs.fetch_pick import FetchPickAndPlace
        from ppi_tpu.envs.push import FetchPush
        from ppi_tpu.envs.relocate import START_RANGE

        def obj_offsets(env, dofs, key):
            return np.asarray(env.reset(key).physics.qpos)[list(dofs)]

        for env, dofs in ((Relocate(), (6, 7)), (FetchPush(), (4, 5)),
                          (FetchPickAndPlace(), (6, 7))):
            o1 = obj_offsets(env, dofs, jax.random.key(1))
            o2 = obj_offsets(env, dofs, jax.random.key(2))
            assert np.linalg.norm(o1 - o2) > 1e-4, type(env).__name__
            for o in (o1, o2):
                assert (np.abs(o) <= START_RANGE + 1e-6).all()
        fixed = Relocate(fixed_goal=True)
        np.testing.assert_allclose(
            obj_offsets(fixed, (6, 7), jax.random.key(3)), 0.0)

    def test_fetch_push_goal_distribution_has_no_boundary_atom(self):
        """The rejection sampler must not pile goal mass on the 0.1 m
        minimum circle (the pre-review radial projection put ~35% of
        draws exactly at GOAL_MIN_DIST; the Fetch reference resamples)."""
        from ppi_tpu.envs.push import BOX_START, FetchPush, GOAL_MIN_DIST
        env = FetchPush()
        sample = jax.jit(jax.vmap(env.sample_goal))
        goals = np.asarray(sample(jax.random.split(jax.random.key(0), 256)))
        r = np.linalg.norm(goals - np.asarray(BOX_START), axis=1)
        assert (r >= GOAL_MIN_DIST - 1e-6).all()
        # under rejection, P(r exactly at the boundary) is ~0; under the
        # old projection it was ~0.35
        at_boundary = (np.abs(r - GOAL_MIN_DIST) < 1e-4).mean()
        assert at_boundary < 0.05, at_boundary


class TestFetchPickAndPlace:
    """FetchPickAndPlace-class env (VERDICT r2 missing #2; reference:
    run_mpc.py:47): the relocate gripper picks the object and places it at
    a sampled table-or-air goal, success at the Fetch 5 cm threshold."""

    def _scripted_pick(self, env, s0):
        import jax.lax as lax

        grip = [-0.5, 0.5]
        q0 = np.asarray(s0.physics.qpos[:6])

        def seg(s, tgt, n):
            def body(st, _):
                st, _ = env.step(st, jnp.asarray(tgt))
                return st, None
            return lax.scan(body, s, None, length=n)[0]

        s = seg(s0, q0, 15)
        s = seg(s, list(q0[:4]) + grip, 25)
        for pose in ([0.00, -0.45, 1.82, -1.40], [0.07, -0.60, 1.85, -1.28],
                     [0.15, -0.75, 1.88, -1.15], [0.22, -0.87, 1.91, -1.05],
                     [0.291, -1.20, 1.80, -0.75]):
            s = seg(s, pose + grip, 30)
        return s

    def test_goal_distribution_air_and_table(self):
        from ppi_tpu.envs.fetch_pick import FetchPickAndPlace, TABLE_Z, \
            BALL_RADIUS
        env = FetchPickAndPlace()
        zs = np.array([float(env.reset(jax.random.key(k)).target[2])
                       for k in range(12)])
        on_table = np.isclose(zs, TABLE_Z + BALL_RADIUS)
        assert on_table.any() and (~on_table).any()
        assert (zs[~on_table] > TABLE_Z + 0.15 - 1e-6).all()

    def test_scripted_pick_and_place_succeeds(self):
        from ppi_tpu.envs.fetch_pick import FetchPickAndPlace
        env = FetchPickAndPlace(fixed_goal=True)
        s0 = env.reset(jax.random.key(0))
        sf = self._scripted_pick(env, s0)
        _, _, ball = env._sites(sf.physics.qpos)
        d = float(jnp.linalg.norm(ball - sf.target))
        assert bool(env.success(sf)), f"dist {d:.3f}"

    def test_rollout_finite(self):
        from ppi_tpu.envs.fetch_pick import FetchPickAndPlace
        env = FetchPickAndPlace()
        s0 = env.reset(jax.random.key(0))
        base = s0.physics.qpos[:6]
        acts = base[None, None, :] + 0.4 * jax.random.normal(
            jax.random.key(1), (6, 30, 6))
        _, rew = batch_rollout(env, s0, acts)
        assert np.isfinite(np.asarray(rew)).all()

    def test_render_default_target_fallback(self, tmp_path):
        # Regression: render_relocate's default-target path reads
        # env.target, which FetchPickAndPlace didn't define (AttributeError
        # on any render call that omitted the sampled goal).
        from ppi_tpu import render
        from ppi_tpu.envs.fetch_pick import FetchPickAndPlace
        env = FetchPickAndPlace(fixed_goal=True)
        s0 = env.reset(jax.random.key(0))
        qh = np.tile(np.asarray(s0.physics.qpos)[None], (4, 1))
        out = render.render_relocate(env, qh, str(tmp_path / "f.gif"))
        assert (tmp_path / "f.gif").exists(), out
