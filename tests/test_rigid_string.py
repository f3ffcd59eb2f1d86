"""Rigid articulated string for ball-in-a-cup (VERDICT r3 next #5).

The reference scene's string is 29 capsule bodies x 2 hinges
(reference: ball_in_cup_cylinder.xml:188-855); envs.ball_in_a_cup models
it as an XPBD particle chain. envs.ball_in_a_cup_rigid re-articulates it
as rigid links on the SAME engine as every other env — these tests pin
the statics/kinematics; the dynamic XPBD-vs-rigid agreement study is
studies/rigid_string.py (+ the slow-tier test below).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppi_tpu.envs.ball_in_a_cup import (
    BALL_RADIUS,
    CUP_INNER_RADIUS,
    STRING_LENGTH,
    BallInCupSim,
)
from ppi_tpu.envs.ball_in_a_cup_rigid import N_ARM, BallInCupSimRigid

Q0 = jnp.array([0.0, 0.0, 0.0, 1.5707])


@pytest.fixture(scope="module")
def sim():
    return BallInCupSimRigid(engine="tensor", n_links=8)


def _settle(sim, state, n):
    def body(s, _):
        return sim.step(s, Q0, jnp.zeros(N_ARM)), None
    return jax.lax.scan(body, state, None, length=n)[0]


class TestRigidString:
    def test_arm_matches_xpbd_arm(self, sim):
        """The first 4 bodies ARE the ball_in_a_cup arm: same cup frame
        at a random posture (the lockstep guarantee _builder_from_arm
        promises)."""
        xpbd = BallInCupSim()
        q = jnp.array([0.3, -0.4, 0.2, 1.1])
        b_x, t_x, u_x = xpbd.cup_frame(q)
        q_full = jnp.zeros(sim.n_dof).at[:N_ARM].set(q)
        b_r, u_r = sim.cup_frame(q_full)
        np.testing.assert_allclose(np.asarray(b_r), np.asarray(b_x),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(u_r), np.asarray(u_x),
                                   atol=1e-5)

    def test_reset_hangs_straight_down(self, sim):
        state = sim.reset(Q0)
        bottom, _ = sim.cup_frame(state.physics.qpos)
        ball = sim.ball_pos(state.physics.qpos)
        d = np.asarray(ball - bottom)
        assert abs(d[0]) < 1e-3 and abs(d[1]) < 1e-3
        assert d[2] == pytest.approx(-STRING_LENGTH, abs=1e-3)

    def test_hang_is_stationary_under_hold(self, sim):
        """Statics: holding the start posture, the straight-down chain is
        an equilibrium — the ball stays put at string length (the rigid
        analogue of the XPBD settle test)."""
        state = sim.reset(Q0)
        state = _settle(sim, state, 300)
        bottom, _ = sim.cup_frame(state.physics.qpos)
        ball = sim.ball_pos(state.physics.qpos)
        d = np.asarray(ball - bottom)
        assert np.linalg.norm(d[:2]) < 0.02
        assert d[2] == pytest.approx(-STRING_LENGTH, abs=0.01)
        assert not bool(state.violated)
        r, success = sim.reward_and_success(state)
        assert np.isfinite(float(r)) and not bool(success)

    def test_ball_in_cup_reads_success(self):
        """Scoring parity: a chain posture placing the ball inside the cup
        cavity scores success through the same geometric test as XPBD.
        Construction: 9 links folded alternately (x-hinge pi at links
        1..8) from the hanging pose point u,d,u,d,... — net ONE segment
        (0.37/9 = 41 mm < cup depth 75 mm) above the anchor, radially
        centred -> inside the cavity."""
        sim9 = BallInCupSimRigid(engine="tensor", n_links=9)
        state = sim9.reset(Q0)
        q = state.physics.qpos
        q = q.at[N_ARM].add(jnp.pi)  # first link points UP from the hang
        for k in range(1, 9):
            q = q.at[N_ARM + 2 * k].set(jnp.pi)  # alternate down/up
        state = state.replace(physics=state.physics.replace(qpos=q))
        bottom, up = sim9.cup_frame(q)
        ball = sim9.ball_pos(q)
        h = float(jnp.dot(ball - bottom, up))
        assert 0.01 < h < 0.075  # one net segment above the cup floor
        _, success = sim9.reward_and_success(state)
        assert bool(success)

    def test_episodic_wrapper_drop_in(self):
        """BallInACup(rigid=True) exposes the same protocol/costs shape."""
        from ppi_tpu.envs.episodic import BallInACup
        env = BallInACup(rigid=True)
        assert env.sim.__class__.__name__ == "BallInCupSimRigid"
        assert env.dt == pytest.approx(2e-3)

    @pytest.mark.slow
    def test_swing_trajectories_agree_with_xpbd(self):
        """Cross-validation: the same scripted shoulder/elbow sine swing
        through both string models produces ball trajectories that agree
        in amplitude and phase (RMS bounded; the full sweep is
        studies/rigid_string.py)."""
        rigid = BallInCupSimRigid(engine="tensor", n_links=12)
        xpbd = BallInCupSim()
        steps = 400
        ts = jnp.arange(steps) * xpbd.dt
        amp, freq = 0.25, 1.5
        qs = (Q0[None, :].repeat(steps, 0)
              .at[:, 1].add(amp * jnp.sin(2 * jnp.pi * freq * ts))
              .at[:, 3].add(-0.5 * amp * jnp.sin(2 * jnp.pi * freq * ts)))
        qds = jnp.zeros((steps, 4))

        def run(sim):
            state = sim.reset(Q0)

            def body(s, sp):
                s = sim.step(s, sp[0], sp[1])
                ball = (s.particles[-1] if hasattr(s, "particles")
                        else sim.ball_pos(s.physics.qpos))
                return s, ball

            _, balls = jax.lax.scan(body, state, (qs, qds))
            return np.asarray(balls)

        b_r, b_x = run(rigid), run(xpbd)
        # skip the initial transient; compare the driven phase
        rms = np.sqrt(np.mean(np.sum((b_r[100:] - b_x[100:]) ** 2, -1)))
        amp_r = np.ptp(b_r[100:, 0])
        amp_x = np.ptp(b_x[100:, 0])
        assert rms < 0.08, f"ball-trajectory RMS {rms:.3f}"
        assert abs(amp_r - amp_x) / max(amp_x, 1e-6) < 0.35
