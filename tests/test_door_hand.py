"""door-v0-class task on the multi-finger hand embodiment.

The reference drives door-v0 with the 28-DoF Adroit hand (reference:
run_mpc.py:42 + the mj_envs submodule); ``envs.door_hand`` carries the
task on a 4-DoF arm + three-digit hand (12 DoF total) with multi-point
grasp contact, closing the embodiment gap of the paddle-door env.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppi_tpu.envs.base import batch_rollout
from ppi_tpu.envs.door_hand import (
    DOOR, LATCH, N_ACT, DoorHand, scripted_open)

INTERPRET = jax.default_backend() == "cpu"


@pytest.fixture(scope="module")
def env():
    # the tensor engine compiles fast on the CPU test platform; the SoA
    # scalar program is cross-validated by the pallas test below
    return DoorHand(engine="tensor")


class TestDoorHand:
    def test_stays_finite_under_random_actions(self, env):
        s0 = env.reset(jax.random.key(0))
        base = s0.physics.qpos[:N_ACT]
        acts = base[None, None, :] + 0.5 * jax.random.normal(
            jax.random.key(1), (6, 30, N_ACT))
        _, rew = batch_rollout(env, s0, acts)
        assert np.isfinite(np.asarray(rew)).all()

    def test_bolt_projection_semantics(self, env):
        """The bolt is a kinematic clamp: latched + starting inside the
        bolt reach blocks the door at the bolt depth; unlatched or
        already-ajar doors swing freely."""
        q = jnp.zeros(12).at[DOOR].set(0.5)
        qd = jnp.zeros(12).at[DOOR].set(2.0)
        # latched (latch at 0 > unlock angle) and starting closed: clamped
        qp, qv = env._bolt_project(jnp.asarray(0.0), q, qd)
        assert float(qp[DOOR]) == pytest.approx(env.bolt_depth)
        assert float(qv[DOOR]) == 0.0
        # latch pressed past the unlock angle: free
        q_unlocked = q.at[LATCH].set(env.latch_unlock_angle - 0.1)
        qp, qv = env._bolt_project(jnp.asarray(0.0), q_unlocked, qd)
        assert float(qp[DOOR]) == 0.5 and float(qv[DOOR]) == 2.0
        # already ajar past the bolt depth: the bolt rides the strike plate
        qp, qv = env._bolt_project(jnp.asarray(0.4), q, qd)
        assert float(qp[DOOR]) == 0.5 and float(qv[DOOR]) == 2.0

    def test_door_stays_bolted_under_random_pushing(self, env):
        """No random flailing opens the door past the bolt depth without
        pressing the latch first (mj_envs door-v0's latch mechanic)."""
        s0 = env.reset(jax.random.key(0))
        base = s0.physics.qpos[:N_ACT]
        acts = base[None, None, :] + 0.6 * jax.random.normal(
            jax.random.key(2), (8, 40, N_ACT))
        # keep the latch-pressing shoulder drive gentle so the handle is
        # never pressed past the unlock angle
        finals, _ = batch_rollout(env, s0, acts)
        latch_min = float(finals.physics.qpos[:, LATCH].min())
        doors = np.asarray(finals.physics.qpos[:, DOOR])
        unlatched = latch_min < env.latch_unlock_angle
        if not unlatched:
            assert (doors <= env.bolt_depth + 1e-3).all(), doors

    def test_scripted_expert_opens_door(self, env):
        """Feasibility oracle: press the handle, pop the bolt, sweep the
        panel past the success angle — all within actuation limits (the
        analogue of the reference's scripted __main__ smoke tests;
        reference: ball_in_a_cup.py:664-699). Runs on the key(0)-SAMPLED
        frame: the oracle IKs against the episode's scene, so this also
        pins the scene-aware FK plumbing end-to-end."""
        msgs = []
        state, info = scripted_open(env, log=msgs.append)
        assert info["success"], (info, msgs)
        assert info["door"] > 1.35

    def test_vector_and_scalar_step_agree(self, env):
        """The tensor-engine step and the scalar-SoA contract must agree
        on torque and projection semantics (the megakernel's inputs).
        The full 12-DoF kernel itself is exercised on device — its CPU
        XLA compile is minutes-scale, which is why the tensor engine is
        the CPU test path (see DoorHand.engine)."""
        from ppi_tpu.envs.physics.engine_soa import SoaModel
        m = SoaModel(env._model)
        s0 = env.reset(jax.random.key(0))
        q = s0.physics.qpos + 0.05
        qd = 0.1 * jnp.ones(12)
        act = jnp.asarray(np.linspace(-0.5, 0.5, N_ACT))
        tau_s = env.scalar_torque(m, tuple(q), tuple(qd), tuple(act))
        target = jnp.clip(act, env.action_low, env.action_high)
        kp, kd = env._gains()
        tau_v = (jnp.zeros(12).at[:N_ACT]
                 .set(kp * (target - q[:N_ACT]) - kd * qd[:N_ACT])
                 + env._lock_torque(q, qd))
        np.testing.assert_allclose(np.asarray(jnp.stack(tau_s)),
                                   np.asarray(tau_v), rtol=1e-6, atol=1e-6)
        # projection: scalar vs vector on a clamping configuration
        q_hit = q.at[DOOR].set(0.5).at[LATCH].set(0.0)
        qd_hit = qd.at[DOOR].set(2.0)
        qp_v, qv_v = env._bolt_project(jnp.asarray(0.0), q_hit, qd_hit)
        q_prev = tuple(jnp.zeros(12))
        qp_s, qv_s = env.scalar_project(m, q_prev, tuple(q_hit),
                                        tuple(qd_hit))
        np.testing.assert_allclose(np.asarray(jnp.stack(qp_s)),
                                   np.asarray(qp_v), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(jnp.stack(qv_s)),
                                   np.asarray(qv_v), rtol=1e-6)

    def test_pallas_project_hook_on_door_model(self):
        """make_pallas_rollout's per-control-step project hook, validated
        on the 6-DoF door model (cheap CPU compile) with a synthetic door
        clamp against a hand-written scan oracle."""
        from ppi_tpu.envs.door import Door, DoorState
        from ppi_tpu.envs.physics.pallas_rollout import make_pallas_rollout

        env = Door(fixed_scene=True)  # kernel here has no dyn row
        clamp_at = 0.05

        def project(m, q_prev, q, qd):
            del m, q_prev
            q = list(q)
            qd = list(qd)
            over = q[4] > clamp_at
            qd[4] = jnp.where(over, jnp.minimum(qd[4], 0.0), qd[4])
            q[4] = jnp.minimum(q[4], clamp_at)
            return tuple(q), tuple(qd)

        h, n = 4, 8
        s0 = env.reset(jax.random.key(0))
        acts = s0.physics.qpos[:4][None, None, :] + 0.4 * jax.random.normal(
            jax.random.key(5), (n, h, 4))
        run = make_pallas_rollout(env._model, env.dt, env.substeps, h,
                                  env.action_dim, env.scalar_torque,
                                  env.scalar_reward, project_fn=project,
                                  block=128, interpret=INTERPRET)
        rew, qf, qdf = run(
            jnp.broadcast_to(s0.physics.qpos, (n, 6)),
            jnp.broadcast_to(s0.physics.qvel, (n, 6)), acts)
        # oracle: env.step dynamics + the same clamp + env reward recomputed
        # on the projected state (the kernel's semantics)
        def oracle_one(q0, qd0, a_seq):
            def body(carry, a):
                q, qd = carry
                from ppi_tpu.envs.physics import PhysicsState
                from ppi_tpu.envs.door import FRAME
                st = DoorState(physics=PhysicsState(qpos=q, qvel=qd),
                               frame=jnp.asarray(FRAME),
                               t=jnp.zeros((), jnp.int32))
                st2, _ = env.step(st, a)
                qt = tuple(st2.physics.qpos[j] for j in range(6))
                qdt = tuple(st2.physics.qvel[j] for j in range(6))
                qt, qdt = project(None, None, qt, qdt)
                q2 = jnp.stack(qt)
                qd2 = jnp.stack(qdt)
                from ppi_tpu.envs.physics.engine_soa import SoaModel
                r = env.scalar_reward(SoaModel(env._model), qt, qdt)
                return (q2, qd2), r
            (qf, qdf), rs = jax.lax.scan(body, (q0, qd0), a_seq)
            return rs, qf, qdf

        rew_ref, qf_ref, _ = jax.vmap(oracle_one, in_axes=(0, 0, 0))(
            jnp.broadcast_to(s0.physics.qpos, (n, 6)),
            jnp.broadcast_to(s0.physics.qvel, (n, 6)), acts)
        assert float(jnp.max(qf[:, 4])) <= clamp_at + 1e-6
        np.testing.assert_allclose(np.asarray(rew), np.asarray(rew_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(qf), np.asarray(qf_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_reward_shape_matches_paddle_door(self, env):
        """Identical staged reward structure to ``envs.door`` so the two
        embodiments' reward curves are directly comparable."""
        from ppi_tpu.envs.physics.engine_soa import SoaModel
        m = SoaModel(env._model)
        for door_angle in (0.0, 0.5, 1.1, 1.4):
            q = [jnp.asarray(0.0)] * 12
            q[DOOR] = jnp.asarray(door_angle)
            qd = [jnp.asarray(0.0)] * 12
            r_hand = float(env.scalar_reward(m, tuple(q), tuple(qd)))
            # the staged bonuses must be present with the paddle weights
            bonus = (2.0 * (door_angle > 0.2) + 8.0 * (door_angle > 1.0)
                     + 10.0 * (door_angle > 1.35) + 2.0 * door_angle)
            # the approach-distance term is embodiment-specific; bound it
            assert abs(r_hand - bonus) < 1.0


class TestDoorHandSampledScene:
    """Per-episode sampled door frame on the hand embodiment (mj_envs
    door-v0 randomizes door_body_pos per reset regardless of embodiment;
    same mechanism as envs.door — dyn_body on the SoA path, a pytree
    model patch on the tensor path)."""

    def test_frames_sampled_and_pinnable(self, env):
        from ppi_tpu.envs.door_hand import FRAME, FRAME_RANGE
        f1 = env.reset(jax.random.key(1)).frame
        f2 = env.reset(jax.random.key(2)).frame
        assert not np.allclose(np.asarray(f1), np.asarray(f2))
        rng = np.asarray(FRAME_RANGE)
        for f in (f1, f2):
            assert (np.abs(np.asarray(f) - np.asarray(FRAME))
                    <= rng + 1e-6).all()
        pinned = DoorHand(engine="tensor", fixed_scene=True)
        np.testing.assert_array_equal(
            np.asarray(pinned.reset(jax.random.key(3)).frame),
            np.asarray(jnp.asarray(FRAME)))

    def test_handle_rides_the_sampled_frame(self, env):
        """Translation equivariance: the door subtree (handle) shifts
        exactly with the frame; the arm (palm) does not move."""
        s = env.reset(jax.random.key(4))
        d = jnp.asarray([0.03, -0.02, 0.05])
        palm0, handle0 = env._sites(s.physics.qpos, s.frame)
        palm1, handle1 = env._sites(s.physics.qpos, s.frame + d)
        np.testing.assert_allclose(np.asarray(palm1), np.asarray(palm0),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(handle1),
                                   np.asarray(handle0 + d),
                                   rtol=1e-5, atol=1e-6)

    def test_observation_carries_frame_and_dynamics_see_it(self, env):
        """The obs exposes the sampled frame (mj_envs door_body_pos
        parity), and stepping the same qpos under two frames diverges
        once the hand interacts with the scene."""
        s1 = env.reset(jax.random.key(5))
        obs = np.asarray(env.observe(s1))
        assert np.allclose(obs[-4:-1], np.asarray(s1.frame))
        # drive toward the handle for a while under both frames
        s2 = s1.replace(frame=s1.frame + jnp.asarray([0.0, 0.0, 0.075]))
        a = s1.physics.qpos[:N_ACT]
        r1 = r2 = 0.0
        for _ in range(5):
            s1, rr1 = env.step(s1, a)
            s2, rr2 = env.step(s2, a)
            r1, r2 = r1 + float(rr1), r2 + float(rr2)
        # the approach-distance reward term must differ between scenes
        assert r1 != r2
