"""Physics-core validation against analytic solutions (SURVEY.md §4d):
pendulum/double-pendulum oracles, energy conservation under the symplectic
integrator, contact statics, and batched-rollout isolation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppi_tpu.envs.physics import (
    ArticulatedModel,
    ModelBuilder,
    PhysicsState,
    fk,
    forward_dynamics,
    mass_matrix,
    step,
)
from ppi_tpu.envs.physics.engine import (
    HINGE,
    SLIDE,
    bias_torque,
    gravity_torque,
)


def simple_pendulum(length=1.0, mass=1.0, damping=0.0):
    b = ModelBuilder()
    b.add_body(parent=-1, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0, 0, 0), mass=mass, com=(0, 0, -length),
               inertia=np.zeros((3, 3)), damping=damping, armature=0.0)
    return b.finalize()


def double_pendulum(l1=1.0, l2=1.0, m1=1.0, m2=1.0):
    b = ModelBuilder()
    b.add_body(parent=-1, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0, 0, 0), mass=m1, com=(0, 0, -l1),
               inertia=np.zeros((3, 3)), damping=0.0, armature=0.0)
    b.add_body(parent=0, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0, 0, -l1), mass=m2, com=(0, 0, -l2),
               inertia=np.zeros((3, 3)), damping=0.0, armature=0.0)
    return b.finalize()


class TestKinematics:
    def test_pendulum_fk(self):
        model = simple_pendulum(length=2.0)
        kin = fk(model, jnp.array([0.0]))
        np.testing.assert_allclose(kin["com"][0], [0, 0, -2.0], atol=1e-6)
        kin = fk(model, jnp.array([jnp.pi / 2]))
        np.testing.assert_allclose(kin["com"][0], [-2.0, 0, 0], atol=1e-6)

    def test_slide_fk(self):
        b = ModelBuilder()
        b.add_body(parent=-1, joint_type=SLIDE, axis=(1, 0, 0),
                   offset_pos=(0, 0, 0.5), mass=1.0)
        model = b.finalize()
        kin = fk(model, jnp.array([0.7]))
        np.testing.assert_allclose(kin["pos"][0], [0.7, 0, 0.5], atol=1e-6)


class TestDynamicsOracles:
    def test_pendulum_mass_matrix(self):
        model = simple_pendulum(length=1.5, mass=2.0)
        m = mass_matrix(model, jnp.array([0.3]))
        np.testing.assert_allclose(m, [[2.0 * 1.5 ** 2]], rtol=1e-5)

    def test_pendulum_equation_of_motion(self):
        model = simple_pendulum(length=1.0, mass=1.0)
        for q in [0.3, 1.2, -0.7]:
            qdd = forward_dynamics(model, jnp.array([q]), jnp.zeros(1),
                                   jnp.zeros(1))
            np.testing.assert_allclose(qdd, [-9.81 * np.sin(q)], rtol=1e-4)

    def test_double_pendulum_mass_matrix_oracle(self):
        l1 = l2 = 1.0
        m1, m2 = 1.0, 2.0
        model = double_pendulum(l1, l2, m1, m2)
        q2 = 0.6
        m = np.asarray(mass_matrix(model, jnp.array([0.2, q2])))
        # textbook point-mass double pendulum (angles measured from parent)
        m11 = (m1 + m2) * l1 ** 2 + m2 * l2 ** 2 + 2 * m2 * l1 * l2 * np.cos(q2)
        m12 = m2 * l2 ** 2 + m2 * l1 * l2 * np.cos(q2)
        m22 = m2 * l2 ** 2
        np.testing.assert_allclose(m, [[m11, m12], [m12, m22]], rtol=1e-4)

    def test_coriolis_matches_finite_difference(self):
        model = double_pendulum()
        q = jnp.array([0.4, -0.8])
        qd = jnp.array([1.3, -0.5])
        got = np.asarray(bias_torque(model, q, qd))
        # oracle: C qd = (dM/dq . qd) qd - 0.5 d(qd' M qd)/dq by central diff
        eps = 1e-4
        def m_at(qq):
            return np.asarray(mass_matrix(model, jnp.array(qq)))
        dm = np.stack([
            (m_at(np.asarray(q) + eps * np.eye(2)[i])
             - m_at(np.asarray(q) - eps * np.eye(2)[i])) / (2 * eps)
            for i in range(2)])
        mdot = np.einsum("kij,k->ij", dm, np.asarray(qd))
        dt_dq = 0.5 * np.einsum("i,kij,j->k", np.asarray(qd), dm,
                                np.asarray(qd))
        np.testing.assert_allclose(got, mdot @ np.asarray(qd) - dt_dq,
                                   rtol=1e-2, atol=1e-4)

    def test_gravity_torque_pendulum(self):
        model = simple_pendulum(length=1.0, mass=3.0)
        for q in [0.0, 0.5, 2.0]:
            kin = fk(model, jnp.array([q]))
            tau = gravity_torque(model, kin)
            np.testing.assert_allclose(tau, [-3.0 * 9.81 * np.sin(q)],
                                       rtol=1e-4, atol=1e-5)


class TestIntegration:
    def test_energy_bounded_double_pendulum(self):
        model = double_pendulum()
        state = PhysicsState(qpos=jnp.array([1.2, 0.5]), qvel=jnp.zeros(2))

        def energy(s):
            kin = fk(model, s.qpos)
            t = 0.5 * s.qvel @ mass_matrix(model, s.qpos) @ s.qvel
            v = -jnp.sum(model.mass * (model.gravity @ kin["com"].T))
            return t + v

        e0 = float(energy(state))

        def body(s, _):
            s = step(model, s, jnp.zeros(2), dt=1e-3, substeps=1)
            return s, energy(s)

        state, es = jax.lax.scan(body, state, None, length=2000)
        scale = max(abs(e0), 1.0) + 10.0
        drift = np.abs(np.asarray(es) - e0).max() / scale
        assert drift < 0.05, drift  # symplectic: bounded, small oscillation

    def test_small_oscillation_period(self):
        length = 1.0
        model = simple_pendulum(length=length)
        state = PhysicsState(qpos=jnp.array([0.05]), qvel=jnp.zeros(1))
        dt = 1e-3

        def body(s, _):
            s = step(model, s, jnp.zeros(1), dt=dt)
            return s, s.qpos[0]

        _, qs = jax.lax.scan(body, state, None, length=4000)
        qs = np.asarray(qs)
        # measure period from zero crossings
        crossings = np.where(np.diff(np.sign(qs)) != 0)[0]
        period = 2 * np.mean(np.diff(crossings)) * dt
        expect = 2 * np.pi * np.sqrt(length / 9.81)
        np.testing.assert_allclose(period, expect, rtol=0.02)


class TestContacts:
    def ball_on_plane(self):
        b = ModelBuilder()
        # vertical slide joint = free fall along z
        b.add_body(parent=-1, joint_type=SLIDE, axis=(0, 0, 1),
                   offset_pos=(0, 0, 0), mass=1.0, damping=0.0, armature=0.0)
        s = b.add_sphere(0, (0, 0, 0), radius=0.1)
        p = b.add_plane((0, 0, 1), 0.0)
        b.add_contact_sphere_plane(s, p)
        b.contact_stiffness = 5e3
        b.contact_damping = 50.0
        return b.finalize()

    def test_ball_settles_on_plane(self):
        model = self.ball_on_plane()
        state = PhysicsState(qpos=jnp.array([0.5]), qvel=jnp.zeros(1))

        def body(s, _):
            s = step(model, s, jnp.zeros(1), dt=2e-3, substeps=2)
            return s, s.qpos[0]

        _, zs = jax.lax.scan(body, state, None, length=2000)
        zs = np.asarray(zs)
        # settles near the surface: z ~ radius - mg/k penetration
        expect = 0.1 - 9.81 / 5e3
        np.testing.assert_allclose(zs[-100:].mean(), expect, atol=5e-3)
        assert np.abs(zs[-100:] - zs[-1]).max() < 1e-3  # at rest

    def test_sphere_sphere_repulsion(self):
        b = ModelBuilder()
        b.add_body(parent=-1, joint_type=SLIDE, axis=(1, 0, 0),
                   offset_pos=(0, 0, 0), mass=1.0, damping=0.0, armature=0.0)
        b.add_body(parent=-1, joint_type=SLIDE, axis=(1, 0, 0),
                   offset_pos=(0.15, 0, 0), mass=1.0, damping=0.0,
                   armature=0.0)
        s1 = b.add_sphere(0, (0, 0, 0), 0.1)
        s2 = b.add_sphere(1, (0, 0, 0), 0.1)
        b.add_contact_sphere_sphere(s1, s2)
        b.gravity = (0.0, 0.0, 0.0)
        model = b.finalize()
        # spheres overlap (centres 0.15 apart, radii sum 0.2) -> repel
        state = PhysicsState(qpos=jnp.zeros(2), qvel=jnp.zeros(2))
        state, _ = jax.lax.scan(
            lambda s, _: (step(model, s, jnp.zeros(2), dt=1e-3), None),
            state, None, length=200)
        gap = (0.15 + float(state.qpos[1])) - float(state.qpos[0])
        assert gap >= 0.2 - 1e-3

    def test_batched_rollouts_isolated(self):
        model = self.ball_on_plane()
        q0 = jnp.array([[0.5], [jnp.nan]])

        def run(q):
            s = PhysicsState(qpos=q, qvel=jnp.zeros(1))
            for _ in range(5):
                s = step(model, s, jnp.zeros(1), dt=1e-3)
            return s.qpos

        out = jax.vmap(run)(q0)
        assert np.isfinite(np.asarray(out[0])).all()
        assert np.isnan(np.asarray(out[1])).all()


class TestSoaEngine:
    """Cross-validation of the scalar-SoA RNEA pipeline against the
    autodiff tensor engine (the readable oracle)."""

    def test_matches_tensor_engine_with_contacts(self, rng):
        from ppi_tpu.envs.door import Door
        from ppi_tpu.envs.physics.engine_soa import (SoaModel,
                                                     forward_dynamics_soa)
        from ppi_tpu.envs.physics.engine import forward_dynamics
        model = Door()._model
        soa = SoaModel(model)
        for _ in range(3):
            q = jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.5)
            qd = jnp.asarray(rng.normal(size=6).astype(np.float32) * 2.0)
            tau = jnp.asarray(rng.normal(size=6).astype(np.float32) * 3.0)
            ref = np.asarray(forward_dynamics(model, q, qd, tau))
            got = np.array([float(x) for x in
                            forward_dynamics_soa(soa, tuple(q), tuple(qd),
                                                 tuple(tau))[0]])
            np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)

    def test_matches_tensor_engine_with_slide_joints(self, rng):
        # mixed slide + hinge tree exercises the slide branch of the
        # velocity-kinematics RNEA
        from ppi_tpu.envs.physics.engine_soa import (SoaModel,
                                                     forward_dynamics_soa)
        from ppi_tpu.envs.physics.engine import forward_dynamics
        b = ModelBuilder()
        b.add_body(parent=-1, joint_type=SLIDE, axis=(1, 0, 0),
                   offset_pos=(0, 0, 0.5), mass=1.0, damping=0.1,
                   armature=0.01)
        b.add_body(parent=0, joint_type=HINGE, axis=(0, 1, 0),
                   offset_pos=(0, 0, 0), mass=0.5, com=(0, 0, -0.4),
                   inertia=1e-3 * np.eye(3), damping=0.05, armature=0.01)
        b.add_body(parent=1, joint_type=SLIDE, axis=(0, 0, 1),
                   offset_pos=(0, 0, -0.4), mass=0.3, damping=0.05,
                   armature=0.01)
        model = b.finalize()
        soa = SoaModel(model)
        for _ in range(3):
            q = jnp.asarray(rng.normal(size=3).astype(np.float32) * 0.4)
            qd = jnp.asarray(rng.normal(size=3).astype(np.float32) * 1.5)
            tau = jnp.asarray(rng.normal(size=3).astype(np.float32))
            ref = np.asarray(forward_dynamics(model, q, qd, tau))
            got = np.array([float(x) for x in
                            forward_dynamics_soa(soa, tuple(q), tuple(qd),
                                                 tuple(tau))[0]])
            np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


class TestFreeBodyComposition:
    def test_free_body_chain_falls_ballistically(self):
        """A 6-DoF free body composed from slide/hinge chains follows
        projectile motion."""
        b = ModelBuilder()
        tail = b.add_free_body_chain((0, 0, 1.0))
        body = b.add_body(parent=tail, joint_type=HINGE, axis=(0, 0, 1),
                          offset_pos=(0, 0, 0), mass=1.0,
                          inertia=1e-2 * np.eye(3), damping=0.0,
                          armature=1e-4)
        model = b.finalize()
        state = PhysicsState(qpos=jnp.zeros(6),
                             qvel=jnp.zeros(6).at[0].set(2.0))  # vx = 2

        def step_fn(s, _):
            return step(model, s, jnp.zeros(6), dt=1e-3), None

        state, _ = jax.lax.scan(step_fn, state, None, length=500)
        t = 0.5
        np.testing.assert_allclose(float(state.qpos[0]), 2.0 * t, rtol=1e-2)
        np.testing.assert_allclose(float(state.qpos[2]),
                                   -0.5 * 9.81 * t ** 2, rtol=2e-2)
        del body


class TestStackedEngine:
    """Cross-validation of the stacked-assembly dynamics
    (engine_stacked, the compile-time fast path for high-DoF scenes)
    against the scalar-SoA pipeline: identical math, array assemblies."""

    def test_matches_soa_on_door_trajectory(self, rng):
        from ppi_tpu.envs.door import Door
        from ppi_tpu.envs.physics.engine_soa import make_single_step_soa
        from ppi_tpu.envs.physics.engine_stacked import (
            make_single_step_stacked)

        env = Door()
        model = env._model
        s_soa = jax.jit(make_single_step_soa(model, env.dt, env.substeps))
        s_stk = jax.jit(make_single_step_stacked(model, env.dt,
                                                 env.substeps))
        q = jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.3)
        qd = jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.5)
        tau = jnp.asarray(rng.normal(size=6).astype(np.float32))
        for _ in range(25):
            q1, qd1 = s_soa(q, qd, tau)
            q2, qd2 = s_stk(q, qd, tau)
            np.testing.assert_allclose(np.asarray(q2), np.asarray(q1),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(qd2), np.asarray(qd1),
                                       rtol=1e-4, atol=1e-4)
            q, qd = q1, qd1

    def test_fused_fk_vel_sweep_matches_two_pass(self, rng):
        """The scatter-free fused FK+velocity sweep (_fk_vel_stacked, the
        r4 latency optimization) computes identical math to the two-pass
        path — only the data movement differs (compact per-level arrays +
        one permutation gather vs .at[].set scatters), so agreement is at
        fp-epsilon, not trajectory tolerance."""
        from ppi_tpu.envs.door_adroit import DoorAdroit
        from ppi_tpu.envs.physics import engine_stacked as es
        from ppi_tpu.envs.physics.engine_soa import SoaModel

        env = DoorAdroit()
        c = es._StackedConsts(SoaModel(env._model))
        nq = c.nq
        q = jnp.asarray(rng.normal(size=nq).astype(np.float32) * 0.4)
        qd = jnp.asarray(rng.normal(size=nq).astype(np.float32) * 0.8)
        off = jnp.asarray(c.offset_pos)
        R1, P1, A1, C1 = es._fk_stacked(c, q, off)
        W1, Vo1, Al1, Ac1 = es._velocity_stacked(c, qd, P1, A1, C1)
        R2, P2, A2, C2, W2, Vo2, Al2, Ac2 = es._fk_vel_stacked(c, q, qd,
                                                               off)
        for a, b in [(R1, R2), (P1, P2), (A1, A2), (C1, C2), (W1, W2),
                     (Vo1, Vo2), (Al1, Al2), (Ac1, Ac2)]:
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-6, atol=1e-6)

    def test_matches_soa_with_all_contact_types(self, rng):
        """relocate exercises sphere-plane, sphere-sphere AND
        sphere-segment pairs plus slide joints and joint limits."""
        from ppi_tpu.envs.relocate import Relocate
        from ppi_tpu.envs.physics.engine_soa import make_single_step_soa
        from ppi_tpu.envs.physics.engine_stacked import (
            make_single_step_stacked)

        env = Relocate()
        model = env._model
        s_soa = jax.jit(make_single_step_soa(model, env.dt, env.substeps))
        s_stk = jax.jit(make_single_step_stacked(model, env.dt,
                                                 env.substeps))
        state = env.reset(jax.random.key(0))
        q, qd = state.physics.qpos, state.physics.qvel
        tau = jnp.asarray(rng.normal(size=model.nq).astype(np.float32))
        for _ in range(25):
            q1, qd1 = s_soa(q, qd, tau)
            q2, qd2 = s_stk(q, qd, tau)
            np.testing.assert_allclose(np.asarray(q2), np.asarray(q1),
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(qd2), np.asarray(qd1),
                                       rtol=1e-3, atol=1e-3)
            q, qd = q1, qd1

    def test_friction_stiction_matches(self, rng):
        """hammer-v0 has joint friction_loss (the nail) — the stiction
        branch must agree too."""
        from ppi_tpu.envs.hammer import Hammer
        from ppi_tpu.envs.physics.engine_soa import make_single_step_soa
        from ppi_tpu.envs.physics.engine_stacked import (
            make_single_step_stacked)

        env = Hammer()
        model = env._model
        s_soa = jax.jit(make_single_step_soa(model, env.dt, env.substeps))
        s_stk = jax.jit(make_single_step_stacked(model, env.dt,
                                                 env.substeps))
        state = env.reset(jax.random.key(0))
        q, qd = state.physics.qpos, state.physics.qvel
        tau = jnp.asarray(rng.normal(size=model.nq).astype(np.float32))
        for _ in range(25):
            q1, qd1 = s_soa(q, qd, tau)
            q2, qd2 = s_stk(q, qd, tau)
            np.testing.assert_allclose(np.asarray(q2), np.asarray(q1),
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(qd2), np.asarray(qd1),
                                       rtol=1e-3, atol=1e-3)
            q, qd = q1, qd1

    def test_vmapped_batch_matches_scalar_path(self, rng):
        """The stacked assemblies must hold under vmap (the MPC rollout
        axis): batched step == per-sample scalar step, lane for lane."""
        from ppi_tpu.envs.door import Door
        from ppi_tpu.envs.physics.engine_soa import make_single_step_soa
        from ppi_tpu.envs.physics.engine_stacked import (
            make_single_step_stacked)

        env = Door()
        model = env._model
        s_soa = jax.jit(jax.vmap(make_single_step_soa(model, env.dt,
                                                      env.substeps)))
        s_stk = jax.jit(jax.vmap(make_single_step_stacked(model, env.dt,
                                                          env.substeps)))
        q = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32) * 0.3)
        qd = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32) * 0.5)
        tau = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
        q1, qd1 = s_soa(q, qd, tau)
        q2, qd2 = s_stk(q, qd, tau)
        np.testing.assert_allclose(np.asarray(q2), np.asarray(q1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(qd2), np.asarray(qd1),
                                   rtol=1e-4, atol=1e-4)
