"""Ball-in-a-cup with a RIGID articulated string — the XPBD cross-check.

The reference scene models the string as 29 capsule bodies x 2 free hinges
each (reference: policy_search/robot_descriptions/wam/
ball_in_cup_cylinder.xml:188-855); the rebuild's flagship
``envs.ball_in_a_cup`` replaced it with an XPBD particle chain (validated
for resolution/lag invariance, but a different mechanical model). This
module closes VERDICT r3 next #5: the same 4-DoF arm + cup carries an
articulated chain of rigid links — two orthogonal hinges per link (the
XML's J0_i/J1_i universal joints, damping 1e-4 per the XML) — integrated
by the SAME generalized-coordinate engine as every other env, at the
XML's own integrator step (dt = 2 ms control / 4 substeps = 5e-4).

The chain is a reduced-count re-articulation (default 12 links = 28 total
DoF on the stacked-assembly path; the full 29-link scene is importable via
``envs.physics.mjcf`` and certified by tests/test_mjcf.py) with the
string length/mass and ball mass matched to the XPBD sim so the
comparison isolates the STRING MODEL, not the parameters. Ball-cup
catching runs through the engine's penalty contacts against a two-ring +
floor sphere approximation of the cup cavity.

Reward statistics, phases (stabilize -> trajectory -> cooldown),
constraint violation and the success geometry mirror
``ball_in_a_cup.BallInCupSim`` exactly, so
``episodic.BallInACup(rigid=True)`` drops into the canonical policy
search unchanged. Cross-validation study: studies/rigid_string.py +
RESULTS.md.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ppi_tpu.envs.ball_in_a_cup import (
    BALL_MASS,
    BALL_RADIUS,
    CUP_DEPTH,
    CUP_INNER_RADIUS,
    CUP_OFFSET,
    D_GAINS,
    P_GAINS,
    STRING_LENGTH,
    STRING_MASS,
    _build_arm,
)
from ppi_tpu.envs.physics import ModelBuilder, PhysicsState
from ppi_tpu.envs.physics.engine import HINGE

N_ARM = 4


def _build_model(n_links: int):
    """Arm (identical to ball_in_a_cup._build_arm) + rigid string chain +
    cup collision spheres. Returns (model, ball_geom, n_dof)."""
    b = _builder_from_arm()
    seg = STRING_LENGTH / n_links
    seg_mass = STRING_MASS / n_links
    wrist = N_ARM - 1

    parent = wrist
    first_off = np.asarray(CUP_OFFSET, np.float64)
    for k in range(n_links):
        off = first_off if k == 0 else np.array([0.0, 0.0, -seg])
        # universal joint: hinge about x then y at the same anchor
        # (the XML's J0_i / J1_i pair; damping 1e-4 per joint)
        b.add_body(parent=parent, joint_type=HINGE, axis=(1, 0, 0),
                   offset_pos=off, mass=1e-6,
                   inertia=np.zeros((3, 3)), damping=1e-4, armature=1e-5)
        if k == n_links - 1:
            # fold the ball into the last link: rod + point mass at the tip
            m = seg_mass + BALL_MASS
            com_z = -(seg_mass * seg / 2 + BALL_MASS * seg) / m
            rod_i = seg_mass * seg * seg / 12.0
            ball_i = 0.4 * BALL_MASS * BALL_RADIUS ** 2
            # parallel-axis both parts about the combined com
            d_rod = -seg / 2 - com_z
            d_ball = -seg - com_z
            ixx = (rod_i + seg_mass * d_rod ** 2
                   + ball_i + BALL_MASS * d_ball ** 2)
            inertia = np.diag([ixx, ixx, ball_i + 1e-8])
            b.add_body(parent=len(b._bodies) - 1, joint_type=HINGE,
                       axis=(0, 1, 0), offset_pos=(0, 0, 0), mass=m,
                       com=(0.0, 0.0, com_z), inertia=inertia,
                       damping=1e-4, armature=1e-5)
        else:
            rod_i = seg_mass * seg * seg / 12.0
            b.add_body(parent=len(b._bodies) - 1, joint_type=HINGE,
                       axis=(0, 1, 0), offset_pos=(0, 0, 0), mass=seg_mass,
                       com=(0.0, 0.0, -seg / 2),
                       inertia=np.diag([rod_i, rod_i, 1e-9]),
                       damping=1e-4, armature=1e-5)
        parent = len(b._bodies) - 1

    last = len(b._bodies) - 1
    ball = b.add_sphere(last, (0.0, 0.0, -seg), BALL_RADIUS)

    # cup cavity as penalty-contact spheres on the wrist body: two wall
    # rings (inner face at CUP_INNER_RADIUS) + a large floor sphere whose
    # top surface is the cup base
    rim_r = 0.010
    ring_radius = CUP_INNER_RADIUS + rim_r
    cup = np.asarray(CUP_OFFSET, np.float64)
    for h in (0.018, 0.055):
        for a in np.linspace(0.0, 2 * np.pi, 8, endpoint=False):
            s = b.add_sphere(wrist, tuple(cup + np.array(
                [ring_radius * np.cos(a), ring_radius * np.sin(a), h])),
                rim_r)
            b.add_contact_sphere_sphere(ball, s)
    floor_r = 0.08
    s = b.add_sphere(wrist, tuple(cup + np.array([0.0, 0.0, -floor_r])),
                     floor_r)
    b.add_contact_sphere_sphere(ball, s)

    # contact material sized for the 21 g ball at h = 5e-4 (omega*h ~ 0.24)
    b.contact_stiffness = 5e3
    b.contact_damping = 1.0
    b.friction_mu = 0.3
    b.friction_vel_k = 20.0
    return b.finalize(), ball, N_ARM + 2 * n_links


def _builder_from_arm() -> ModelBuilder:
    """Rebuild the ball_in_a_cup arm inside a fresh ModelBuilder (the
    XPBD module finalizes its builder; we need the pre-finalize form to
    append the chain). Kept in lockstep with ball_in_a_cup._build_arm by
    the agreement test in tests/test_rigid_string.py."""
    import ppi_tpu.envs.ball_in_a_cup as bic

    b = ModelBuilder()
    src = bic._build_arm()
    for i in range(src.nq):
        b.add_body(parent=src.parents[i], joint_type=src.joint_types[i],
                   axis=np.asarray(src.axis[i]),
                   offset_pos=np.asarray(src.offset_pos[i]),
                   offset_rot=np.asarray(src.offset_rot[i]),
                   mass=float(src.mass[i]), com=np.asarray(src.com[i]),
                   inertia=np.asarray(src.inertia[i]),
                   damping=float(src.damping[i]),
                   armature=float(src.armature[i]))
    return b


class RigidBicState(struct.PyTreeNode):
    physics: PhysicsState
    # streamed reward statistics (identical to ball_in_a_cup.BicState)
    max_pot_m: jax.Array
    sum_vel_pen: jax.Array
    sum_pos_pen: jax.Array
    sum_ball_vel_pen: jax.Array
    n_steps: jax.Array
    q0: jax.Array
    violated: jax.Array
    t: jax.Array


@dataclasses.dataclass(frozen=True)
class BallInCupSimRigid:
    """Rigid-string ball-in-a-cup; API-compatible with BallInCupSim."""

    dt: float = 2e-3          # control step (reference effective_dt)
    substeps: int = 4         # h = 5e-4: the XML scene's integrator step
    n_links: int = 12         # 2 DoF each -> 28 total DoF (stacked path)
    stabilize_steps: int = 250
    cooldown_steps: int = 350
    dipole_eps: float = 1e-3
    dipole_beta: float = 1e-1
    min_weight: float = 0.5
    joint_vel_penalty: float = 3e-2
    joint_pos_penalty: float = 7.5e-2
    ball_vel_penalty: float = 0.0
    engine: str = "stacked"   # "tensor": fast-compile CPU test engine

    def __post_init__(self):
        from ppi_tpu.envs.physics.engine_soa import (
            make_body_frames_soa, make_single_step_soa, make_sites_soa)
        model, ball, n_dof = _build_model(self.n_links)
        object.__setattr__(self, "_model", model)
        object.__setattr__(self, "_ball_geom", ball)
        object.__setattr__(self, "n_dof", n_dof)
        if self.engine == "stacked":
            step = make_single_step_soa(model, self.dt, self.substeps,
                                        stacked=True)
        else:
            from ppi_tpu.envs.physics import engine as _te

            def step(q, qd, tau):
                s = _te.step(model, PhysicsState(qpos=q, qvel=qd), tau,
                             self.dt, self.substeps)
                return s.qpos, s.qvel
        object.__setattr__(self, "_step_soa", step)
        object.__setattr__(self, "_sites_soa", make_sites_soa(model))
        object.__setattr__(self, "_frames_soa", make_body_frames_soa(model))

    @property
    def effective_dt(self) -> float:
        return self.dt

    # ---- kinematics --------------------------------------------------
    def cup_frame(self, qpos):
        rot, pos = self._frames_soa(qpos)
        r, p = rot[N_ARM - 1], pos[N_ARM - 1]
        bottom = p + r @ CUP_OFFSET
        up = r[:, 2]
        return bottom, up

    def ball_pos(self, qpos):
        return self._sites_soa(qpos)[self._ball_geom]

    def _ball_hits_robot(self, qpos, ball):
        """Early-stop constraint, identical geometry to the XPBD sim."""
        rot, pts = self._frames_soa(qpos)
        pts, rot = pts[:N_ARM], rot[:N_ARM]
        ends = jnp.concatenate(
            [pts[1:], (pts[3] + rot[3] @ jnp.array([0.2, 0.0, 0.0]))[None]],
            axis=0)
        a, b = pts, ends
        ab = b - a
        t = jnp.clip(jnp.einsum("li,li->l", ball[None] - a, ab)
                     / (jnp.einsum("li,li->l", ab, ab) + 1e-9), 0.0, 1.0)
        closest = a + t[:, None] * ab
        d = jnp.linalg.norm(ball[None] - closest, axis=-1)
        return jnp.any(d < 0.05)

    # ---- full step ----------------------------------------------------
    def step(self, state: RigidBicState, q_des, qd_des):
        q, qd = state.physics.qpos, state.physics.qvel
        tau = jnp.zeros(self.n_dof).at[:N_ARM].set(
            jnp.asarray(P_GAINS) * (q_des - q[:N_ARM])
            + jnp.asarray(D_GAINS) * (qd_des - qd[:N_ARM]))
        qpos, qvel = self._step_soa(q, qd, tau)
        phys = PhysicsState(qpos=qpos, qvel=qvel)

        bottom, up = self.cup_frame(qpos)
        top = bottom + CUP_DEPTH * up
        ball = self.ball_pos(qpos)
        rm = ball - top
        pot_m = jnp.dot(rm, up) / (jnp.dot(rm, rm) + self.dipole_eps)
        violated = state.violated | self._ball_hits_robot(qpos, ball)
        live = 1.0 - violated
        max_pot_m = jnp.where(violated, state.max_pot_m,
                              jnp.maximum(state.max_pot_m, pot_m))
        ball_prev = self.ball_pos(q)
        return state.replace(
            physics=phys,
            max_pot_m=max_pot_m,
            sum_vel_pen=state.sum_vel_pen
            + live * jnp.sum(qvel[:N_ARM] ** 2),
            sum_pos_pen=state.sum_pos_pen
            + live * jnp.sum((qpos[:N_ARM] - state.q0) ** 2),
            sum_ball_vel_pen=state.sum_ball_vel_pen
            + live * jnp.sum(((ball - ball_prev) / self.dt) ** 2),
            n_steps=state.n_steps + live,
            violated=violated,
            t=state.t + 1)

    # ---- episode ------------------------------------------------------
    def reset(self, q0):
        # start the chain hanging straight down in WORLD (the XPBD reset):
        # solve the first universal joint (hinge x then y, axes in the
        # wrist frame R) for R Rx(q1) Ry(q2) e_z = +e_z_world, i.e. the
        # link's -z points down; the remaining links follow at 0
        rot, _ = self._frames_soa(jnp.zeros(self.n_dof).at[:N_ARM].set(q0))
        v = rot[N_ARM - 1].T @ jnp.array([0.0, 0.0, 1.0])
        q2 = jnp.arcsin(jnp.clip(v[0], -1.0, 1.0))
        q1 = jnp.arctan2(-v[1], v[2])
        qpos = (jnp.zeros(self.n_dof).at[:N_ARM].set(q0)
                .at[N_ARM].set(q1).at[N_ARM + 1].set(q2))
        return RigidBicState(
            physics=PhysicsState(qpos=qpos, qvel=jnp.zeros(self.n_dof)),
            max_pot_m=jnp.asarray(-jnp.inf),
            sum_vel_pen=jnp.zeros(()), sum_pos_pen=jnp.zeros(()),
            sum_ball_vel_pen=jnp.zeros(()), n_steps=jnp.zeros(()),
            q0=q0, violated=jnp.zeros((), bool),
            t=jnp.zeros((), jnp.int32))

    def execute_trajectory(self, q0, qs, qds):
        state = self.reset(q0)

        def stab(state, _):
            return self.step(state, q0, jnp.zeros(N_ARM)), None

        state, _ = jax.lax.scan(stab, state, None,
                                length=self.stabilize_steps)
        state = state.replace(sum_vel_pen=jnp.zeros(()),
                              sum_pos_pen=jnp.zeros(()),
                              sum_ball_vel_pen=jnp.zeros(()),
                              n_steps=jnp.zeros(()),
                              max_pot_m=jnp.asarray(-jnp.inf),
                              q0=state.physics.qpos[:N_ARM])

        def traj(state, setpoint):
            q_des, qd_des = setpoint
            return self.step(state, q_des, qd_des), None

        state, _ = jax.lax.scan(traj, state, (qs, qds))

        def cool(state, _):
            return self.step(state, qs[-1], jnp.zeros(N_ARM)), None

        state, _ = jax.lax.scan(cool, state, None,
                                length=self.cooldown_steps)
        return state

    # ---- scoring (identical formulas to BallInCupSim) ------------------
    def reward_and_success(self, state: RigidBicState):
        bottom, up = self.cup_frame(state.physics.qpos)
        ball = self.ball_pos(state.physics.qpos)
        rl = ball - bottom
        pot_l = jnp.dot(rl, up) / (jnp.dot(rl, rl) + self.dipole_eps)
        state_reward = jnp.exp(
            self.min_weight * self.dipole_beta * state.max_pot_m
            + (1.0 - self.min_weight) * self.dipole_beta * pot_l)
        n = jnp.maximum(state.n_steps, 1.0)
        reward = (state_reward
                  - self.joint_vel_penalty * state.sum_vel_pen / n
                  - self.joint_pos_penalty * state.sum_pos_pen / n
                  - self.ball_vel_penalty * state.sum_ball_vel_pen / n)
        reward = jnp.where(state.violated, reward - 1.0, reward)

        h = jnp.dot(rl, up)
        radial = jnp.linalg.norm(rl - h * up)
        success = ((radial <= CUP_INNER_RADIUS)
                   & (h >= 0.0) & (h <= CUP_DEPTH)
                   & ~state.violated)
        return reward, success
