"""Ball-in-a-cup on a 4-DoF WAM-class arm — fully on-device.

TPU-native re-host of the reference's flagship episodic task (reference:
policy_search/ball_in_a_cup.py): a PD-torque-controlled 4-DoF arm swings a
ball attached to the cup by a string and must land it in the cup. The
reference runs the MuJoCo C engine (WAM + 29-capsule string) in a process
pool, one sim per trajectory; here the whole batch is one vmapped scan.

Redesigned physics, same task semantics:
  * the arm is a 4-DoF chain on the articulated engine with the reference's
    PD gains (p = [200, 300, 100, 100], d = [7, 15, 5, 2.5]; reference:
    ball_in_a_cup.py:198-199) driving (q, qd) setpoints;
  * the string is a chain of point particles integrated with position-based
    dynamics (XPBD-style distance projection under a fixed iteration scan) —
    inextensible, unconditionally stable under vmap, replacing the 29
    capsule two-hinge bodies (reference scene: ball_in_cup_cylinder.xml);
    the string->arm back-reaction is applied every step through the
    anchor-point Jacobian (J^T F via vjp), by default in the same step via
    a predictor-corrector pass (``same_step_coupling``) — validated
    equivalent to the lagged pass at this mass ratio (RESULTS.md), both
    paths tested;
  * ball-cup contact is a smooth penalty against the cup's capped-cylinder
    SDF; a ball-arm proximity test raises the constraint-violation flag that
    freezes the trace, mirroring the reference's early stop
    (reference: ball_in_a_cup.py:358-366);
  * episode phases: stabilize -> trajectory -> cool-down, with the running
    dipole-potential reward statistics accumulated in the scan carry instead
    of a recorded trace (reference: ball_in_a_cup.py:298-372, 513-650).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ppi_tpu.envs.physics import ModelBuilder, PhysicsState
from ppi_tpu.envs.physics.engine import HINGE

N_PARTICLES = 12          # string discretization (reference: 29 capsules)
STRING_LENGTH = 0.37      # metres, anchor to ball
BALL_MASS = 0.021         # kg (reference scene ball)
STRING_MASS = 0.024       # total string mass, split over the particles so
PARTICLE_MASS = STRING_MASS / N_PARTICLES  # resolution preserves the physics
BALL_RADIUS = 0.02
CUP_INNER_RADIUS = 0.069 / 2.0   # (reference: envs.py:197)
CUP_DEPTH = 0.075

P_GAINS = np.array([200.0, 300.0, 100.0, 100.0])
D_GAINS = np.array([7.0, 15.0, 5.0, 2.5])


def _build_arm():
    """4-DoF WAM-class arm: yaw(z) -> shoulder pitch(y) -> roll(x) ->
    elbow pitch(y), cup at the wrist."""
    b = ModelBuilder()
    b.add_body(parent=-1, joint_type=HINGE, axis=(0, 0, 1),
               offset_pos=(0, 0, 0.85), mass=5.0, com=(0, 0, 0.1),
               inertia=np.diag([0.1, 0.1, 0.05]), damping=1.0, armature=0.1)
    b.add_body(parent=0, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0, 0, 0.2), mass=4.0, com=(0, 0, 0.25),
               inertia=np.diag([0.15, 0.15, 0.02]), damping=1.0, armature=0.1)
    b.add_body(parent=1, joint_type=HINGE, axis=(0, 0, 1),
               offset_pos=(0, 0, 0.5), mass=2.0, com=(0, 0, 0.1),
               inertia=np.diag([0.03, 0.03, 0.01]), damping=0.5,
               armature=0.05)
    # elbow joint frame pre-rotated -90 deg about y so the canonical start
    # q3 = 1.5707 (the task's action_0; reference: envs.py:103-106) puts the
    # forearm horizontal with the ball hanging clear of the arm
    pre = np.array([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]],
                   np.float32)
    b.add_body(parent=2, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0, 0, 0.2), offset_rot=pre, mass=1.5,
               com=(0.15, 0, 0), inertia=np.diag([0.02, 0.02, 0.02]),
               damping=0.5, armature=0.05)
    return b.finalize()


CUP_OFFSET = jnp.array([0.35, 0.0, 0.0])  # cup centre in wrist frame


class BicState(struct.PyTreeNode):
    arm: PhysicsState
    particles: jax.Array       # (P, 3) string particle positions (world)
    particles_prev: jax.Array  # (P, 3) previous positions (Verlet/PBD)
    string_force: jax.Array    # (3,) string reaction on the cup anchor
    # reward accumulators (reference records a trace; we stream the stats)
    max_pot_m: jax.Array
    sum_vel_pen: jax.Array
    sum_pos_pen: jax.Array
    sum_ball_vel_pen: jax.Array
    n_steps: jax.Array
    q0: jax.Array              # initial joint positions (position penalty ref)
    violated: jax.Array        # ball-robot collision latched
    t: jax.Array


@dataclasses.dataclass(frozen=True)
class BallInCupSim:
    """The simulation; consumed by the episodic BallInACup env."""

    dt: float = 2e-3           # effective control step (reference: 5e-4 x 4)
    pbd_iterations: int = 15
    n_particles: int = N_PARTICLES   # string resolution (reference: 29 caps)
    same_step_coupling: bool = True  # predictor-corrector arm<->string step
    #   (False: apply the previous step's string reaction — the lagged path,
    #   equivalent at the 21 g ball / multi-kg arm mass ratio, kept for
    #   comparison studies)
    stabilize_steps: int = 250
    cooldown_steps: int = 350
    dipole_eps: float = 1e-3   # (reference: envs.py:198)
    dipole_beta: float = 1e-1
    min_weight: float = 0.5
    joint_vel_penalty: float = 3e-2
    joint_pos_penalty: float = 7.5e-2
    ball_vel_penalty: float = 0.0

    def __post_init__(self):
        from ppi_tpu.envs.physics.engine_soa import (
            SoaModel, make_body_frames_soa)
        model = _build_arm()
        object.__setattr__(self, "_model", model)
        object.__setattr__(self, "_soa", SoaModel(model))
        object.__setattr__(self, "_frames_soa", make_body_frames_soa(model))

    @property
    def effective_dt(self) -> float:
        return self.dt

    # ---- kinematics of the cup -------------------------------------------
    def cup_frame(self, qpos):
        """(bottom, top, axis) of the cup in world coordinates. The cup hangs
        from the wrist; its mouth points up along the (rotated) wrist +z."""
        rot, pos = self._frames_soa(qpos)
        r, p = rot[3], pos[3]
        bottom = p + r @ CUP_OFFSET
        up = r[:, 2]
        top = bottom + CUP_DEPTH * up
        return bottom, top, up

    # ---- string (PBD) -----------------------------------------------------
    @property
    def _effective_pbd_iterations(self) -> int:
        """Jacobi distance projection converges in O(segments^2) sweeps, so
        the iteration count scales quadratically with string resolution —
        this is what makes ball trajectories resolution-invariant (12 vs 24
        particles agree to ~3 mm RMS; see tests/test_episodic.py)."""
        scale = (self.n_particles / float(N_PARTICLES)) ** 2
        return max(1, int(round(self.pbd_iterations * scale)))

    def _string_rest_lengths(self):
        return STRING_LENGTH / (self.n_particles)

    def _pbd_step(self, particles, particles_prev, anchor, qpos):
        """One Verlet + distance-projection step of the particle chain.
        particles[0] is pinned to the cup anchor; the last particle is the
        ball (heavier -> smaller projection weight)."""
        seg = self._string_rest_lengths()
        dt = self.dt
        masses = jnp.full((self.n_particles + 1,),
                          STRING_MASS / self.n_particles).at[-1].set(
            BALL_MASS)
        w = 1.0 / masses
        w = w.at[0].set(0.0)  # pinned anchor

        vel = (particles - particles_prev) / dt
        acc = jnp.array([0.0, 0.0, -9.81])
        pred = particles + vel * dt * 0.995 + acc * dt * dt
        pred = pred.at[0].set(anchor)

        # Jacobi-style distance projection: both endpoint corrections of each
        # segment are accumulated then applied, so the update is
        # order-independent (vmap/XLA friendly, unlike Gauss-Seidel).
        def jacobi_iter(pred, _):
            a, b = pred[:-1], pred[1:]
            diff = b - a
            dist = jnp.linalg.norm(diff, axis=-1, keepdims=True) + 1e-9
            # rope, not rod: only resist stretching (a compressed string
            # exerts no force)
            corr = jnp.maximum(dist - seg, 0.0) * diff / dist
            wa, wb = w[:-1, None], w[1:, None]
            denom = wa + wb + 1e-9
            da = jnp.zeros_like(pred).at[:-1].add(corr * wa / denom)
            db = jnp.zeros_like(pred).at[1:].add(-corr * wb / denom)
            pred = pred + da + db
            pred = pred.at[0].set(anchor)
            return pred, None

        pred, _ = jax.lax.scan(jacobi_iter, pred, None,
                               length=self._effective_pbd_iterations)

        # ball-vs-cup contact: position projection against the cup solid.
        # The cup is a capped cylinder shell; the wall is a solid annulus
        # [inner, wall_r] over the height band: its INNER face contains a
        # ball that entered through the mouth, its OUTER face repels a
        # laterally approaching ball (branch chosen by the wall midline).
        bottom, top, up = self.cup_frame(qpos)
        ball = pred[-1]
        rel = ball - bottom
        h = jnp.dot(rel, up)
        radial = rel - h * up
        r_norm = jnp.linalg.norm(radial) + 1e-9
        r_dir = radial / r_norm
        wall_r = CUP_INNER_RADIUS + 0.008
        mid_r = 0.5 * (CUP_INNER_RADIUS + wall_r)

        height_band = (h > 0.0) & (h < CUP_DEPTH)
        # inner face: cavity radius available to the ball centre
        cavity_r = CUP_INNER_RADIUS - BALL_RADIUS
        pen_in = r_norm - cavity_r
        inner_hit = height_band & (r_norm < mid_r) & (pen_in > 0.0)
        ball = ball - jnp.where(inner_hit, pen_in, 0.0) * r_dir
        # outer face
        pen_out = (wall_r + BALL_RADIUS) - r_norm
        outer_hit = height_band & (r_norm >= mid_r) & (pen_out > 0.0)
        ball = ball + jnp.where(outer_hit, pen_out, 0.0) * r_dir

        # outside bottom (ball just below the cup base)
        under = (r_norm <= wall_r + BALL_RADIUS) & (h < 0.0) \
            & (h > -BALL_RADIUS)
        ball = ball - jnp.where(under, BALL_RADIUS + h, 0.0) * up

        # inside floor (ball in the cup interior resting on the base)
        inside = (r_norm <= CUP_INNER_RADIUS) & (h >= 0.0) & (h < BALL_RADIUS)
        ball = ball + jnp.where(inside, BALL_RADIUS - h, 0.0) * up

        pred = pred.at[-1].set(ball)
        return pred, particles

    # ---- full step --------------------------------------------------------
    def step(self, state: BicState, q_des, qd_des):
        """One control step: PD torque on the arm + PBD string update +
        reward-statistic accumulation. Returns (state, None)."""
        from ppi_tpu.envs.physics.engine_soa import forward_dynamics_soa
        q, qd = state.arm.qpos, state.arm.qvel
        tau_pd = jnp.asarray(P_GAINS) * (q_des - q) + jnp.asarray(D_GAINS) * (
            qd_des - qd)
        # two-way coupling: the string reaction acts on the arm through the
        # anchor-point Jacobian (J^T F via vjp)
        anchor_fn = lambda qq: self.cup_frame(qq)[0]
        _, vjp_fn = jax.vjp(anchor_fn, q)

        def integrate_arm(reaction):
            tau = tau_pd + vjp_fn(reaction)[0]
            qdd_tuple, _ = forward_dynamics_soa(
                self._soa, tuple(q), tuple(qd), tuple(tau))
            qdd = jnp.stack(qdd_tuple)
            qd_new = qd + self.dt * qdd
            return q + self.dt * qd_new, qd_new

        def string_pass(q_new):
            bottom, _, _ = self.cup_frame(q_new)
            particles, particles_prev = self._pbd_step(
                state.particles, state.particles_prev, bottom, q_new)
            # String reaction on the arm (Newton on non-anchor particles):
            # F_anchor->string = dp/dt - m g  =>  reaction = -F.
            masses = jnp.full((self.n_particles + 1,),
                              STRING_MASS / self.n_particles).at[-1].set(
                BALL_MASS)[1:, None]
            v_new = (particles[1:] - particles_prev[1:]) / self.dt
            v_old = ((state.particles[1:] - state.particles_prev[1:])
                     / self.dt)
            dp = jnp.sum(masses * (v_new - v_old), axis=0) / self.dt
            g_vec = (jnp.array([0.0, 0.0, -9.81])
                     * float(STRING_MASS + BALL_MASS))
            reaction = -(dp - g_vec)
            # clip for robustness against PBD projection spikes
            return particles, particles_prev, jnp.clip(reaction, -30.0, 30.0)

        # predictor: arm integrated with the previous step's reaction
        q_new, qd_new = integrate_arm(state.string_force)
        particles, particles_prev, reaction = string_pass(q_new)
        if self.same_step_coupling:
            # corrector: re-integrate the arm with the reaction computed for
            # THIS step (removes the one-step force lag; used to validate
            # that the lag is immaterial at dt = 2 ms)
            q_new, qd_new = integrate_arm(reaction)
            particles, particles_prev, reaction = string_pass(q_new)
        arm = PhysicsState(qpos=q_new, qvel=qd_new)
        bottom, top, _ = self.cup_frame(q_new)

        # --- streamed reward statistics (reference: ball_in_a_cup.py:513-581)
        ball = particles[-1]
        m_axis = (top - bottom)
        m_axis = m_axis / (jnp.linalg.norm(m_axis) + 1e-9)
        rm = ball - top
        pot_m = jnp.dot(rm, m_axis) / (jnp.dot(rm, rm) + self.dipole_eps)
        violated = state.violated | self._ball_hits_robot(q_new, ball)
        live = 1.0 - violated
        # a violated rollout stops accumulating (frozen trace)
        max_pot_m = jnp.where(violated, state.max_pot_m,
                              jnp.maximum(state.max_pot_m, pot_m))
        state = state.replace(
            arm=arm, particles=particles, particles_prev=particles_prev,
            string_force=reaction,
            max_pot_m=max_pot_m,
            sum_vel_pen=state.sum_vel_pen + live * jnp.sum(qd_new ** 2),
            sum_pos_pen=state.sum_pos_pen
            + live * jnp.sum((q_new - state.q0) ** 2),
            sum_ball_vel_pen=state.sum_ball_vel_pen + live * jnp.sum(
                ((particles[-1] - particles_prev[-1]) / self.dt) ** 2),
            n_steps=state.n_steps + live,
            violated=violated,
            t=state.t + 1)
        return state

    def _ball_hits_robot(self, qpos, ball):
        """Early-stop constraint: ball too close to any arm link segment
        (reference: ball_in_a_cup.py:269-286 contact query)."""
        rot, pts = self._frames_soa(qpos)      # joint origins (4, 3)
        # forearm collision capsule stops short of the cup mount so a caught
        # ball resting in the cup does not read as a robot collision
        ends = jnp.concatenate([pts[1:], (pts[3] + rot[3]
                                          @ jnp.array([0.2, 0.0, 0.0]))[None]],
                               axis=0)
        a, b = pts, ends
        ab = b - a
        t = jnp.clip(jnp.einsum("li,li->l", ball[None] - a, ab)
                     / (jnp.einsum("li,li->l", ab, ab) + 1e-9), 0.0, 1.0)
        closest = a + t[:, None] * ab
        d = jnp.linalg.norm(ball[None] - closest, axis=-1)
        return jnp.any(d < 0.05)

    # ---- episode ----------------------------------------------------------
    def reset(self, q0):
        bottom, top, up = self.cup_frame(q0)
        # string hangs straight down from the cup bottom
        ts = jnp.linspace(0.0, 1.0, self.n_particles + 1)[:, None]
        particles = bottom[None, :] + ts * jnp.array(
            [0.0, 0.0, -STRING_LENGTH])[None, :]
        return BicState(
            arm=PhysicsState(qpos=q0, qvel=jnp.zeros(4)),
            particles=particles, particles_prev=particles,
            string_force=jnp.zeros(3),
            max_pot_m=jnp.asarray(-jnp.inf),
            sum_vel_pen=jnp.zeros(()), sum_pos_pen=jnp.zeros(()),
            sum_ball_vel_pen=jnp.zeros(()), n_steps=jnp.zeros(()),
            q0=q0, violated=jnp.zeros((), bool), t=jnp.zeros((), jnp.int32))

    def execute_trajectory(self, q0, qs, qds):
        """stabilize -> trajectory -> cooldown; returns the final state with
        reward statistics accumulated (reference: ball_in_a_cup.py:298-372).
        qs/qds: (T, 4)."""
        state = self.reset(q0)

        def stab(state, _):
            return self.step(state, q0, jnp.zeros(4)), None

        state, _ = jax.lax.scan(stab, state, None,
                                length=self.stabilize_steps)
        # clear penalties accumulated during stabilization; the reference
        # only scores the executed trajectory + cooldown
        state = state.replace(sum_vel_pen=jnp.zeros(()),
                              sum_pos_pen=jnp.zeros(()),
                              sum_ball_vel_pen=jnp.zeros(()),
                              n_steps=jnp.zeros(()),
                              max_pot_m=jnp.asarray(-jnp.inf),
                              q0=state.arm.qpos)

        def traj(state, setpoint):
            q_des, qd_des = setpoint
            return self.step(state, q_des, qd_des), None

        state, _ = jax.lax.scan(traj, state, (qs, qds))

        def cool(state, _):
            return self.step(state, qs[-1], jnp.zeros(4)), None

        state, _ = jax.lax.scan(cool, state, None, length=self.cooldown_steps)
        return state

    # ---- scoring ----------------------------------------------------------
    def reward_and_success(self, state: BicState):
        """Dipole-potential state reward + penalties; geometric success test
        (reference: ball_in_a_cup.py:513-650)."""
        bottom, top, up = self.cup_frame(state.arm.qpos)
        ball = state.particles[-1]
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
        # violation -> heavily penalized (truncated trace in the reference)
        reward = jnp.where(state.violated, reward - 1.0, reward)

        # success: ball inside the cup cylinder at the final step
        rel = ball - bottom
        h = jnp.dot(rel, up)
        radial = jnp.linalg.norm(rel - h * up)
        success = ((radial <= CUP_INNER_RADIUS)
                   & (h >= 0.0) & (h <= CUP_DEPTH)
                   & ~state.violated)
        return reward, success
