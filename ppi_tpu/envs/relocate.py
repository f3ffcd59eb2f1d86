"""Pick-and-carry environment with a free ball on the articulated core.

TPU-native re-host of the mj_envs ``relocate-v0`` task semantics (reference
env zoo: run_mpc.py:41-42): grasp a free ball resting on a table and carry
it to a target position in the air. The 30-DoF Adroit hand is replaced by a
4-DoF arm with a two-finger caging gripper (one hinge per finger) — the
contact structure (multi-point grasp: two fingertips wrapping below the
ball's equator plus a palm stop above, all real penalty-friction contacts)
and the reward shape (palm-to-ball reach, lift gating, ball-to-target
carry terms, proximity bonuses — mirroring the mj_envs relocate reward) are
preserved; the embodiment is deliberately simpler, like the door/hammer
re-hosts.

The ball is a free body composed as a 3-slide chain (translational DoFs
only — ball spin is irrelevant to the task and to the mj_envs success
criterion, which is purely positional). Fingers hinge about the wrist
axis and swing *under* the ball's equator, so the grasp is held by normal
forces (a cradle), not by smoothed Coulomb friction alone — static under
the engine's penalty contact model.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ppi_tpu.envs.physics import ModelBuilder, PhysicsState
from ppi_tpu.envs.physics.engine import HINGE, SLIDE

YAW, SHOULDER, ELBOW, WRIST, FING_L, FING_R, BALL_X, BALL_Y, BALL_Z = range(9)

TABLE_Z = 0.60
BALL_RADIUS = 0.04
BALL_START = (0.58, 0.0)
# legacy fixed in-air target (fixed_goal=True): +0.24 above the table, 0.18
# sideways from the ball start
TARGET = (0.60, 0.18, 0.88)
# per-episode goal distribution: the reachable subset of the mj_envs
# relocate target distribution (mj_envs: xy ~ U(-0.25, 0.25) about the
# nominal, z ~ table + U(0.15, 0.35)); xy is clipped to the 4-DoF arm's
# comfortable carry workspace (reach sphere ~0.92 m from the base at
# z=0.95) so every sampled goal is kinematically attainable
GOAL_X = (0.50, 0.68)
GOAL_Y = (-0.20, 0.20)
GOAL_Z = (TABLE_Z + 0.15, TABLE_Z + 0.30)
# per-episode object start: mj_envs relocate also samples the BALL's initial
# xy per reset (U(-0.15, 0.15) about nominal); the re-host samples the
# subset that keeps the ball inside the 4-DoF arm's hover-and-grasp
# workspace (same clipping rationale as the goal box above)
START_RANGE = 0.05


def _build_model():
    b = ModelBuilder()
    # --- arm (same class as the door/hammer arm) ---
    b.add_body(parent=-1, joint_type=HINGE, axis=(0, 0, 1),
               offset_pos=(0, 0, TABLE_Z + 0.35), mass=2.0, damping=2.0,
               armature=0.1, q_limit=(-1.5, 1.5), limit_k=50.0)
    b.add_body(parent=YAW, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0, 0, 0), mass=2.0, com=(0.17, 0, 0),
               damping=2.0, armature=0.1, q_limit=(-1.2, 1.2), limit_k=50.0)
    b.add_body(parent=SHOULDER, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0.35, 0, 0), mass=1.5, com=(0.17, 0, 0),
               damping=1.5, armature=0.08, q_limit=(-2.0, 2.0), limit_k=50.0)
    b.add_body(parent=ELBOW, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0.35, 0, 0), mass=0.8, com=(0.08, 0, 0),
               damping=1.0, armature=0.05, q_limit=(-2.0, 2.0), limit_k=50.0)
    # --- fingers: hinge about the wrist's local x (the hand axis); at q=0
    # they hang straight down from knuckles at +/-y; closing (q toward the
    # ball) swings the tips under the ball's equator ---
    b.add_body(parent=WRIST, joint_type=HINGE, axis=(1, 0, 0),
               offset_pos=(0.22, 0.065, 0.0), mass=0.15,
               com=(0.0, 0.0, -0.06), inertia=np.diag([1e-3, 1e-3, 1e-3]),
               damping=0.3, armature=0.02, q_limit=(-1.1, 0.6), limit_k=30.0)
    b.add_body(parent=WRIST, joint_type=HINGE, axis=(1, 0, 0),
               offset_pos=(0.22, -0.065, 0.0), mass=0.15,
               com=(0.0, 0.0, -0.06), inertia=np.diag([1e-3, 1e-3, 1e-3]),
               damping=0.3, armature=0.02, q_limit=(-0.6, 1.1), limit_k=30.0)
    # --- free ball: 3-slide chain, translational DoFs only ---
    bx = b.add_body(parent=-1, joint_type=SLIDE, axis=(1, 0, 0),
                    offset_pos=(BALL_START[0], BALL_START[1],
                                TABLE_Z + BALL_RADIUS),
                    mass=1e-3, armature=1e-4, damping=0.0)
    by = b.add_body(parent=bx, joint_type=SLIDE, axis=(0, 1, 0),
                    offset_pos=(0, 0, 0), mass=1e-3, armature=1e-4,
                    damping=0.0)
    b.add_body(parent=by, joint_type=SLIDE, axis=(0, 0, 1),
               offset_pos=(0, 0, 0), mass=0.10,
               inertia=np.diag([5e-4, 5e-4, 5e-4]), armature=1e-4,
               damping=0.05)

    # geoms — each finger is forked along the hand axis (two tip spheres at
    # local x = +/-0.035), so the closed grasp cages the ball with four
    # contact points below its equator: a cradle held by normal forces,
    # stable in x AND y (a single tip pair leaves x unconstrained and the
    # ball squirts out of the pinch)
    palm = b.add_sphere(WRIST, (0.22, 0.0, 0.0), 0.03)
    tips = [b.add_sphere(FING_L, (-0.035, 0.0, -0.095), 0.018),
            b.add_sphere(FING_L, (0.035, 0.0, -0.095), 0.018),
            b.add_sphere(FING_R, (-0.035, 0.0, -0.095), 0.018),
            b.add_sphere(FING_R, (0.035, 0.0, -0.095), 0.018)]
    ball = b.add_sphere(BALL_Z, (0.0, 0.0, 0.0), BALL_RADIUS)
    table = b.add_plane(normal=(0.0, 0.0, 1.0), offset=TABLE_Z)

    b.add_contact_sphere_sphere(ball, palm)
    for tip in tips:
        b.add_contact_sphere_sphere(ball, tip)
        b.add_contact_sphere_plane(tip, table)
    b.add_contact_sphere_plane(ball, table)
    b.add_contact_sphere_plane(palm, table)
    # stability at h = dt/substeps with the 0.1 kg ball (semi-implicit
    # Euler needs c*h/m < 1): k=2e3 -> omega*h ~ 0.35, c=8 -> c*h/m = 0.2
    b.contact_stiffness = 2e3
    b.contact_damping = 8.0
    b.friction_mu = 1.2
    b.friction_vel_k = 30.0
    return b.finalize(), palm, tuple(tips), ball


def scalar_grasp_ball_sites(m, q, palm_geom, tip_geoms, ball_geom):
    """Scalar-SoA grasp-point/ball positions shared by the relocate and
    fetch-pick reward kernels: grasp = midpoint of the palm and the tip
    centroid (the same definition as the tensor-path ``_sites``)."""
    from ppi_tpu.envs.physics.engine_soa import fk_soa, geom_point_soa
    rots, poss, _, _ = fk_soa(m, q)
    palm = geom_point_soa(m, rots, poss, palm_geom)
    tips = [geom_point_soa(m, rots, poss, g) for g in tip_geoms]
    n = float(len(tips))
    grasp = tuple(0.5 * (sum(t[i] for t in tips) / n + palm[i])
                  for i in range(3))
    ball = geom_point_soa(m, rots, poss, ball_geom)
    return grasp, ball


class RelocateState(struct.PyTreeNode):
    physics: PhysicsState
    target: jax.Array  # sampled per-episode in-air goal position
    t: jax.Array


@dataclasses.dataclass(frozen=True)
class Relocate:
    """relocate-v0-class task; actions are PD position targets for the 4
    arm joints + 2 finger joints (the mj_envs hand also uses position
    servos)."""

    action_dim: int = 6
    dt: float = 0.02
    substeps: int = 8
    kp: float = 60.0
    kd: float = 6.0
    kp_finger: float = 3.0
    kd_finger: float = 0.3
    fixed_goal: bool = False  # True: legacy fixed target (demos/renders)

    name = "relocate-v0"

    def __post_init__(self):
        from ppi_tpu.envs.physics.engine_soa import (
            make_single_step_soa, make_sites_soa)
        model, palm, tips, ball = _build_model()
        object.__setattr__(self, "_model", model)
        object.__setattr__(self, "_palm_geom", palm)
        object.__setattr__(self, "_tip_geoms", tips)
        object.__setattr__(self, "_ball_geom", ball)
        object.__setattr__(self, "_step_soa",
                           make_single_step_soa(model, self.dt, self.substeps))
        object.__setattr__(self, "_sites_soa", make_sites_soa(model))

    @property
    def action_low(self):
        return np.array([-1.5, -1.2, -2.0, -2.0, -1.1, -0.6])

    @property
    def action_high(self):
        return np.array([1.5, 1.2, 2.0, 2.0, 0.6, 1.1])

    @property
    def target(self):
        """Legacy fixed goal (renderer fallback / fixed_goal mode)."""
        return jnp.asarray(TARGET)

    def sample_goal(self, key):
        """In-air goal from the reachable subset of the mj_envs relocate
        target distribution (see GOAL_X/Y/Z)."""
        if self.fixed_goal:
            return jnp.asarray(TARGET)
        lo = jnp.array([GOAL_X[0], GOAL_Y[0], GOAL_Z[0]])
        hi = jnp.array([GOAL_X[1], GOAL_Y[1], GOAL_Z[1]])
        return jax.random.uniform(key, (3,), minval=lo, maxval=hi)

    def sample_start(self, key):
        """Per-episode ball-start xy offset about the nominal BALL_START
        (mj_envs relocate samples the object position too, not only the
        target; see START_RANGE)."""
        if self.fixed_goal:
            return jnp.zeros(2)
        return jax.random.uniform(key, (2,), minval=-START_RANGE,
                                  maxval=START_RANGE)

    def reset(self, key):
        # arm posed with the open gripper hovering just above the nominal
        # ball start (mj_envs starts the hand near the table too), wrist
        # link kept horizontal so the fingers hang straight down; fingers
        # open; goal AND ball start sampled per episode (VERDICT r2 missing
        # #3 / mj_envs reset semantics). The ball's world position is
        # BALL_START + qpos[BALL_X:BALL_Y+1], so the sampled start is pure
        # state — every engine path (tensor/SoA/megakernel) sees it.
        k_goal, k_start = jax.random.split(key)
        start = self.sample_start(k_start)
        qpos = (jnp.zeros(9)
                .at[:6].set(jnp.array([0.0, -0.346, 1.83, -1.484, 0.5, -0.5]))
                .at[BALL_X].set(start[0]).at[BALL_Y].set(start[1]))
        return RelocateState(
            physics=PhysicsState(qpos=qpos, qvel=jnp.zeros(9)),
            target=self.sample_goal(k_goal),
            t=jnp.zeros((), jnp.int32))

    def _sites(self, qpos):
        pts = self._sites_soa(qpos)
        palm = pts[self._palm_geom]
        tips = sum(pts[g] for g in self._tip_geoms) / len(self._tip_geoms)
        grasp = 0.5 * (tips + palm)
        ball = pts[self._ball_geom]
        return palm, grasp, ball

    def step(self, state, action):
        target = jnp.clip(action, self.action_low, self.action_high)
        q, qd = state.physics.qpos, state.physics.qvel
        kp = jnp.array([self.kp] * 4 + [self.kp_finger] * 2)
        kd = jnp.array([self.kd] * 4 + [self.kd_finger] * 2)
        tau = jnp.zeros(9).at[:6].set(kp * (target - q[:6]) - kd * qd[:6])
        qpos, qvel = self._step_soa(q, qd, tau)
        phys = PhysicsState(qpos=qpos, qvel=qvel)

        _, grasp, ball = self._sites(qpos)
        tgt = state.target
        reach = jnp.linalg.norm(grasp - ball)
        carry = jnp.linalg.norm(ball - tgt)
        lifted = ball[2] > TABLE_Z + BALL_RADIUS + 0.015
        # mj_envs relocate-v0 reward shape: reach + lift gate + carry terms
        # + staged proximity bonuses
        reward = (-0.1 * reach
                  + lifted * (1.0 - 0.5 * jnp.linalg.norm(grasp - tgt)
                              - 0.5 * carry)
                  - 1e-4 * jnp.sum(qvel[:6] ** 2)
                  + 10.0 * (carry < 0.1)
                  + 20.0 * (carry < 0.05))
        return state.replace(physics=phys, t=state.t + 1), reward

    # ---- scalar-SoA kernel contract (pallas_rollout) ------------------
    def scalar_torque(self, m, q, qd, act):
        lo = np.asarray(self.action_low)
        hi = np.asarray(self.action_high)
        kps = [self.kp] * 4 + [self.kp_finger] * 2
        kds = [self.kd] * 4 + [self.kd_finger] * 2
        tau = [kps[j] * (jnp.clip(act[j], float(lo[j]), float(hi[j]))
                         - q[j]) - kds[j] * qd[j] for j in range(6)]
        tau += [jnp.zeros_like(q[0])] * 3  # free ball
        return tuple(tau)

    def scalar_reward_consts(self, state):
        return state.target

    def _scalar_sites(self, m, q):
        return scalar_grasp_ball_sites(m, q, self._palm_geom,
                                       self._tip_geoms, self._ball_geom)

    def scalar_reward(self, m, q, qd, consts):
        gx, gy, gz = consts
        grasp, ball = self._scalar_sites(m, q)
        reach = jnp.sqrt((grasp[0] - ball[0]) ** 2 + (grasp[1] - ball[1]) ** 2
                         + (grasp[2] - ball[2]) ** 2)
        carry = jnp.sqrt((ball[0] - gx) ** 2 + (ball[1] - gy) ** 2
                         + (ball[2] - gz) ** 2)
        g2t = jnp.sqrt((grasp[0] - gx) ** 2 + (grasp[1] - gy) ** 2
                       + (grasp[2] - gz) ** 2)
        lifted = ball[2] > TABLE_Z + BALL_RADIUS + 0.015
        vel2 = sum(qd[j] * qd[j] for j in range(6))
        return (-0.1 * reach
                + lifted * (1.0 - 0.5 * g2t - 0.5 * carry)
                - 1e-4 * vel2
                + 10.0 * (carry < 0.1)
                + 20.0 * (carry < 0.05))

    def observe(self, state):
        q, qd = state.physics.qpos, state.physics.qvel
        palm, grasp, ball = self._sites(q)
        tgt = state.target
        return jnp.concatenate([
            q[:6], qd[:6], palm, grasp, ball,
            grasp - ball, ball - tgt, grasp - tgt])

    def success(self, state):
        _, _, ball = self._sites(state.physics.qpos)
        return jnp.linalg.norm(ball - state.target) < 0.1
