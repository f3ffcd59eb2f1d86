"""Pick-and-carry with articulated digits — the enriched relocate-v0
embodiment.

The reference's relocate-v0 grasps and carries the ball with the 30-DoF
Adroit hand (reference: run_mpc.py:41 + the mj_envs submodule);
``envs.relocate`` uses a two-finger caging gripper (one hinge per finger,
forked tips). This module closes the embodiment gap (VERDICT r2 next #2):
the same 4-DoF arm carries THREE two-hinge digits from the shared hand
builder (envs.hand.add_digit) — index and middle on the +y side at
different reaches, an opposing thumb on the -y side — so the ball is held
by an articulated digit grasp (MCP curl + PIP wrap, 6 digit contacts + palm
stop), not a rigid cage. 10 actuated DoF, 13 total.

Ball model, sampled goal distribution, reward shape and success criterion
are shared with ``envs.relocate`` so gripper-vs-hand results are directly
comparable.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ppi_tpu.envs.hand import add_digit, digit_spheres
from ppi_tpu.envs.physics import ModelBuilder, PhysicsState
from ppi_tpu.envs.physics.engine import HINGE, SLIDE
from ppi_tpu.envs.relocate import (
    BALL_RADIUS,
    BALL_START,
    GOAL_X,
    GOAL_Y,
    GOAL_Z,
    START_RANGE,
    TABLE_Z,
    TARGET,
)

# dof order: arm, then index (mcp, pip), middle (mcp, pip), thumb (mcp,
# pip), then ball x, y, z slides
(YAW, SHOULDER, ELBOW, WRIST,
 IDX_MCP, IDX_PIP, MID_MCP, MID_PIP, TH_MCP, TH_PIP,
 BALL_X, BALL_Y, BALL_Z) = range(13)

N_ACT = 10
L1, L2 = 0.055, 0.05

# +y-side digits curl toward -y (negative mcp), thumb opposes
_LOW = (-1.5, -1.2, -2.0, -2.0, -1.2, -1.4, -1.2, -1.4, -0.6, 0.0)
_HIGH = (1.5, 1.2, 2.0, 2.0, 0.6, 0.0, 0.6, 0.0, 1.2, 1.4)


def _build_model():
    b = ModelBuilder()
    # --- arm (identical to envs.relocate) ---
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
    # --- digits hanging from the wrist, hinging about the hand axis ---
    down = (0.0, 0.0, -1.0)
    cfg = dict(axis=(1, 0, 0), link1=L1, link2=L2, direction=down,
               damping1=0.3, damping2=0.25, limit_k=30.0)
    idx = add_digit(b, WRIST, (0.255, 0.065, 0.0),
                    mcp_limits=(_LOW[4], _HIGH[4]),
                    pip_limits=(_LOW[5], _HIGH[5]), **cfg)
    mid = add_digit(b, WRIST, (0.185, 0.065, 0.0),
                    mcp_limits=(_LOW[6], _HIGH[6]),
                    pip_limits=(_LOW[7], _HIGH[7]), **cfg)
    th = add_digit(b, WRIST, (0.22, -0.065, 0.0),
                   mcp_limits=(_LOW[8], _HIGH[8]),
                   pip_limits=(_LOW[9], _HIGH[9]), **cfg)
    # --- free ball: 3-slide chain (identical to envs.relocate) ---
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

    palm = b.add_sphere(WRIST, (0.22, 0.0, 0.0), 0.03)
    tip_geoms = []
    for ids in (idx, mid, th):
        prox, tip = digit_spheres(b, *ids, link1=L1, link2=L2,
                                  prox_radius=0.017, tip_radius=0.017,
                                  direction=down)
        tip_geoms += [prox, tip]
    ball = b.add_sphere(BALL_Z, (0.0, 0.0, 0.0), BALL_RADIUS)
    table = b.add_plane(normal=(0.0, 0.0, 1.0), offset=TABLE_Z)

    b.add_contact_sphere_sphere(ball, palm)
    for g in tip_geoms:
        b.add_contact_sphere_sphere(ball, g)
        b.add_contact_sphere_plane(g, table)
    b.add_contact_sphere_plane(ball, table)
    b.add_contact_sphere_plane(palm, table)
    # same contact material as envs.relocate
    b.contact_stiffness = 2e3
    b.contact_damping = 8.0
    b.friction_mu = 1.2
    b.friction_vel_k = 30.0
    return b.finalize(), palm, tuple(tip_geoms), ball


class RelocateHandState(struct.PyTreeNode):
    physics: PhysicsState
    target: jax.Array
    t: jax.Array


@dataclasses.dataclass(frozen=True)
class RelocateHand:
    """relocate-v0-class task on the three-digit hand; actions are PD
    position targets for the 4 arm + 6 digit joints."""

    action_dim: int = N_ACT
    dt: float = 0.02
    substeps: int = 8
    kp: float = 60.0
    kd: float = 6.0
    kp_digit: float = 4.0
    kd_digit: float = 0.35
    kp_thumb: float = 8.0   # the thumb opposes two fingers (tripod grasp):
    kd_thumb: float = 0.7   # double gains keep the pinch balanced
    fixed_goal: bool = False
    engine: str = "soa"  # "tensor" for fast CPU compiles (tests)

    name = "relocate-v0-hand"

    def __post_init__(self):
        from ppi_tpu.envs.physics.engine_soa import (
            make_single_step_soa, make_sites_soa)
        model, palm, tips, ball = _build_model()
        object.__setattr__(self, "_model", model)
        object.__setattr__(self, "_palm_geom", palm)
        object.__setattr__(self, "_tip_geoms", tips)
        object.__setattr__(self, "_ball_geom", ball)
        if self.engine == "soa":
            step = make_single_step_soa(model, self.dt, self.substeps)
        else:
            from ppi_tpu.envs.physics import engine as _te

            def step(q, qd, tau):
                s = _te.step(model, PhysicsState(qpos=q, qvel=qd), tau,
                             self.dt, self.substeps)
                return s.qpos, s.qvel
        object.__setattr__(self, "_step_soa", step)
        object.__setattr__(self, "_sites_soa", make_sites_soa(model))

    @property
    def action_low(self):
        return jnp.array(_LOW)

    @property
    def action_high(self):
        return jnp.array(_HIGH)

    @property
    def target(self):
        return jnp.asarray(TARGET)

    def sample_goal(self, key):
        """Same distribution as envs.relocate."""
        if self.fixed_goal:
            return jnp.asarray(TARGET)
        lo = jnp.array([GOAL_X[0], GOAL_Y[0], GOAL_Z[0]])
        hi = jnp.array([GOAL_X[1], GOAL_Y[1], GOAL_Z[1]])
        return jax.random.uniform(key, (3,), minval=lo, maxval=hi)

    def sample_start(self, key):
        """Per-episode ball-start xy offset (mj_envs relocate samples the
        object position too; see relocate.START_RANGE)."""
        if self.fixed_goal:
            return jnp.zeros(2)
        return jax.random.uniform(key, (2,), minval=-START_RANGE,
                                  maxval=START_RANGE)

    def reset(self, key):
        # arm hovers the open hand just above the nominal ball start;
        # digits splayed; goal AND ball start sampled per episode (the
        # ball's world position is BALL_START + qpos[BALL_X:BALL_Y+1], so
        # the sampled start is pure state on every engine path)
        k_goal, k_start = jax.random.split(key)
        start = self.sample_start(k_start)
        qpos = (jnp.zeros(13)
                .at[:N_ACT].set(jnp.array(
                    [0.0, -0.346, 1.83, -1.484, 0.5, 0.0, 0.5, 0.0, -0.5,
                     0.0]))
                .at[BALL_X].set(start[0]).at[BALL_Y].set(start[1]))
        return RelocateHandState(
            physics=PhysicsState(qpos=qpos, qvel=jnp.zeros(13)),
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
        kp = jnp.array([self.kp] * 4 + [self.kp_digit] * 4
                       + [self.kp_thumb] * 2)
        kd = jnp.array([self.kd] * 4 + [self.kd_digit] * 4
                       + [self.kd_thumb] * 2)
        tau = jnp.zeros(13).at[:N_ACT].set(
            kp * (target - q[:N_ACT]) - kd * qd[:N_ACT])
        qpos, qvel = self._step_soa(q, qd, tau)
        phys = PhysicsState(qpos=qpos, qvel=qvel)

        _, grasp, ball = self._sites(qpos)
        tgt = state.target
        reach = jnp.linalg.norm(grasp - ball)
        carry = jnp.linalg.norm(ball - tgt)
        lifted = ball[2] > TABLE_Z + BALL_RADIUS + 0.015
        # identical reward shape to envs.relocate (mj_envs relocate-v0)
        reward = (-0.1 * reach
                  + lifted * (1.0 - 0.5 * jnp.linalg.norm(grasp - tgt)
                              - 0.5 * carry)
                  - 1e-4 * jnp.sum(qvel[:N_ACT] ** 2)
                  + 10.0 * (carry < 0.1)
                  + 20.0 * (carry < 0.05))
        return state.replace(physics=phys, t=state.t + 1), reward

    # ---- scalar-SoA kernel contract (pallas_rollout) ------------------
    def scalar_torque(self, m, q, qd, act):
        kps = [self.kp] * 4 + [self.kp_digit] * 4 + [self.kp_thumb] * 2
        kds = [self.kd] * 4 + [self.kd_digit] * 4 + [self.kd_thumb] * 2
        tau = []
        for j in range(N_ACT):
            tgt = jnp.clip(act[j], _LOW[j], _HIGH[j])
            tau.append(kps[j] * (tgt - q[j]) - kds[j] * qd[j])
        tau += [jnp.zeros_like(q[0])] * 3  # free ball
        return tuple(tau)

    def scalar_reward_consts(self, state):
        """Per-episode kernel constants: the sampled goal position."""
        return state.target

    def scalar_reward(self, m, q, qd, consts):
        from ppi_tpu.envs.physics.engine_soa import fk_soa, geom_point_soa
        gx, gy, gz = consts
        rots, poss, _, _ = fk_soa(m, q)
        palm = geom_point_soa(m, rots, poss, self._palm_geom)
        tips = [geom_point_soa(m, rots, poss, g) for g in self._tip_geoms]
        n = float(len(tips))
        tipx = sum(t[0] for t in tips) / n
        tipy = sum(t[1] for t in tips) / n
        tipz = sum(t[2] for t in tips) / n
        grx = 0.5 * (tipx + palm[0])
        gry = 0.5 * (tipy + palm[1])
        grz = 0.5 * (tipz + palm[2])
        ball = geom_point_soa(m, rots, poss, self._ball_geom)
        reach = jnp.sqrt((grx - ball[0]) ** 2 + (gry - ball[1]) ** 2
                         + (grz - ball[2]) ** 2)
        carry = jnp.sqrt((ball[0] - gx) ** 2 + (ball[1] - gy) ** 2
                         + (ball[2] - gz) ** 2)
        g2t = jnp.sqrt((grx - gx) ** 2 + (gry - gy) ** 2 + (grz - gz) ** 2)
        lifted = ball[2] > TABLE_Z + BALL_RADIUS + 0.015
        vel2 = sum(qd[j] * qd[j] for j in range(N_ACT))
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
            q[:N_ACT], qd[:N_ACT], palm, grasp, ball,
            grasp - ball, ball - tgt, grasp - tgt])

    def success(self, state):
        _, _, ball = self._sites(state.physics.qpos)
        return jnp.linalg.norm(ball - state.target) < 0.1


# ---------------------------------------------------------------------------
# scripted expert (feasibility oracle + render demo)
# ---------------------------------------------------------------------------

# the gentle "basket" curl: MCP-dominant swing puts the six digit spheres
# under the ball's lower hemisphere (normals pointing up — a cradle held by
# normal forces); deeper PIP wrap turns the cradle into an equator pinch
# that ejects the ball (watermelon-seed instability, observed in tuning)
GRIP_FINGER = (-0.45, -0.05)
GRIP_THUMB = (0.45, 0.05)

# the same wrist-level carry waypoints as the envs.relocate scripted test
CARRY_POSES = ((0.0, -0.45, 1.82, -1.40),
               (0.07, -0.60, 1.85, -1.28),
               (0.15, -0.75, 1.88, -1.15),
               (0.22, -0.87, 1.91, -1.05),
               (0.291, -1.20, 1.80, -0.75))


def scripted_carry(env, state0=None, frames=None):
    """Hand-scripted grasp-and-carry to the legacy fixed goal: curl the
    three digits into a basket under the ball, then walk the arm through
    the carry waypoints. Returns (final_state, info).

    Feasibility oracle for the digit grasp (the analogue of
    door_hand.scripted_open); MPC discovers its own strategy through the
    staged reward. Use ``fixed_goal=True`` — the waypoints end at the
    legacy TARGET.
    """
    import numpy as np

    state = env.reset(jax.random.key(0)) if state0 is None else state0
    hold = state.physics.qpos[:N_ACT]
    grip = (hold.at[IDX_MCP].set(GRIP_FINGER[0])
            .at[IDX_PIP].set(GRIP_FINGER[1])
            .at[MID_MCP].set(GRIP_FINGER[0]).at[MID_PIP].set(GRIP_FINGER[1])
            .at[TH_MCP].set(GRIP_THUMB[0]).at[TH_PIP].set(GRIP_THUMB[1]))

    def seg(s, tgt, n):
        def body(st, _):
            st, _ = env.step(st, tgt)
            return st, st.physics.qpos
        return jax.lax.scan(body, s, None, length=n)

    seg = jax.jit(seg, static_argnums=2)

    def run(s, tgt, n):
        s, qh = seg(s, tgt, n)
        if frames is not None:
            frames.append(np.asarray(qh))
        return s

    state = run(state, grip, 60)
    _, _, ball_grip = env._sites(state.physics.qpos)
    for p in CARRY_POSES:
        state = run(state, jnp.concatenate([jnp.array(p), grip[4:]]), 40)
    _, _, ball = env._sites(state.physics.qpos)
    return state, {
        "ball_after_grip": ball_grip,
        "ball": ball,
        "dist": float(jnp.linalg.norm(ball - state.target)),
        "success": bool(env.success(state)),
    }
