"""Pick-and-carry with a FIVE-digit, 21-actuated-DoF Adroit-class hand.

The reference's relocate-v0 grasps and carries the ball with the 30-DoF
Adroit hand (reference: run_mpc.py:41 + the mj_envs submodule). The
round-2/3 ``envs.relocate_hand`` used a three-digit 10-DoF hand; this
module closes the remaining embodiment gap (VERDICT r3 next #1): the same
4-DoF arm gains a 2-DoF wrist (pronation + deviation) and carries FIVE
down-pointing digits — four fingers on the +y side spanning the ball,
an opposing thumb on the -y side — each with an abduction joint ahead of
the MCP/PIP flexion chain (``envs.hand.add_digit3``). 21 actuated DoF,
24 total with the free ball, on the stacked-assembly dynamics path.

Ball model, sampled goal/start distributions, reward shape and success
criterion are shared with ``envs.relocate`` / ``envs.relocate_hand`` so
gripper vs 3-digit vs Adroit-class results are directly comparable.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ppi_tpu.envs.hand import add_digit3
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

# dof order: arm, wrist, 5 x (ABD, MCP, PIP), then ball x/y/z slides
(YAW, SHOULDER, ELBOW, WRIST, PRON, DEV,
 FF_ABD, FF_MCP, FF_PIP,
 MF_ABD, MF_MCP, MF_PIP,
 RF_ABD, RF_MCP, RF_PIP,
 LF_ABD, LF_MCP, LF_PIP,
 TH_ABD, TH_MCP, TH_PIP,
 BALL_X, BALL_Y, BALL_Z) = range(24)

N_ACT = 21
L1, L2 = 0.055, 0.05

# +y-side fingers curl toward -y (negative mcp), thumb opposes; ABD splays
# the down-pointing digit along x (rotation about y)
_FING = dict(abd=(-0.25, 0.25), mcp=(-1.2, 0.6), pip=(-1.4, 0.0))
_THUMB = dict(abd=(-0.35, 0.35), mcp=(-0.6, 1.2), pip=(0.0, 1.4))

# elbow range ±2.4: the level-palm workspace must cover both the grasp
# cap (palm at x=0.58, z=0.72 — needs 2.03 rad of elbow fold; the ±2.0
# of envs.relocate binds exactly there and leaves the palm 6 mm
# off-centre, which steadily squirts the ball -x during the grip) and
# the carry ceiling (palm at z=0.94 over the 0.88-high goal — needs
# 2.3 rad). The reference mounts the Adroit hand on a free-floating
# translation base (mj_envs relocate-v0 ARTx/y/z), so the arm's joint
# ranges are this embodiment's design choice.
_LOW = ((-1.5, -1.2, -2.4, -2.0, -1.0, -0.6)
        + (_FING["abd"][0], _FING["mcp"][0], _FING["pip"][0]) * 4
        + (_THUMB["abd"][0], _THUMB["mcp"][0], _THUMB["pip"][0]))
_HIGH = ((1.5, 1.2, 2.4, 2.0, 1.0, 0.6)
         + (_FING["abd"][1], _FING["mcp"][1], _FING["pip"][1]) * 4
         + (_THUMB["abd"][1], _THUMB["mcp"][1], _THUMB["pip"][1]))

# finger knuckle x-positions on the palm (+y side); thumb centred opposite
_FINGER_X = (0.285, 0.235, 0.185, 0.135)
_THUMB_X = 0.21


def _build_model():
    b = ModelBuilder()
    # --- arm (identical to envs.relocate / relocate_hand) ---
    b.add_body(parent=-1, joint_type=HINGE, axis=(0, 0, 1),
               offset_pos=(0, 0, TABLE_Z + 0.35), mass=2.0, damping=2.0,
               armature=0.1, q_limit=(-1.5, 1.5), limit_k=50.0)
    b.add_body(parent=YAW, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0, 0, 0), mass=2.0, com=(0.17, 0, 0),
               damping=2.0, armature=0.1, q_limit=(-1.2, 1.2), limit_k=50.0)
    b.add_body(parent=SHOULDER, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0.35, 0, 0), mass=1.5, com=(0.17, 0, 0),
               damping=1.5, armature=0.08, q_limit=(-2.4, 2.4), limit_k=50.0)
    b.add_body(parent=ELBOW, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0.35, 0, 0), mass=0.6, com=(0.06, 0, 0),
               damping=1.0, armature=0.05, q_limit=(-2.0, 2.0), limit_k=50.0)
    # --- 2-DoF wrist: pronation about the forearm axis + deviation about
    # the vertical; the deviation body is the palm plate ---
    b.add_body(parent=WRIST, joint_type=HINGE, axis=(1, 0, 0),
               offset_pos=(0.06, 0, 0), mass=0.05,
               inertia=np.diag([2e-5, 2e-5, 2e-5]), damping=0.5,
               armature=0.02, q_limit=(_LOW[PRON], _HIGH[PRON]),
               limit_k=30.0)
    b.add_body(parent=PRON, joint_type=HINGE, axis=(0, 0, 1),
               offset_pos=(0.02, 0, 0), mass=0.30, com=(0.12, 0, 0),
               inertia=np.diag([4e-4, 4e-4, 4e-4]), damping=0.5,
               armature=0.02, q_limit=(_LOW[DEV], _HIGH[DEV]), limit_k=30.0)
    # --- five down-pointing digits on the palm plate ---
    down = (0.0, 0.0, -1.0)
    cfg = dict(abd_axis=(0, 1, 0), curl_axis=(1, 0, 0), link1=L1, link2=L2,
               direction=down, damping1=0.3, damping2=0.25, limit_k=30.0)
    for x in _FINGER_X:
        add_digit3(b, DEV, (x, 0.065, 0.0), abd_limits=_FING["abd"],
                   mcp_limits=_FING["mcp"], pip_limits=_FING["pip"], **cfg)
    add_digit3(b, DEV, (_THUMB_X, -0.065, 0.0), abd_limits=_THUMB["abd"],
               mcp_limits=_THUMB["mcp"], pip_limits=_THUMB["pip"], **cfg)
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

    palm = b.add_sphere(DEV, (0.21, 0.0, 0.0), 0.03)
    tip_geoms = []
    for mcp, pip in ((FF_MCP, FF_PIP), (MF_MCP, MF_PIP), (RF_MCP, RF_PIP),
                     (LF_MCP, LF_PIP), (TH_MCP, TH_PIP)):
        prox = b.add_sphere(mcp, tuple(L1 * 0.6 * np.asarray(down)), 0.016)
        tip = b.add_sphere(pip, tuple(L2 * np.asarray(down)), 0.016)
        tip_geoms += [prox, tip]
    ball = b.add_sphere(BALL_Z, (0.0, 0.0, 0.0), BALL_RADIUS)
    table = b.add_plane(normal=(0.0, 0.0, 1.0), offset=TABLE_Z)

    b.add_contact_sphere_sphere(ball, palm)
    for g in tip_geoms:
        b.add_contact_sphere_sphere(ball, g)
        b.add_contact_sphere_plane(g, table)
    b.add_contact_sphere_plane(ball, table)
    b.add_contact_sphere_plane(palm, table)
    # same contact material as envs.relocate / relocate_hand
    b.contact_stiffness = 2e3
    b.contact_damping = 8.0
    b.friction_mu = 1.2
    b.friction_vel_k = 30.0
    return b.finalize(), palm, tuple(tip_geoms), ball


class RelocateAdroitState(struct.PyTreeNode):
    physics: PhysicsState
    target: jax.Array
    t: jax.Array


@dataclasses.dataclass(frozen=True)
class RelocateAdroit:
    """relocate-v0-class task on the five-digit Adroit-class hand; actions
    are PD position targets for the 4 arm + 2 wrist + 15 digit joints."""

    action_dim: int = N_ACT
    dt: float = 0.02
    substeps: int = 8
    kp: float = 60.0
    kd: float = 6.0
    kp_wrist: float = 15.0
    kd_wrist: float = 1.2
    kp_digit: float = 4.0
    kd_digit: float = 0.35
    kp_thumb: float = 8.0   # the thumb opposes four fingers: double gains
    kd_thumb: float = 0.7   # keep the pinch balanced (relocate_hand note)
    kp_abd: float = 3.0
    kd_abd: float = 0.3
    fixed_goal: bool = False
    engine: str = "stacked"  # 24-DoF scene: stacked-assembly only;
    #                          "tensor" is the fast-compile CPU test engine

    name = "relocate-v0-adroit"

    def __post_init__(self):
        from ppi_tpu.envs.physics.engine_soa import (
            make_single_step_soa, make_sites_soa)
        model, palm, tips, ball = _build_model()
        object.__setattr__(self, "_model", model)
        object.__setattr__(self, "_palm_geom", palm)
        object.__setattr__(self, "_tip_geoms", tips)
        object.__setattr__(self, "_ball_geom", ball)
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
        """Per-episode ball-start xy offset (envs.relocate.START_RANGE)."""
        if self.fixed_goal:
            return jnp.zeros(2)
        return jax.random.uniform(key, (2,), minval=-START_RANGE,
                                  maxval=START_RANGE)

    # reset arm posture: level palm centred exactly over the nominal
    # ball start at z=0.72 (palm bottom 1 cm above the ball top), the
    # measured hover of the working relocate_hand tripod; gradient-IK'd
    # with a palm-level penalty. A centred cap matters: a 6 mm x-offset
    # palm contact steadily squirts the ball -x during the grip
    _reset_arm = (0.0, -0.3424, 2.0269, -1.6851, 0.0, 0.0)
    _reset_digits = (0.0, 0.5, 0.0) * 4 + (0.0, -0.5, 0.0)

    def reset(self, key):
        k_goal, k_start = jax.random.split(key)
        start = self.sample_start(k_start)
        qpos = (jnp.zeros(24)
                .at[:N_ACT].set(jnp.array(self._reset_arm
                                          + self._reset_digits))
                .at[BALL_X].set(start[0]).at[BALL_Y].set(start[1]))
        return RelocateAdroitState(
            physics=PhysicsState(qpos=qpos, qvel=jnp.zeros(24)),
            target=self.sample_goal(k_goal),
            t=jnp.zeros((), jnp.int32))

    def _gains(self):
        digit = ([self.kp_abd, self.kp_digit, self.kp_digit] * 4
                 + [self.kp_abd, self.kp_thumb, self.kp_thumb])
        digit_d = ([self.kd_abd, self.kd_digit, self.kd_digit] * 4
                   + [self.kd_abd, self.kd_thumb, self.kd_thumb])
        kp = jnp.array([self.kp] * 4 + [self.kp_wrist] * 2 + digit)
        kd = jnp.array([self.kd] * 4 + [self.kd_wrist] * 2 + digit_d)
        return kp, kd

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
        kp, kd = self._gains()
        tau = jnp.zeros(24).at[:N_ACT].set(
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
    # Same megakernel contract as envs.relocate_hand, at 24 DoF (21
    # actuated + free ball): the whole-rollout Pallas kernel is the
    # latency path for the canonical 256-sample control step (see
    # studies/adroit_latency.py for the XLA-scan vs kernel numbers on the
    # door sibling).
    def scalar_torque(self, m, q, qd, act):
        digit = ([self.kp_abd, self.kp_digit, self.kp_digit] * 4
                 + [self.kp_abd, self.kp_thumb, self.kp_thumb])
        digit_d = ([self.kd_abd, self.kd_digit, self.kd_digit] * 4
                   + [self.kd_abd, self.kd_thumb, self.kd_thumb])
        kps = [self.kp] * 4 + [self.kp_wrist] * 2 + digit
        kds = [self.kd] * 4 + [self.kd_wrist] * 2 + digit_d
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

# gentle basket curl (relocate_hand note: MCP-dominant swing cradles the
# ball under its lower hemisphere; deep PIP wrap ejects it)
GRIP_FINGER = (0.0, -0.45, -0.05)
GRIP_THUMB = (0.0, 0.45, 0.05)


def _ik_palm(env, state, target_pt, qa_init, digits, iters=800, lr=0.04,
             level_weight=0.05):
    """Gradient IK for the palm over the 4 arm joints (wrist + digits
    held), with a palm-level penalty so the basket stays upright."""
    lo = jnp.array(_LOW)
    hi = jnp.array(_HIGH)

    def obj(qa4):
        q = jnp.concatenate([qa4, jnp.zeros(2), digits,
                             state.physics.qpos[N_ACT:]])
        p = env._sites_soa(q)[env._palm_geom]
        lvl = (qa4[1] + qa4[2] + qa4[3]) ** 2
        return jnp.sum((p - target_pt) ** 2) + level_weight * lvl

    g = jax.jit(jax.grad(obj))
    qa = qa_init
    for _ in range(iters):
        qa = jnp.clip(qa - lr * g(qa), lo[:4], hi[:4])
    return qa


def scripted_carry(env, state0=None, frames=None, log=None):
    """Hand-scripted grasp-and-carry: curl the five digits into a basket
    under the ball, then walk the level palm up a waypoint ladder and
    laterally to the goal with a droop-compensating servo. Unlike
    ``relocate_hand.scripted_carry``'s fixed joint-space waypoints, the
    carry is IK-derived (the 2-DoF wrist changes the arm kinematics, so
    joint-space poses don't transfer) AND closed-loop: the PD arm droops
    ~15 cm under gravity at the carry ceiling, so each IK target is
    inflated by the measured palm error (3 correction passes/waypoint)."""
    state = env.reset(jax.random.key(0)) if state0 is None else state0
    hold = state.physics.qpos[:N_ACT]
    grip = hold.at[6:].set(jnp.array(GRIP_FINGER * 4 + GRIP_THUMB))

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

    def note(msg):
        if log:
            log(msg)

    def pos(s):
        pts = env._sites_soa(s.physics.qpos)
        return (np.asarray(pts[env._palm_geom]),
                np.asarray(pts[env._ball_geom]))

    # 1) basket curl (single-stage: a second tighten pass squirts the
    # ball +y out of the cage — measured, do not re-add)
    state = run(state, grip, 60)
    p, ball_grip = pos(state)
    note(f"gripped: ball={ball_grip.round(3)}")

    # 2) waypoint ladder: straight lift over the grasp point, then
    # lateral to above the goal, palm kept level
    tgt = np.asarray(state.target)
    cruise = np.array([0.58, 0.0, 0.95])
    goal_palm = tgt + np.array([0.0, 0.0, p[2] - ball_grip[2]])
    ups = [np.array([0.58, 0.0, z]) for z in np.arange(0.74, 0.96, 0.03)]
    lats = [cruise + a * (goal_palm - cruise)
            for a in np.linspace(0.2, 1.0, 6)]
    qa = state.physics.qpos[:4]
    infl = np.zeros(3)  # persistent gravity-droop compensation
    digits = grip[6:]
    cmd = grip
    for i, wp in enumerate(ups + lats):
        for _ in range(3):
            qa = _ik_palm(env, state, jnp.asarray(wp + infl), qa, digits,
                          iters=1000, lr=0.05)
            cmd = jnp.concatenate([qa, jnp.zeros(2), digits])
            state = run(state, cmd, 12)
            p, b = pos(state)
            infl = np.clip(infl + 0.8 * (wp - p), -0.25, 0.25)
        note(f"wp{i}: palm={p.round(3)} ball={b.round(3)}")
    state = run(state, cmd, 40)
    _, _, ball = env._sites(state.physics.qpos)
    return state, {
        "ball_after_grip": ball_grip,
        "ball": ball,
        "dist": float(jnp.linalg.norm(ball - state.target)),
        "success": bool(env.success(state)),
    }
