"""In-hand pen reorientation with a FIVE-digit, 15-actuated-DoF
Adroit-class finger set.

The reference's pen-v0 reorients the pen with the 24-DoF Adroit hand whose
forearm is frozen (reference: run_mpc.py:41 + the mj_envs submodule).
``envs.pen_hand`` closed part of the embodiment gap with three two-hinge
digits; this module completes the dexterous four-task coverage on the
Adroit-class knuckle structure (VERDICT r3 next #1 carried to the last two
tasks): FIVE three-hinge digits (``envs.hand.add_digit3`` — abduction +
MCP + PIP, the mj_envs knuckle layout) around the same compliant free-pen
model. Four fingers mount below the rod pointing up, staggered along the
rod axis like the Adroit hand's finger rake; an opposing thumb mounts
above mid-rod pointing down. The abduction hinges rotate about y, sweeping
each fingertip ALONG the rod axis — the splay DoF the 3-digit hand lacks,
and the one that lets a five-finger hand walk the pen around (the mj_envs
pen-twirl mechanic). 15 actuated DoF, 20 total.

Reward shape, compliant hold, sampled goal distribution (yaw/pitch ~
U(-1,1) rad) and success criterion are shared with ``envs.pen`` /
``envs.pen_hand`` so fingertip vs 3-digit vs five-digit results overlay.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ppi_tpu.envs.hand import add_digit3, digit_spheres
from ppi_tpu.envs.pen import (
    GOAL_RANGE,
    HOLD_POS,
    PEN_HALF,
    axis_from_angles,
    scalar_pen_pose,
    target_axis,
)
from ppi_tpu.envs.physics import ModelBuilder, PhysicsState
from ppi_tpu.envs.physics.engine import HINGE, SLIDE

# dof order: pen x,y,z slides + yaw + pitch, then FF/MF/RF/LF fingers
# (+x -> -x along the rod) and the thumb, each (ABD, MCP, PIP)
(PEN_X, PEN_Y, PEN_Z, PEN_YAW, PEN_PITCH,
 FF_ABD, FF_MCP, FF_PIP,
 MF_ABD, MF_MCP, MF_PIP,
 RF_ABD, RF_MCP, RF_PIP,
 LF_ABD, LF_MCP, LF_PIP,
 TH_ABD, TH_MCP, TH_PIP) = range(20)

N_ACT = 15
L1, L2 = 0.055, 0.05          # digit link lengths (as pen_hand)
DIGIT_DROP = 0.06             # finger mounts this far below the rod centre
THUMB_RISE = 0.07             # thumb mount this far above

# finger mounts staggered along the rod (world x, the frozen-forearm frame)
_FINGER_X = (0.07, 0.025, -0.025, -0.07)

_ABD = (-0.45, 0.45)
_MCP = (-1.3, 1.3)
_PIP = (-2.2, 2.2)
_LOW = (_ABD[0], _MCP[0], _PIP[0]) * 5
_HIGH = (_ABD[1], _MCP[1], _PIP[1]) * 5


def _build_model():
    b = ModelBuilder()
    # --- pen: identical compliant free body to envs.pen / pen_hand ---
    p = b.add_body(parent=-1, joint_type=SLIDE, axis=(1, 0, 0),
                   offset_pos=HOLD_POS, mass=1e-3, armature=1e-4,
                   damping=0.0, spring_k=50.0, spring_ref=0.0)
    p = b.add_body(parent=p, joint_type=SLIDE, axis=(0, 1, 0),
                   offset_pos=(0, 0, 0), mass=1e-3, armature=1e-4,
                   damping=0.5, spring_k=50.0, spring_ref=0.0)
    p = b.add_body(parent=p, joint_type=SLIDE, axis=(0, 0, 1),
                   offset_pos=(0, 0, 0), mass=1e-3, armature=1e-4,
                   damping=1.0, spring_k=50.0, spring_ref=0.0)
    p = b.add_body(parent=p, joint_type=HINGE, axis=(0, 0, 1),
                   offset_pos=(0, 0, 0), mass=1e-3, armature=1e-3,
                   damping=0.05)
    b.add_body(parent=p, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0, 0, 0), mass=0.05,
               inertia=np.diag([1e-4, 3e-4, 3e-4]), armature=1e-3,
               damping=0.05)
    # --- five digits (world-mounted: the palm is the frozen forearm
    # frame, as in pen_hand). Curl about x (tips sweep the y-z plane);
    # abduction about y sweeps tips along the rod axis x. ---
    up, down = (0.0, 0.0, 1.0), (0.0, 0.0, -1.0)
    digit_cfg = dict(abd_axis=(0, 1, 0), curl_axis=(1, 0, 0),
                     abd_limits=_ABD, mcp_limits=_MCP, pip_limits=_PIP,
                     link1=L1, link2=L2, damping_abd=0.35, damping1=0.35,
                     damping2=0.3)
    ids = []
    for x in _FINGER_X:
        ids.append(add_digit3(b, -1, (x + HOLD_POS[0], 0.0,
                                      HOLD_POS[2] - DIGIT_DROP),
                              direction=up, **digit_cfg))
    ids.append(add_digit3(b, -1, (HOLD_POS[0], 0.0,
                                  HOLD_POS[2] + THUMB_RISE),
                          direction=down, **digit_cfg))

    # geoms: pen end spheres define the rod segment; prox+tip per digit
    end_a = b.add_sphere(PEN_PITCH, (PEN_HALF, 0, 0), 0.012)
    end_b = b.add_sphere(PEN_PITCH, (-PEN_HALF, 0, 0), 0.012)
    tip_geoms = []
    for (abd, mcp, pip), direction in zip(ids, [up] * 4 + [down]):
        prox, tip = digit_spheres(b, mcp, pip, link1=L1, link2=L2,
                                  prox_radius=0.015, tip_radius=0.015,
                                  direction=direction)
        b.add_contact_sphere_segment(prox, end_a, end_b)
        b.add_contact_sphere_segment(tip, end_a, end_b)
        tip_geoms.append(tip)
    # same contact material as envs.pen / pen_hand
    b.contact_stiffness = 2e3
    b.contact_damping = 5.0
    b.friction_mu = 0.8
    b.friction_vel_k = 30.0
    return b.finalize(), (end_a, end_b), tuple(tip_geoms)


class PenAdroitState(struct.PyTreeNode):
    physics: PhysicsState
    target_axis: jax.Array
    t: jax.Array


@dataclasses.dataclass(frozen=True)
class PenAdroit:
    """pen-v0-class task on five three-hinge digits; actions are PD
    position targets for the 15 digit joints."""

    action_dim: int = N_ACT
    dt: float = 0.02
    substeps: int = 8  # as pen_hand: the 0.05 kg pen needs h = 2.5 ms
    kp: float = 3.0
    kd: float = 0.25
    kp_abd: float = 2.0
    kd_abd: float = 0.2
    fixed_goal: bool = False
    engine: str = "stacked"  # 20-DoF scene: stacked assembly path
    #                          ("tensor" is the fast-compile CPU test
    #                          engine, as door/relocate_adroit)

    name = "pen-v0-adroit"

    def __post_init__(self):
        from ppi_tpu.envs.physics.engine_soa import (
            make_single_step_soa, make_sites_soa)
        model, ends, tips = _build_model()
        object.__setattr__(self, "_model", model)
        object.__setattr__(self, "_end_geoms", ends)
        object.__setattr__(self, "_tip_geoms", tips)
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
        object.__setattr__(self, "_target_axis", jnp.asarray(target_axis()))

    @property
    def action_low(self):
        return jnp.array(_LOW)

    @property
    def action_high(self):
        return jnp.array(_HIGH)

    def sample_goal(self, key):
        """Same distribution as envs.pen: yaw/pitch ~ U(-1, 1) rad."""
        if self.fixed_goal:
            return jnp.asarray(self._target_axis)
        yaw, pitch = jax.random.uniform(
            key, (2,), minval=-GOAL_RANGE, maxval=GOAL_RANGE)
        return axis_from_angles(yaw, pitch)

    def reset(self, key):
        # digits poised just clear of the rod: alternate MCP curl forms a
        # zigzag cradle in y (the pen_hand A/B cradle, extended), thumb
        # lifted above
        qpos = (jnp.zeros(20)
                .at[FF_MCP].set(0.35).at[MF_MCP].set(-0.35)
                .at[RF_MCP].set(0.35).at[LF_MCP].set(-0.35)
                .at[TH_MCP].set(0.3))
        return PenAdroitState(
            physics=PhysicsState(qpos=qpos, qvel=jnp.zeros(20)),
            target_axis=self.sample_goal(key),
            t=jnp.zeros((), jnp.int32))

    def _gains(self):
        kp = jnp.array([self.kp_abd, self.kp, self.kp] * 5)
        kd = jnp.array([self.kd_abd, self.kd, self.kd] * 5)
        return kp, kd

    def _pen_pose(self, qpos):
        pts = self._sites_soa(qpos)
        ea, eb = pts[self._end_geoms[0]], pts[self._end_geoms[1]]
        centre = 0.5 * (ea + eb)
        axis = (ea - eb) / (jnp.linalg.norm(ea - eb) + 1e-9)
        return centre, axis

    def step(self, state, action):
        target = jnp.clip(action, self.action_low, self.action_high)
        q, qd = state.physics.qpos, state.physics.qvel
        kp, kd = self._gains()
        tau = jnp.zeros(20).at[FF_ABD:].set(
            kp * (target - q[FF_ABD:]) - kd * qd[FF_ABD:])
        qpos, qvel = self._step_soa(q, qd, tau)
        phys = PhysicsState(qpos=qpos, qvel=qvel)

        centre, axis = self._pen_pose(qpos)
        dist = jnp.linalg.norm(centre - jnp.asarray(HOLD_POS))
        similarity = jnp.dot(axis, state.target_axis)
        dropped = centre[2] < HOLD_POS[2] - 0.15
        # identical reward shape to envs.pen / pen_hand (mj_envs pen-v0)
        reward = (-1.0 * dist
                  + similarity
                  - 1e-3 * jnp.sum(qvel[:5] ** 2)
                  + 10.0 * ((similarity > 0.90) & (dist < 0.075))
                  + 50.0 * ((similarity > 0.95) & (dist < 0.075))
                  - 5.0 * dropped)
        return state.replace(physics=phys, t=state.t + 1), reward

    # ---- scalar-SoA kernel contract (pallas_rollout) ------------------
    def scalar_torque(self, m, q, qd, act):
        kps = [self.kp_abd, self.kp, self.kp] * 5
        kds = [self.kd_abd, self.kd, self.kd] * 5
        tau = [jnp.zeros_like(q[0]) for _ in range(5)]
        for j in range(N_ACT):
            tgt = jnp.clip(act[j], _LOW[j], _HIGH[j])
            tau.append(kps[j] * (tgt - q[FF_ABD + j])
                       - kds[j] * qd[FF_ABD + j])
        return tuple(tau)

    def scalar_reward_consts(self, state):
        """Per-episode kernel constants: the sampled goal axis."""
        return state.target_axis

    def scalar_reward(self, m, q, qd, consts):
        tx, ty, tz = consts
        (cx, cy, cz), (ax, ay, az) = scalar_pen_pose(m, q, self._end_geoms)
        hx, hy, hz = HOLD_POS
        dist = jnp.sqrt((cx - hx) ** 2 + (cy - hy) ** 2 + (cz - hz) ** 2)
        similarity = ax * tx + ay * ty + az * tz
        dropped = cz < hz - 0.15
        vel2 = sum(qd[j] * qd[j] for j in range(5))
        return (-1.0 * dist
                + similarity
                - 1e-3 * vel2
                + 10.0 * ((similarity > 0.90) & (dist < 0.075))
                + 50.0 * ((similarity > 0.95) & (dist < 0.075))
                - 5.0 * dropped)

    def observe(self, state):
        q, qd = state.physics.qpos, state.physics.qvel
        centre, axis = self._pen_pose(q)
        return jnp.concatenate([
            q, qd, centre, axis, state.target_axis,
            axis - state.target_axis,
            centre - jnp.asarray(HOLD_POS)])

    def success(self, state):
        centre, axis = self._pen_pose(state.physics.qpos)
        dist = jnp.linalg.norm(centre - jnp.asarray(HOLD_POS))
        return (jnp.dot(axis, state.target_axis) > 0.95) & (dist < 0.075)
