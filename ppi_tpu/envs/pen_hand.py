"""In-hand pen reorientation with articulated digits — the enriched pen-v0
embodiment.

The reference's pen-v0 reorients the pen with the 24-DoF Adroit hand whose
forearm is frozen (reference: run_mpc.py:41 + the mj_envs submodule);
``envs.pen`` preserves the task semantics with two disembodied 2-DoF slide
fingertips. This module closes that embodiment gap (VERDICT r2 next #2):
three two-hinge digits from the shared hand builder (envs.hand.add_digit) —
index and ring mounted *below* the pen ends pointing up, an opposing thumb
mounted *above* mid-rod pointing down — manipulate the same compliant
free-pen model through real sphere-segment penalty contacts. 6 actuated
DoF, 11 total.

Digits hinge about x, so each fingertip sweeps the local y-z plane like the
slide fingertips it replaces — but through revolute MCP/PIP joints with
joint-space PD control, the same contact-rich curling mechanics as
door-v0-hand. The reward shape, compliant hold, sampled goal distribution
(yaw/pitch ~ U(-1,1) rad) and success criterion are shared with
``envs.pen`` so fingertip-vs-hand results are directly comparable.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ppi_tpu.envs.hand import add_digit, digit_spheres
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

# dof order: pen x,y,z slides, yaw, pitch; then digit A (mcp, pip) under
# the +x pen end, digit B under the -x end, thumb (mcp, pip) above mid-rod
(PEN_X, PEN_Y, PEN_Z, PEN_YAW, PEN_PITCH,
 A_MCP, A_PIP, B_MCP, B_PIP, TH_MCP, TH_PIP) = range(11)

N_ACT = 6
L1, L2 = 0.055, 0.05          # digit link lengths (reach 0.105)
DIGIT_DROP = 0.06             # finger mounts this far below the rod centre
THUMB_RISE = 0.07             # thumb mount this far above

_LOW = (-1.3, -2.2, -1.3, -2.2, -1.3, -2.2)
_HIGH = (1.3, 2.2, 1.3, 2.2, 1.3, 2.2)


def _build_model():
    b = ModelBuilder()
    # --- pen: identical compliant free body to envs.pen ---
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
    # --- digits (world-mounted: the palm is the frozen forearm frame) ---
    digit_cfg = dict(axis=(1, 0, 0), link1=L1, link2=L2,
                     damping1=0.35, damping2=0.3)
    up, down = (0.0, 0.0, 1.0), (0.0, 0.0, -1.0)
    a_ids = add_digit(b, -1, (HOLD_POS[0] + 0.06, 0.0,
                              HOLD_POS[2] - DIGIT_DROP),
                      mcp_limits=(_LOW[0], _HIGH[0]),
                      pip_limits=(_LOW[1], _HIGH[1]),
                      direction=up, **digit_cfg)
    b_ids = add_digit(b, -1, (HOLD_POS[0] - 0.06, 0.0,
                              HOLD_POS[2] - DIGIT_DROP),
                      mcp_limits=(_LOW[2], _HIGH[2]),
                      pip_limits=(_LOW[3], _HIGH[3]),
                      direction=up, **digit_cfg)
    th_ids = add_digit(b, -1, (HOLD_POS[0], 0.0,
                               HOLD_POS[2] + THUMB_RISE),
                       mcp_limits=(_LOW[4], _HIGH[4]),
                       pip_limits=(_LOW[5], _HIGH[5]),
                       direction=down, **digit_cfg)

    # geoms: pen end spheres define the rod segment; digit prox+tip spheres
    end_a = b.add_sphere(PEN_PITCH, (PEN_HALF, 0, 0), 0.012)
    end_b = b.add_sphere(PEN_PITCH, (-PEN_HALF, 0, 0), 0.012)
    tip_geoms = []
    for ids, direction in ((a_ids, up), (b_ids, up), (th_ids, down)):
        prox, tip = digit_spheres(b, *ids, link1=L1, link2=L2,
                                  prox_radius=0.015, tip_radius=0.015,
                                  direction=direction)
        b.add_contact_sphere_segment(prox, end_a, end_b)
        b.add_contact_sphere_segment(tip, end_a, end_b)
        tip_geoms.append(tip)
    # same contact material as envs.pen (stable at h = dt/substeps with the
    # 0.05 kg pen)
    b.contact_stiffness = 2e3
    b.contact_damping = 5.0
    b.friction_mu = 0.8
    b.friction_vel_k = 30.0
    return b.finalize(), (end_a, end_b), tuple(tip_geoms)


class PenHandState(struct.PyTreeNode):
    physics: PhysicsState
    target_axis: jax.Array
    t: jax.Array


@dataclasses.dataclass(frozen=True)
class PenHand:
    """pen-v0-class task on the three-digit hand; actions are PD position
    targets for the 6 digit joints."""

    action_dim: int = N_ACT
    dt: float = 0.02
    substeps: int = 8
    kp: float = 3.0
    kd: float = 0.25
    fixed_goal: bool = False
    engine: str = "soa"  # "tensor" for fast CPU compiles (tests)

    name = "pen-v0-hand"

    def __post_init__(self):
        from ppi_tpu.envs.physics.engine_soa import (
            make_single_step_soa, make_sites_soa)
        model, ends, tips = _build_model()
        object.__setattr__(self, "_model", model)
        object.__setattr__(self, "_end_geoms", ends)
        object.__setattr__(self, "_tip_geoms", tips)
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
        # digits poised just clear of the rod: fingers slightly curled
        # outward, thumb lifted
        qpos = (jnp.zeros(11)
                .at[A_MCP].set(0.35).at[B_MCP].set(-0.35)
                .at[TH_MCP].set(0.3))
        return PenHandState(
            physics=PhysicsState(qpos=qpos, qvel=jnp.zeros(11)),
            target_axis=self.sample_goal(key),
            t=jnp.zeros((), jnp.int32))

    def _pen_pose(self, qpos):
        pts = self._sites_soa(qpos)
        ea, eb = pts[self._end_geoms[0]], pts[self._end_geoms[1]]
        centre = 0.5 * (ea + eb)
        axis = (ea - eb) / (jnp.linalg.norm(ea - eb) + 1e-9)
        return centre, axis

    def step(self, state, action):
        target = jnp.clip(action, self.action_low, self.action_high)
        q, qd = state.physics.qpos, state.physics.qvel
        tau = jnp.zeros(11).at[A_MCP:].set(
            self.kp * (target - q[A_MCP:]) - self.kd * qd[A_MCP:])
        qpos, qvel = self._step_soa(q, qd, tau)
        phys = PhysicsState(qpos=qpos, qvel=qvel)

        centre, axis = self._pen_pose(qpos)
        dist = jnp.linalg.norm(centre - jnp.asarray(HOLD_POS))
        similarity = jnp.dot(axis, state.target_axis)
        dropped = centre[2] < HOLD_POS[2] - 0.15
        # identical reward shape to envs.pen (mj_envs pen-v0 structure)
        reward = (-1.0 * dist
                  + similarity
                  - 1e-3 * jnp.sum(qvel[:5] ** 2)
                  + 10.0 * ((similarity > 0.90) & (dist < 0.075))
                  + 50.0 * ((similarity > 0.95) & (dist < 0.075))
                  - 5.0 * dropped)
        return state.replace(physics=phys, t=state.t + 1), reward

    # ---- scalar-SoA kernel contract (pallas_rollout) ------------------
    def scalar_torque(self, m, q, qd, act):
        tau = [jnp.zeros_like(q[0]) for _ in range(5)]
        for j in range(N_ACT):
            tgt = jnp.clip(act[j], _LOW[j], _HIGH[j])
            tau.append(self.kp * (tgt - q[A_MCP + j])
                       - self.kd * qd[A_MCP + j])
        return tuple(tau)

    def _scalar_pen_pose(self, m, q):
        return scalar_pen_pose(m, q, self._end_geoms)

    def scalar_reward_consts(self, state):
        """Per-episode kernel constants: the sampled goal axis."""
        return state.target_axis

    def scalar_reward(self, m, q, qd, consts):
        tx, ty, tz = consts
        (cx, cy, cz), (ax, ay, az) = self._scalar_pen_pose(m, q)
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


# ---------------------------------------------------------------------------
# scripted expert (feasibility oracle + render demo)
# ---------------------------------------------------------------------------

_R_MIN, _R_MAX = abs(L1 - L2) + 0.005, L1 + L2 - 0.003
_MZ = HOLD_POS[2] - DIGIT_DROP


def _ik_up(ty, tz):
    """Closed-form 2-link IK in the digit's y-z plane (up-pointing digit
    rotating about +x; tip: y = -(l1 sin a + l2 sin(a+b)),
    z = mz + l1 cos a + l2 cos(a+b))."""
    ry, rz = ty, tz - _MZ
    r = jnp.sqrt(ry * ry + rz * rz) + 1e-12
    rc = jnp.clip(r, _R_MIN, _R_MAX)
    ry, rz = ry * rc / r, rz * rc / r
    r2 = ry * ry + rz * rz
    cb = jnp.clip((r2 - L1 * L1 - L2 * L2) / (2 * L1 * L2), -1.0, 1.0)
    bb = jnp.arccos(cb)
    theta = jnp.arctan2(-ry, rz)
    aa = theta - jnp.arctan2(L2 * jnp.sin(bb), L1 + L2 * jnp.cos(bb))
    return aa, bb


def _fk_up(a, b):
    y = -(L1 * jnp.sin(a) + L2 * jnp.sin(a + b))
    z = _MZ + L1 * jnp.cos(a) + L2 * jnp.cos(a + b)
    return y, z


def _digit_cmd(q, rod_yz, d_yz):
    """Joint targets for one digit: press the rod along +d from the -d
    side; when the tip sits on the wrong (+d) side, retract to small radius
    and swing its bearing toward the approach point so the repositioning
    arc passes safely under the rod instead of through it."""
    mag = jnp.linalg.norm(d_yz) + 1e-9
    dirv = d_yz / mag
    press = jnp.clip(2.0 * mag, 0.0, 0.006)
    standoff = jnp.where(mag < 0.002, 0.033, 0.027 - press)
    des = rod_yz - dirv * standoff
    ty, tz = _fk_up(q[0], q[1])
    cur = jnp.array([ty, tz])
    wrong = jnp.dot(cur - rod_yz, dirv) > 0.004
    mount = jnp.array([0.0, _MZ])
    des_bear = (des - mount) / (jnp.linalg.norm(des - mount) + 1e-9)
    swing = mount + des_bear * (_R_MIN + 0.004)
    use = jnp.where(wrong, swing, des)
    return jnp.stack(_ik_up(use[0], use[1]))


def scripted_controller(env, target_axis):
    """Closed-loop proportional fingertip controller toward
    ``target_axis`` — the hand analogue of the slide-fingertip controller
    in tests/test_grasp_envs.py. Substantially reorients the pen (the
    feasibility oracle); exact alignment past ~0.87 similarity is the
    MPC's job (run_mpc reaches Success on the canonical LBPS config)."""
    tgt = jnp.asarray(target_axis)

    def controller(s):
        q = s.physics.qpos
        c, ax = env._pen_pose(q)
        delta = 0.5 * PEN_HALF * (tgt - ax)

        def parts(plane_dx):
            t = jnp.clip(plane_dx / (jnp.abs(ax[0]) + 0.2),
                         -PEN_HALF, PEN_HALF)
            rod_yz = c[1:] + t * ax[1:]
            d_yz = (plane_dx / PEN_HALF) * delta[1:]
            return rod_yz, d_yz

        rod_a, d_a = parts(0.06)
        rod_b, d_b = parts(-0.06)
        cmd_a = _digit_cmd(q[A_MCP:A_MCP + 2], rod_a, d_a)
        cmd_b = _digit_cmd(q[B_MCP:B_MCP + 2], rod_b, d_b)
        return jnp.concatenate([cmd_a, cmd_b, jnp.array([0.5, 0.0])])

    return controller


def scripted_reorient(env, state0=None, steps=300):
    """Run the scripted controller; returns (final_state, info) with the
    similarity trace."""
    state = env.reset(jax.random.key(0)) if state0 is None else state0
    ctrl = scripted_controller(env, state.target_axis)

    def body(s, _):
        s2, _ = env.step(s, ctrl(s))
        _, ax = env._pen_pose(s2.physics.qpos)
        return s2, jnp.dot(ax, s.target_axis)

    state_f, sims = jax.lax.scan(body, state, None, length=steps)
    centre, _ = env._pen_pose(state_f.physics.qpos)
    return state_f, {
        "similarity": sims,
        "max_similarity": float(jnp.max(sims)),
        "final_similarity": float(sims[-1]),
        "dropped": bool(centre[2] < HOLD_POS[2] - 0.15),
    }
