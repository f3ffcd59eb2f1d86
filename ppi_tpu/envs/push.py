"""Tabletop push-to-target on the articulated physics core.

Engine-backed counterpart of the FetchPickAndPlace-v1 row of the
reference's env zoo (reference: run_mpc.py:47) in its push variant: an arm
must push a friction-held box across a table to a target location. Grasping
is out of scope for a paddle end effector; pushing preserves the Fetch task
class (sparse-ish object-relocation reward through contact).

The box is modeled as two orthogonal slide DoFs (x, y) on the table plane
with dry (Coulomb) joint friction standing in for surface friction — it
stays exactly where it is left and moves only under contact forces.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ppi_tpu.envs.physics import ModelBuilder, PhysicsState
from ppi_tpu.envs.physics.engine import HINGE, SLIDE

YAW, SHOULDER, ELBOW, WRIST, BOX_X, BOX_Y = range(6)
TABLE_Z = 0.75
BOX_START = (0.55, 0.1)
# per-episode goal distribution (Fetch target_range=0.15: goal = object +
# U(-0.15, 0.15) per xy axis, resampled until 0.1 m from the object —
# gymnasium-robotics fetch/push sampling); the re-host enforces the 0.1 m
# floor branchlessly by radial push-out instead of rejection resampling
GOAL_RANGE = 0.15
GOAL_MIN_DIST = 0.1
# per-episode box start (Fetch obj_range = 0.15 about the nominal spawn;
# subset kept inside the paddle's push workspace — see relocate.START_RANGE
# for the clipping rationale)
START_RANGE = 0.05


def _build_model():
    b = ModelBuilder()
    b.add_body(parent=-1, joint_type=HINGE, axis=(0, 0, 1),
               offset_pos=(0, 0, TABLE_Z + 0.25), mass=2.0, damping=2.0,
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
    # box on the table: planar slides with dry friction
    b.add_body(parent=-1, joint_type=SLIDE, axis=(1, 0, 0),
               offset_pos=(BOX_START[0], BOX_START[1], TABLE_Z), mass=0.5,
               damping=2.0, armature=0.01, friction_loss=2.5)
    b.add_body(parent=BOX_X, joint_type=SLIDE, axis=(0, 1, 0),
               offset_pos=(0, 0, 0), mass=0.5, damping=2.0, armature=0.01,
               friction_loss=2.5)

    palm = b.add_sphere(WRIST, (0.18, 0, 0), 0.05)
    box = b.add_sphere(BOX_Y, (0, 0, 0.04), 0.055)
    b.add_contact_sphere_sphere(palm, box)
    b.contact_stiffness = 3e3
    b.contact_damping = 60.0
    b.friction_mu = 0.8
    b.friction_vel_k = 60.0
    return b.finalize(), palm, box


class PushState(struct.PyTreeNode):
    physics: PhysicsState
    target: jax.Array
    t: jax.Array


@dataclasses.dataclass(frozen=True)
class FetchPush:
    """Fetch-push-class task; PD position targets for the 4 arm joints.
    Reward: -|box - target| - 0.25 |palm - box| + in-place bonus."""

    action_dim: int = 4
    dt: float = 0.02
    substeps: int = 2
    kp: float = 60.0
    kd: float = 6.0
    target: tuple = (0.72, -0.15)   # legacy fixed goal (fixed_goal=True)
    success_radius: float = 0.05
    fixed_goal: bool = False

    name = "fetch-push"

    def __post_init__(self):
        from ppi_tpu.envs.physics.engine_soa import (
            make_single_step_soa, make_sites_soa)
        model, palm, box = _build_model()
        object.__setattr__(self, "_model", model)
        object.__setattr__(self, "_palm_geom", palm)
        object.__setattr__(self, "_box_geom", box)
        object.__setattr__(self, "_step_soa",
                           make_single_step_soa(model, self.dt, self.substeps))
        object.__setattr__(self, "_sites_soa", make_sites_soa(model))

    @property
    def action_low(self):
        return np.array([-1.5, -1.2, -2.0, -2.0])

    @property
    def action_high(self):
        return np.array([1.5, 1.2, 2.0, 2.0])

    def sample_start(self, key):
        """Per-episode box-start xy offset about the nominal spawn (Fetch
        samples the object position each reset; see START_RANGE)."""
        if self.fixed_goal:
            return jnp.zeros(2)
        return jax.random.uniform(key, (2,), minval=-START_RANGE,
                                  maxval=START_RANGE)

    def sample_goal(self, key, start_xy=None):
        """Tabletop goal = (sampled) box start + U(-range, range)^2
        rejection-sampled to the 0.1 m minimum, matching the Fetch
        resample-until-far loop (gymnasium-robotics fetch_env._sample_goal)
        as a fixed 8-draw first-accept under jit. A radial projection
        (which would put a ~35% atom of easiest goals exactly on the 0.1 m
        circle) is kept only as the all-draws-near fallback
        (p ~ 0.35^8 ~ 2e-4)."""
        if self.fixed_goal:
            return jnp.asarray(self.target)
        if start_xy is None:
            start_xy = jnp.asarray(BOX_START)
        offs = jax.random.uniform(key, (8, 2), minval=-GOAL_RANGE,
                                  maxval=GOAL_RANGE)
        ok = jnp.linalg.norm(offs, axis=1) >= GOAL_MIN_DIST
        off = offs[jnp.argmax(ok)]      # first accepted draw (row 0 if none)
        r = jnp.linalg.norm(off) + 1e-9
        off = jnp.where(ok.any(), off, off * (GOAL_MIN_DIST / r))
        return start_xy + off

    def reset(self, key):
        # box start AND goal sampled per episode (Fetch reset semantics);
        # the box world xy is BOX_START + qpos[BOX_X:BOX_Y+1], so the
        # sampled start is pure state on every engine path
        k_goal, k_start = jax.random.split(key)
        start = self.sample_start(k_start)
        qpos = (jnp.array([0.0, 0.7, -0.9, 0.3, 0.0, 0.0])
                .at[BOX_X].set(start[0]).at[BOX_Y].set(start[1]))
        return PushState(physics=PhysicsState(qpos=qpos, qvel=jnp.zeros(6)),
                         target=self.sample_goal(k_goal,
                                                 jnp.asarray(BOX_START)
                                                 + start),
                         t=jnp.zeros((), jnp.int32))

    def _positions(self, qpos):
        pts = self._sites_soa(qpos)
        return pts[self._palm_geom], pts[self._box_geom]

    def box_xy(self, state):
        q = state.physics.qpos
        return jnp.array([BOX_START[0] + q[BOX_X], BOX_START[1] + q[BOX_Y]])

    def step(self, state, action):
        target_q = jnp.clip(action, self.action_low, self.action_high)
        q, qd = state.physics.qpos, state.physics.qvel
        tau_arm = self.kp * (target_q - q[:4]) - self.kd * qd[:4]
        tau = jnp.zeros(6).at[:4].set(tau_arm)
        qpos, qvel = self._step_soa(q, qd, tau)
        phys = PhysicsState(qpos=qpos, qvel=qvel)
        palm, box = self._positions(qpos)
        box_xy = jnp.array([BOX_START[0] + qpos[BOX_X],
                            BOX_START[1] + qpos[BOX_Y]])
        d_target = jnp.linalg.norm(box_xy - state.target)
        d_reach = jnp.linalg.norm(palm - box)
        reward = (-2.0 * d_target - 0.25 * d_reach
                  + 5.0 * (d_target < self.success_radius)
                  - 1e-3 * jnp.sum(qvel ** 2))
        return state.replace(physics=phys, t=state.t + 1), reward

    # ---- scalar-SoA kernel contract (pallas_rollout) ------------------
    def scalar_torque(self, m, q, qd, act):
        lo = np.asarray(self.action_low)
        hi = np.asarray(self.action_high)
        tau = [self.kp * (jnp.clip(act[j], float(lo[j]), float(hi[j]))
                          - q[j]) - self.kd * qd[j] for j in range(4)]
        tau += [jnp.zeros_like(q[0])] * 2  # box slides
        return tuple(tau)

    def scalar_reward_consts(self, state):
        return state.target

    def scalar_reward(self, m, q, qd, consts):
        from ppi_tpu.envs.physics.engine_soa import fk_soa, geom_point_soa
        tx, ty = consts
        rots, poss, _, _ = fk_soa(m, q)
        palm = geom_point_soa(m, rots, poss, self._palm_geom)
        box = geom_point_soa(m, rots, poss, self._box_geom)
        bx = BOX_START[0] + q[BOX_X]
        by = BOX_START[1] + q[BOX_Y]
        d_target = jnp.sqrt((bx - tx) ** 2 + (by - ty) ** 2)
        d_reach = jnp.sqrt((palm[0] - box[0]) ** 2 + (palm[1] - box[1]) ** 2
                           + (palm[2] - box[2]) ** 2)
        vel2 = sum(qd[j] * qd[j] for j in range(6))
        return (-2.0 * d_target - 0.25 * d_reach
                + 5.0 * (d_target < self.success_radius)
                - 1e-3 * vel2)

    def observe(self, state):
        q, qd = state.physics.qpos, state.physics.qvel
        palm, box = self._positions(q)
        box_xy = self.box_xy(state)
        return jnp.concatenate([
            q[:4], qd[:4], box_xy, state.target, palm,
            box_xy - state.target])

    def success(self, state):
        return jnp.linalg.norm(self.box_xy(state)
                               - state.target) < self.success_radius
