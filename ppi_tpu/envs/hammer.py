"""Hammer-a-nail environment on the articulated physics core.

TPU-native re-host of the mj_envs ``hammer-v0`` task semantics (the env of
the reference's canonical ESSPS+RFF config; reference: Makefile:20-21,
run_mpc.py:36-48): drive a hammer head into a nail until it is fully seated
in the board. The 26-DoF Adroit hand + free hammer is simplified to a 4-DoF
arm with the hammer as its end effector; the contact structure (hammer head
vs nail head capsule, friction-held nail on a prismatic axis) and the reward
shape (tool-to-nail distance + nail insertion progress + seated bonus,
mirroring the mj_envs terms) are preserved.

Scene: arm base at origin; a bench at (0.68, 0, 0.9) with a vertical nail
pointing up (the raised hammer strikes downward); the nail is a slide joint
held by dry (Coulomb) friction, so gravity cannot seat it — only impacts
drive it in.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ppi_tpu.envs.physics import ModelBuilder, PhysicsState
from ppi_tpu.envs.physics.engine import HINGE, SLIDE

YAW, SHOULDER, ELBOW, WRIST, NAIL = range(5)
NAIL_DEPTH = 0.06  # fully seated

# nominal nail-board position and the per-episode board-height sampling
# half-range about it. mj_envs hammer-v0 randomizes the board HEIGHT each
# reset (reset_model draws the board body z over a ~0.15 m span; the nail
# target position is part of the observation for exactly this reason);
# the re-host samples the same-sized span about its own bench height.
NAIL_POS = (0.68, 0.0, 0.90)
NAIL_Z_RANGE = 0.075


def _build_model():
    b = ModelBuilder()
    # --- arm (same class as the door arm) ---
    b.add_body(parent=-1, joint_type=HINGE, axis=(0, 0, 1),
               offset_pos=(0, 0, 1.0), mass=2.0, damping=2.0, armature=0.1,
               q_limit=(-1.5, 1.5), limit_k=50.0)
    b.add_body(parent=YAW, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0, 0, 0), mass=2.0, com=(0.17, 0, 0),
               damping=2.0, armature=0.1, q_limit=(-1.2, 1.2), limit_k=50.0)
    b.add_body(parent=SHOULDER, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0.35, 0, 0), mass=1.5, com=(0.17, 0, 0),
               damping=1.5, armature=0.08, q_limit=(-2.0, 2.0), limit_k=50.0)
    b.add_body(parent=ELBOW, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0.35, 0, 0), mass=1.0, com=(0.1, 0, 0),
               damping=1.0, armature=0.05, q_limit=(-2.0, 2.0), limit_k=50.0)
    # --- nail: vertical, driven downward into the bench at NAIL_POS
    # (the NOMINAL board position; per episode the engine overrides it
    # with the sampled state.board via dyn_body); slide axis points down
    # so q > 0 means "seated deeper" ---
    b.add_body(parent=-1, joint_type=SLIDE, axis=(0, 0, -1),
               offset_pos=NAIL_POS, mass=0.4, damping=10.0,
               armature=0.01, spring_k=0.0, spring_ref=0.0,
               friction_loss=20.0,
               q_limit=(0.0, NAIL_DEPTH + 0.01), limit_k=8e3)

    head = b.add_sphere(WRIST, (0.22, 0, 0), 0.045)    # hammer head
    nail_a = b.add_sphere(NAIL, (0.0, 0, 0.060), 0.018)  # nail head (top)
    nail_b = b.add_sphere(NAIL, (0.0, 0, 0.020), 0.018)
    b.add_contact_sphere_segment(head, nail_a, nail_b)
    b.contact_stiffness = 4e3
    b.contact_damping = 60.0
    b.friction_mu = 0.8
    b.friction_vel_k = 60.0
    return b.finalize(), head, (nail_a, nail_b)


class HammerState(struct.PyTreeNode):
    physics: PhysicsState
    board: jax.Array  # (3,) sampled nail-board position (z randomized)
    t: jax.Array


@dataclasses.dataclass(frozen=True)
class Hammer:
    """hammer-v0-class task; actions are PD position targets for the 4 arm
    joints. The nail 'drives in' as positive slide displacement (its axis
    points +x; impacts from -x push it toward the board interior... the
    slide coordinate increases as the nail seats)."""

    action_dim: int = 4
    dt: float = 0.02
    substeps: int = 4
    kp: float = 70.0
    kd: float = 7.0
    fixed_scene: bool = False  # True: pin the legacy nominal board height

    name = "hammer-v0"

    def __post_init__(self):
        from ppi_tpu.envs.physics.engine_soa import (
            make_single_step_soa, make_sites_soa)
        model, head, nail = _build_model()
        object.__setattr__(self, "_model", model)
        object.__setattr__(self, "_head_geom", head)
        object.__setattr__(self, "_nail_geoms", nail)
        object.__setattr__(self, "_step_soa",
                           make_single_step_soa(model, self.dt, self.substeps,
                                                dyn_body=NAIL))
        object.__setattr__(self, "_sites_soa",
                           make_sites_soa(model, dyn_body=NAIL))

    @property
    def action_low(self):
        return np.array([-1.5, -1.2, -2.0, -2.0])

    @property
    def action_high(self):
        return np.array([1.5, 1.2, 2.0, 2.0])

    def sample_board(self, key):
        """Per-episode nail-board position: z sampled over NAIL_Z_RANGE
        about the nominal bench height (mj_envs reset semantics)."""
        if self.fixed_scene:
            return jnp.asarray(NAIL_POS)
        dz = jax.random.uniform(key, (), minval=-NAIL_Z_RANGE,
                                maxval=NAIL_Z_RANGE)
        return jnp.asarray(NAIL_POS) + jnp.array([0.0, 0.0, 1.0]) * dz

    def reset(self, key):
        qpos = jnp.array([0.0, 0.3, -1.6, 0.9, 0.0])
        return HammerState(physics=PhysicsState(qpos=qpos, qvel=jnp.zeros(5)),
                           board=self.sample_board(key),
                           t=jnp.zeros((), jnp.int32))

    def _sites(self, qpos, board=None):
        pts = self._sites_soa(qpos, jnp.asarray(NAIL_POS)
                              if board is None else board)
        head = pts[self._head_geom]
        nail = pts[self._nail_geoms[0]]
        return head, nail

    def step(self, state, action):
        target = jnp.clip(action, self.action_low, self.action_high)
        q, qd = state.physics.qpos, state.physics.qvel
        tau_arm = self.kp * (target - q[:4]) - self.kd * qd[:4]
        tau = jnp.zeros(5).at[:4].set(tau_arm)
        qpos, qvel = self._step_soa(q, qd, tau, state.board)
        phys = PhysicsState(qpos=qpos, qvel=qvel)

        head, nail = self._sites(qpos, state.board)
        depth = qpos[NAIL]
        dist = jnp.linalg.norm(head - nail)
        # mj_envs hammer-v0 reward shape: approach + insertion progress +
        # seated bonuses + velocity regularization
        reward = (-0.5 * dist
                  + 50.0 * depth
                  - 1e-3 * jnp.sum(qvel ** 2)
                  + 2.0 * (depth > 0.5 * NAIL_DEPTH)
                  + 10.0 * (depth > 0.95 * NAIL_DEPTH))
        return state.replace(physics=phys, t=state.t + 1), reward

    # ---- scalar-SoA kernel contract (pallas_rollout) ------------------
    # per-episode dynamics constants: the sampled board position overrides
    # the nail body's joint-origin offset inside the megakernel
    scalar_dyn_body = NAIL

    def scalar_dyn_consts(self, state):
        return state.board

    def scalar_torque(self, m, q, qd, act):
        lo = np.asarray(self.action_low)
        hi = np.asarray(self.action_high)
        tau = [self.kp * (jnp.clip(act[j], float(lo[j]), float(hi[j]))
                          - q[j]) - self.kd * qd[j] for j in range(4)]
        tau.append(jnp.zeros_like(q[0]))  # free nail slide
        return tuple(tau)

    def scalar_reward(self, m, q, qd):
        from ppi_tpu.envs.physics.engine_soa import fk_soa, geom_point_soa
        rots, poss, _, _ = fk_soa(m, q)
        head = geom_point_soa(m, rots, poss, self._head_geom)
        nail = geom_point_soa(m, rots, poss, self._nail_geoms[0])
        dist = jnp.sqrt((head[0] - nail[0]) ** 2 + (head[1] - nail[1]) ** 2
                        + (head[2] - nail[2]) ** 2)
        depth = q[NAIL]
        vel2 = sum(qd[j] * qd[j] for j in range(5))
        return (-0.5 * dist
                + 50.0 * depth
                - 1e-3 * vel2
                + 2.0 * (depth > 0.5 * NAIL_DEPTH)
                + 10.0 * (depth > 0.95 * NAIL_DEPTH))

    def observe(self, state):
        # mj_envs hammer-v0 exposes the nail target position because the
        # board height is randomized per episode — the nail site position
        # here already carries the sampled board (FK through state.board)
        q, qd = state.physics.qpos, state.physics.qvel
        head, nail = self._sites(q, state.board)
        return jnp.concatenate([
            q[:4], qd[:4], q[NAIL:NAIL + 1], qd[NAIL:NAIL + 1],
            head, nail, head - nail])

    def success(self, state):
        return state.physics.qpos[NAIL] > 0.95 * NAIL_DEPTH
