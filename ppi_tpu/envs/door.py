"""Door-opening environment on the articulated physics core.

TPU-native re-host of the mj_envs ``door-v0`` task semantics (the
reference's canonical MPC env; reference: run_mpc.py:36-48, Makefile:14-18):
an arm must push the spring-loaded latch down and pull the door open. The
28-DoF Adroit hand is replaced by a 4-DoF arm with a palm paddle — the
contact structure (palm vs handle capsule, latch gating the door hinge) and
the reward shape (palm-to-handle distance + staged door-opening bonuses,
mirroring the mj_envs reward terms) are preserved; the embodiment is
deliberately simpler. Action space: PD position targets for the arm joints
(the mj_envs hand also uses position servos).

Scene (world frame: x forward, z up):
  * arm base at origin, shoulder at z=1: yaw(z) -> pitch(y) -> elbow(y) ->
    wrist(y), palm sphere at the end;
  * door hinged on a vertical axis at (0.75, 0.35), panel extending -y;
  * latch: a handle bar on the door, hinged about the door-panel normal,
    spring-loaded to horizontal; pressing it down unlocks the door (the
    door hinge's holding spring releases smoothly with latch angle).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ppi_tpu.envs.physics import ModelBuilder, PhysicsState
from ppi_tpu.envs.physics.engine import HINGE

# dof indices
YAW, SHOULDER, ELBOW, WRIST, DOOR, LATCH = range(6)

# nominal door-frame origin (hinge anchor) and the per-episode sampling
# half-ranges about it. mj_envs door-v0 randomizes the door body position
# each reset (reset_model draws it uniformly over ~0.1 m xy / ~0.15 m z
# spans — the door obs vector carries door_body_pos for exactly this
# reason); the re-host samples the same-shaped box about its own scene's
# nominal frame, clipped to spans the 4-DoF arm comfortably reaches.
FRAME = (0.55, 0.35, 1.0)
FRAME_RANGE = (0.05, 0.05, 0.075)


def _build_model():
    b = ModelBuilder()
    # --- arm ---
    b.add_body(parent=-1, joint_type=HINGE, axis=(0, 0, 1),
               offset_pos=(0, 0, 1.0), mass=2.0, com=(0.0, 0, 0),
               damping=2.0, armature=0.1, q_limit=(-1.5, 1.5), limit_k=50.0)
    b.add_body(parent=YAW, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0, 0, 0), mass=2.0, com=(0.17, 0, 0),
               damping=2.0, armature=0.1, q_limit=(-1.2, 1.2), limit_k=50.0)
    b.add_body(parent=SHOULDER, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0.35, 0, 0), mass=1.5, com=(0.17, 0, 0),
               damping=1.5, armature=0.08, q_limit=(-2.0, 2.0), limit_k=50.0)
    b.add_body(parent=ELBOW, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0.35, 0, 0), mass=0.8, com=(0.08, 0, 0),
               damping=1.0, armature=0.05, q_limit=(-2.0, 2.0), limit_k=50.0)
    # --- door (hinge at the frame edge, panel extends -y; the offset is
    # the NOMINAL frame — per-episode the engine overrides it with the
    # sampled state.frame via dyn_body) ---
    b.add_body(parent=-1, joint_type=HINGE, axis=(0, 0, 1),
               offset_pos=FRAME, mass=3.0, com=(0.0, -0.25, 0.0),
               inertia=np.diag([0.1, 0.02, 0.1]), damping=3.0, armature=0.0,
               q_limit=(0.0, 1.8), limit_k=200.0)
    # --- latch: handle bar on the door, rotates about the panel normal ---
    b.add_body(parent=DOOR, joint_type=HINGE, axis=(1, 0, 0),
               offset_pos=(-0.05, -0.45, 0.0), mass=0.3,
               com=(0.0, 0.08, 0.0), inertia=np.diag([2e-3, 2e-3, 2e-3]),
               damping=0.3, armature=0.01, spring_k=2.0, spring_ref=0.0,
               q_limit=(-1.6, 0.1), limit_k=30.0)

    # geoms
    palm = b.add_sphere(WRIST, (0.18, 0, 0), 0.05)
    # handle bar: two spheres spanning a capsule on the latch body
    h_a = b.add_sphere(LATCH, (0.0, 0.02, 0.0), 0.02)
    h_b = b.add_sphere(LATCH, (0.0, 0.16, 0.0), 0.02)
    # door panel edge capsule (for pushing/pulling the panel itself)
    d_a = b.add_sphere(DOOR, (0.0, -0.1, 0.0), 0.02)
    d_b = b.add_sphere(DOOR, (0.0, -0.5, 0.0), 0.02)

    b.add_contact_sphere_segment(palm, h_a, h_b)
    b.add_contact_sphere_segment(palm, d_a, d_b)
    b.contact_stiffness = 2e3
    b.contact_damping = 50.0
    b.friction_mu = 1.0
    b.friction_vel_k = 50.0
    return b.finalize(), palm, (h_a, h_b)


class DoorState(struct.PyTreeNode):
    physics: PhysicsState
    frame: jax.Array  # (3,) sampled door-frame origin (mj_envs door_body_pos)
    t: jax.Array


@dataclasses.dataclass(frozen=True)
class Door:
    """door-v0-class task; actions are PD position targets for the 4 arm
    joints."""

    action_dim: int = 4
    dt: float = 0.02
    substeps: int = 2
    kp: float = 60.0
    kd: float = 6.0
    latch_unlock_angle: float = -0.8   # latch pressed this far -> door free
    lock_stiffness: float = 60.0
    fixed_scene: bool = False  # True: pin the legacy nominal frame

    name = "door-v0"

    def __post_init__(self):
        from ppi_tpu.envs.physics.engine_soa import (
            make_single_step_soa, make_sites_soa)
        model, palm, handle = _build_model()
        object.__setattr__(self, "_model", model)
        object.__setattr__(self, "_palm_geom", palm)
        object.__setattr__(self, "_handle_geoms", handle)
        # scalar-SoA fast path: fuses the whole substep into wide VPU
        # kernels; the door body's frame origin is a runtime input (the
        # latch is the door's child, so it rides the sampled frame)
        object.__setattr__(self, "_step_soa",
                           make_single_step_soa(model, self.dt, self.substeps,
                                                dyn_body=DOOR))
        object.__setattr__(self, "_sites_soa",
                           make_sites_soa(model, dyn_body=DOOR))

    @property
    def action_low(self):
        return jnp.array([-1.5, -1.2, -2.0, -2.0])

    @property
    def action_high(self):
        return jnp.array([1.5, 1.2, 2.0, 2.0])

    def sample_frame(self, key):
        """Per-episode door-frame origin (see FRAME_RANGE)."""
        if self.fixed_scene:
            return jnp.asarray(FRAME)
        rng = jnp.asarray(FRAME_RANGE)
        return jnp.asarray(FRAME) + jax.random.uniform(
            key, (3,), minval=-rng, maxval=rng)

    def reset(self, key):
        qpos = jnp.array([0.0, 0.6, -0.8, 0.2, 0.0, 0.0])
        return DoorState(physics=PhysicsState(qpos=qpos, qvel=jnp.zeros(6)),
                         frame=self.sample_frame(key),
                         t=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------
    def _lock_torque(self, qpos):
        """Smooth latch-gated lock: a strong spring holds the door closed
        until the latch is pressed past the unlock angle (the analogue of the
        door-v0 latch constraint, implemented branchlessly)."""
        latch = qpos[LATCH]
        engaged = jax.nn.sigmoid((latch - self.latch_unlock_angle) / 0.05)
        # a bolt only blocks a (nearly) closed door: once open, the latch
        # springing back must not slam the door shut
        closed = jax.nn.sigmoid((0.08 - qpos[DOOR]) / 0.03)
        tau = jnp.zeros(6)
        return tau.at[DOOR].set(
            -engaged * closed * self.lock_stiffness * qpos[DOOR])

    def _sites(self, qpos, frame=None):
        pts = self._sites_soa(qpos, jnp.asarray(FRAME)
                              if frame is None else frame)
        palm = pts[self._palm_geom]
        handle = 0.5 * (pts[self._handle_geoms[0]]
                        + pts[self._handle_geoms[1]])
        return palm, handle

    def step(self, state, action):
        target = jnp.clip(action, self.action_low, self.action_high)
        q, qd = state.physics.qpos, state.physics.qvel
        tau_arm = self.kp * (target - q[:4]) - self.kd * qd[:4]
        tau = jnp.zeros(6).at[:4].set(tau_arm) + self._lock_torque(q)
        qpos, qvel = self._step_soa(q, qd, tau, state.frame)
        phys = PhysicsState(qpos=qpos, qvel=qvel)

        palm, handle = self._sites(phys.qpos, state.frame)
        door_pos = phys.qpos[DOOR]
        dist = jnp.linalg.norm(palm - handle)
        # mj_envs door-v0 reward shape: approach + staged opening bonuses +
        # velocity regularization
        reward = (-0.5 * dist
                  + 2.0 * door_pos
                  - 1e-3 * jnp.sum(phys.qvel ** 2)
                  + 2.0 * (door_pos > 0.2)
                  + 8.0 * (door_pos > 1.0)
                  + 10.0 * (door_pos > 1.35))
        return state.replace(physics=phys, t=state.t + 1), reward

    # ---- scalar-SoA kernel contract (pallas_rollout) ------------------
    # The same dynamics/reward as step(), written over per-lane scalar
    # tuples so the whole rollout can trace inside the Pallas megakernel
    # (cross-validated against batch_rollout in tests/test_pallas_rollout).

    _ACTION_LOW = (-1.5, -1.2, -2.0, -2.0)
    _ACTION_HIGH = (1.5, 1.2, 2.0, 2.0)

    # per-episode dynamics constants (pallas_rollout): the sampled door
    # frame overrides the door body's joint-origin offset inside the
    # kernel, so scalar_reward's FK sees the episode's scene unchanged
    scalar_dyn_body = DOOR

    def scalar_dyn_consts(self, state):
        return state.frame

    def scalar_torque(self, m, q, qd, act):
        tau = []
        for j in range(4):
            tgt = jnp.clip(act[j], self._ACTION_LOW[j], self._ACTION_HIGH[j])
            tau.append(self.kp * (tgt - q[j]) - self.kd * qd[j])
        engaged = jax.nn.sigmoid((q[LATCH] - self.latch_unlock_angle) / 0.05)
        closed = jax.nn.sigmoid((0.08 - q[DOOR]) / 0.03)
        tau.append(-engaged * closed * self.lock_stiffness * q[DOOR])
        tau.append(jnp.zeros_like(q[LATCH]))
        return tuple(tau)

    def scalar_reward(self, m, q, qd):
        from ppi_tpu.envs.physics.engine_soa import fk_soa, geom_point_soa
        rots, poss, _, _ = fk_soa(m, q)
        palm = geom_point_soa(m, rots, poss, self._palm_geom)
        ha = geom_point_soa(m, rots, poss, self._handle_geoms[0])
        hb = geom_point_soa(m, rots, poss, self._handle_geoms[1])
        dx = palm[0] - 0.5 * (ha[0] + hb[0])
        dy = palm[1] - 0.5 * (ha[1] + hb[1])
        dz = palm[2] - 0.5 * (ha[2] + hb[2])
        dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        door = q[DOOR]
        vel2 = sum(qd[j] * qd[j] for j in range(6))
        return (-0.5 * dist
                + 2.0 * door
                - 1e-3 * vel2
                + 2.0 * (door > 0.2)
                + 8.0 * (door > 1.0)
                + 10.0 * (door > 1.35))

    def observe(self, state):
        # mj_envs door-v0 exposes door_body_pos in the observation because
        # the frame is randomized per episode — same here (state.frame)
        palm, handle = self._sites(state.physics.qpos, state.frame)
        q = state.physics.qpos
        return jnp.concatenate([
            q[:4], state.physics.qvel[:4],
            q[DOOR:DOOR + 1], q[LATCH:LATCH + 1],
            palm, handle, palm - handle, state.frame,
            jnp.array([1.0 * (q[DOOR] > 1.0)])])

    def success(self, state):
        return state.physics.qpos[DOOR] > 1.35
