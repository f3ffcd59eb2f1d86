"""Planar hopper on the articulated physics core.

Engine-backed counterpart of the gym Hopper-v2 row of the reference's env
zoo (reference: run_mpc.py:36-48): a planar one-legged body (torso on
slide-x / slide-z / pitch + thigh, shin, foot hinges) that must hop forward.
Reward = forward velocity + alive bonus - control cost, with the alive term
gated on torso height and uprightness (the gym healthy-state shape).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ppi_tpu.envs.physics import ModelBuilder, PhysicsState
from ppi_tpu.envs.physics.engine import HINGE, SLIDE

NQ = 6
TORSO_Z0 = 1.05


def _build_model():
    b = ModelBuilder()
    b.add_body(parent=-1, joint_type=SLIDE, axis=(1, 0, 0),
               offset_pos=(0, 0, TORSO_Z0), mass=1e-3, damping=0.0,
               armature=1e-4)
    b.add_body(parent=0, joint_type=SLIDE, axis=(0, 0, 1),
               offset_pos=(0, 0, 0), mass=1e-3, damping=0.0, armature=1e-4)
    torso = b.add_body(parent=1, joint_type=HINGE, axis=(0, 1, 0),
                       offset_pos=(0, 0, 0), mass=3.5, com=(0, 0, 0.1),
                       inertia=np.diag([0.05, 0.08, 0.05]), damping=0.05,
                       armature=0.01)
    thigh = b.add_body(parent=torso, joint_type=HINGE, axis=(0, 1, 0),
                       offset_pos=(0, 0, -0.05), mass=2.0, com=(0, 0, -0.2),
                       inertia=np.diag([0.02] * 3), damping=0.3,
                       armature=0.05, q_limit=(-0.6, 1.2), limit_k=60.0)
    shin = b.add_body(parent=thigh, joint_type=HINGE, axis=(0, 1, 0),
                      offset_pos=(0, 0, -0.4), mass=1.2, com=(0, 0, -0.2),
                      inertia=np.diag([0.01] * 3), damping=0.25,
                      armature=0.04, q_limit=(-1.5, 0.1), limit_k=60.0)
    foot = b.add_body(parent=shin, joint_type=HINGE, axis=(0, 1, 0),
                      offset_pos=(0, 0, -0.4), mass=0.7, com=(0.06, 0, -0.04),
                      inertia=np.diag([0.004] * 3), damping=0.2,
                      armature=0.03, q_limit=(-0.8, 0.8), limit_k=60.0)
    plane = b.add_plane((0, 0, 1), 0.0)
    toe = b.add_sphere(foot, (0.13, 0, -0.06), 0.05)
    heel = b.add_sphere(foot, (-0.06, 0, -0.06), 0.05)
    torso_geom = b.add_sphere(torso, (0, 0, 0.1), 0.12)
    for g in (toe, heel, torso_geom):
        b.add_contact_sphere_plane(g, plane)
    b.contact_stiffness = 1.5e4
    b.contact_damping = 150.0
    b.friction_mu = 1.5
    b.friction_vel_k = 150.0
    return b.finalize()


class HopperState(struct.PyTreeNode):
    physics: PhysicsState
    t: jax.Array


@dataclasses.dataclass(frozen=True)
class Hopper:
    action_dim: int = 3
    dt: float = 0.02
    substeps: int = 4
    max_torque: float = 40.0
    fixed_init: bool = False  # True: pin the zero-noise legacy start

    name = "hopper"

    def __post_init__(self):
        from ppi_tpu.envs.physics.engine_soa import make_single_step_soa
        model = _build_model()
        object.__setattr__(self, "_model", model)
        object.__setattr__(self, "_step_soa",
                           make_single_step_soa(model, self.dt, self.substeps))

    @property
    def action_low(self):
        return -self.max_torque * jnp.ones(3)

    @property
    def action_high(self):
        return self.max_torque * jnp.ones(3)

    def reset(self, key):
        qpos = jnp.zeros(NQ).at[3].set(0.2).at[4].set(-0.4).at[5].set(0.2)
        qvel = jnp.zeros(NQ)
        if not self.fixed_init:
            # gym Hopper reset: qpos/qvel += U(-5e-3, 5e-3)
            kq, kv = jax.random.split(key)
            qpos = qpos + jax.random.uniform(kq, (NQ,), minval=-5e-3,
                                             maxval=5e-3)
            qvel = jax.random.uniform(kv, (NQ,), minval=-5e-3, maxval=5e-3)
        return HopperState(physics=PhysicsState(qpos=qpos, qvel=qvel),
                           t=jnp.zeros((), jnp.int32))

    def step(self, state, action):
        tau_leg = jnp.clip(action, self.action_low, self.action_high)
        tau = jnp.zeros(NQ).at[3:].set(tau_leg)
        qpos, qvel = self._step_soa(state.physics.qpos, state.physics.qvel,
                                    tau)
        phys = PhysicsState(qpos=qpos, qvel=qvel)
        z = qpos[1] + TORSO_Z0
        pitch = qpos[2]
        healthy = (z > 0.7) & (jnp.abs(pitch) < 0.6)
        reward = (qvel[0]
                  + 1.0 * healthy
                  - 2.0 * (~healthy)
                  - 0.05 * jnp.mean((tau_leg / self.max_torque) ** 2))
        return state.replace(physics=phys, t=state.t + 1), reward

    # ---- scalar-SoA kernel contract (pallas_rollout) ------------------
    scalar_reward_takes_action = True

    def scalar_torque(self, m, q, qd, act):
        lim = self.max_torque
        tau = [jnp.zeros_like(q[0])] * 3
        tau += [jnp.clip(act[j], -lim, lim) for j in range(self.action_dim)]
        return tuple(tau)

    def scalar_reward(self, m, q, qd, act):
        lim = self.max_torque
        ctrl = sum(jnp.clip(act[j], -lim, lim) ** 2
                   for j in range(self.action_dim)) \
            / (self.action_dim * lim * lim)
        z = q[1] + TORSO_Z0
        healthy = ((z > 0.7) & (jnp.abs(q[2]) < 0.6)).astype(jnp.float32)
        return qd[0] + healthy - 2.0 * (1.0 - healthy) - 0.05 * ctrl

    def observe(self, state):
        q, qd = state.physics.qpos, state.physics.qvel
        return jnp.concatenate([q[1:], qd])
