"""Planar half-cheetah-class locomotion on the articulated physics core.

Engine-backed counterpart of the gym MuJoCo locomotion rows of the
reference's env zoo (HalfCheetah-v2 / Hopper-v2 / Walker2d-v2; reference:
run_mpc.py:36-48): a planar torso on (slide-x, slide-z, pitch) free-planar
coordinates with two 3-joint legs, torque-actuated, foot-ground penalty
contacts, rewarded for forward velocity minus control cost (the
HalfCheetah reward shape).

The embodiment is a simplified 9-DoF planar runner, not a morphological
copy of the MuJoCo scene; the task semantics (underactuated planar gait
discovery through contact) match.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ppi_tpu.envs.physics import ModelBuilder, PhysicsState
from ppi_tpu.envs.physics.engine import HINGE, SLIDE

# dof order: 0 slide-x, 1 slide-z, 2 torso pitch, 3-5 back leg, 6-8 front leg
NQ = 9
TORSO_Z0 = 0.6


def _leg(b, torso, x_off, sign):
    thigh = b.add_body(parent=torso, joint_type=HINGE, axis=(0, 1, 0),
                       offset_pos=(x_off, 0, -0.05), mass=1.5,
                       com=(0, 0, -0.13), inertia=np.diag([0.01] * 3),
                       damping=0.3, armature=0.05,
                       q_limit=(-1.0, 1.0), limit_k=40.0)
    shin = b.add_body(parent=thigh, joint_type=HINGE, axis=(0, 1, 0),
                      offset_pos=(0, 0, -0.26), mass=1.0,
                      com=(0, 0, -0.12), inertia=np.diag([0.006] * 3),
                      damping=0.25, armature=0.04,
                      q_limit=(-1.2, 1.2), limit_k=40.0)
    foot = b.add_body(parent=shin, joint_type=HINGE, axis=(0, 1, 0),
                      offset_pos=(0, 0, -0.24), mass=0.5,
                      com=(0.06 * sign, 0, -0.04),
                      inertia=np.diag([0.003] * 3), damping=0.2,
                      armature=0.03, q_limit=(-0.9, 0.9), limit_k=40.0)
    toe = b.add_sphere(foot, (0.1 * sign, 0, -0.05), 0.045)
    heel = b.add_sphere(foot, (-0.04 * sign, 0, -0.05), 0.045)
    return toe, heel


def _build_model():
    b = ModelBuilder()
    # planar free joint decomposed into two slides + pitch hinge
    b.add_body(parent=-1, joint_type=SLIDE, axis=(1, 0, 0),
               offset_pos=(0, 0, TORSO_Z0), mass=1e-3, damping=0.0,
               armature=1e-4)
    b.add_body(parent=0, joint_type=SLIDE, axis=(0, 0, 1),
               offset_pos=(0, 0, 0), mass=1e-3, damping=0.0, armature=1e-4)
    torso = b.add_body(parent=1, joint_type=HINGE, axis=(0, 1, 0),
                       offset_pos=(0, 0, 0), mass=7.0, com=(0.0, 0, 0),
                       inertia=np.diag([0.1, 0.25, 0.3]), damping=0.05,
                       armature=0.01)
    back = _leg(b, torso, -0.35, -1)
    front = _leg(b, torso, 0.35, 1)
    plane = b.add_plane((0, 0, 1), 0.0)
    for geom in (*back, *front):
        b.add_contact_sphere_plane(geom, plane)
    # torso sphere so faceplants terminate softly instead of exploding
    torso_geom = b.add_sphere(torso, (0, 0, 0), 0.12)
    b.add_contact_sphere_plane(torso_geom, plane)
    b.contact_stiffness = 1.2e4
    b.contact_damping = 120.0
    b.friction_mu = 1.2
    b.friction_vel_k = 120.0
    return b.finalize()


class CheetahState(struct.PyTreeNode):
    physics: PhysicsState
    t: jax.Array


@dataclasses.dataclass(frozen=True)
class Cheetah:
    """Torque control on the 6 leg joints; reward = forward velocity
    - 0.1 |a|^2 (the HalfCheetah shape)."""

    action_dim: int = 6
    dt: float = 0.02
    substeps: int = 4
    max_torque: float = 30.0
    fixed_init: bool = False  # True: pin the zero-noise legacy start

    name = "cheetah"

    def __post_init__(self):
        from ppi_tpu.envs.physics.engine_soa import make_single_step_soa
        model = _build_model()
        object.__setattr__(self, "_model", model)
        object.__setattr__(self, "_step_soa",
                           make_single_step_soa(model, self.dt, self.substeps))

    @property
    def action_low(self):
        return -self.max_torque * jnp.ones(self.action_dim)

    @property
    def action_high(self):
        return self.max_torque * jnp.ones(self.action_dim)

    def reset(self, key):
        qpos = jnp.zeros(NQ).at[3].set(0.2).at[4].set(-0.3) \
            .at[6].set(-0.2).at[7].set(0.3)
        qvel = jnp.zeros(NQ)
        if not self.fixed_init:
            # gym HalfCheetah reset: qpos += U(-0.1, 0.1), qvel += N(0, 0.1)
            kq, kv = jax.random.split(key)
            qpos = qpos + jax.random.uniform(kq, (NQ,), minval=-0.1,
                                             maxval=0.1)
            qvel = 0.1 * jax.random.normal(kv, (NQ,))
        return CheetahState(physics=PhysicsState(qpos=qpos, qvel=qvel),
                            t=jnp.zeros((), jnp.int32))

    def step(self, state, action):
        tau_leg = jnp.clip(action, self.action_low, self.action_high)
        tau = jnp.zeros(NQ).at[3:].set(tau_leg)
        q, qd = state.physics.qpos, state.physics.qvel
        qpos, qvel = self._step_soa(q, qd, tau)
        phys = PhysicsState(qpos=qpos, qvel=qvel)
        forward_vel = qvel[0]
        ctrl_cost = 0.1 * jnp.mean((tau_leg / self.max_torque) ** 2)
        reward = forward_vel - ctrl_cost
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
        return qd[0] - 0.1 * ctrl

    def observe(self, state):
        q, qd = state.physics.qpos, state.physics.qvel
        # x position excluded (translation-invariant observation, gym style)
        return jnp.concatenate([q[1:], qd])
