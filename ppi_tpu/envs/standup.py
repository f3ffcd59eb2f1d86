"""Planar humanoid-standup on the articulated physics core.

Engine-backed counterpart of the gym HumanoidStandup-v2 row of the
reference's env zoo — the scene its profiling harness sweeps (reference:
profile_mpc.py:15, run_mpc.py:36-48). The 17-DoF 3-D humanoid is simplified
to a planar 8-DoF figure (free-planar torso + hip, knee, ankle, shoulder,
elbow) that starts supine and is rewarded for raising its head — the
HumanoidStandup reward shape (head height rate + control cost).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ppi_tpu.envs.physics import ModelBuilder, PhysicsState
from ppi_tpu.envs.physics.engine import HINGE, SLIDE

NQ = 8
X, Z, PITCH, HIP, KNEE, ANKLE, SHOULDER, ELBOW = range(NQ)
TORSO_Z0 = 0.22  # lying down


def _build_model():
    b = ModelBuilder()
    b.add_body(parent=-1, joint_type=SLIDE, axis=(1, 0, 0),
               offset_pos=(0, 0, TORSO_Z0), mass=1e-3, damping=0.0,
               armature=1e-4)
    b.add_body(parent=0, joint_type=SLIDE, axis=(0, 0, 1),
               offset_pos=(0, 0, 0), mass=1e-3, damping=0.0, armature=1e-4)
    # torso extends +x in its local frame (lying: local +x = world +x)
    torso = b.add_body(parent=1, joint_type=HINGE, axis=(0, 1, 0),
                       offset_pos=(0, 0, 0), mass=6.0, com=(0.25, 0, 0),
                       inertia=np.diag([0.1, 0.35, 0.35]), damping=0.1,
                       armature=0.02)
    hip = b.add_body(parent=torso, joint_type=HINGE, axis=(0, 1, 0),
                     offset_pos=(0.0, 0, 0), mass=3.0, com=(-0.18, 0, 0),
                     inertia=np.diag([0.03] * 3), damping=0.5, armature=0.08,
                     q_limit=(-2.6, 0.3), limit_k=80.0)
    knee = b.add_body(parent=hip, joint_type=HINGE, axis=(0, 1, 0),
                      offset_pos=(-0.36, 0, 0), mass=1.8, com=(-0.17, 0, 0),
                      inertia=np.diag([0.015] * 3), damping=0.4,
                      armature=0.06, q_limit=(-0.05, 2.4), limit_k=80.0)
    foot = b.add_body(parent=knee, joint_type=HINGE, axis=(0, 1, 0),
                      offset_pos=(-0.34, 0, 0), mass=0.8, com=(0.0, 0, -0.04),
                      inertia=np.diag([0.004] * 3), damping=0.3,
                      armature=0.04, q_limit=(-1.0, 1.0), limit_k=60.0)
    arm = b.add_body(parent=torso, joint_type=HINGE, axis=(0, 1, 0),
                     offset_pos=(0.42, 0, 0), mass=1.2, com=(-0.14, 0, 0),
                     inertia=np.diag([0.008] * 3), damping=0.3, armature=0.04,
                     q_limit=(-2.8, 2.8), limit_k=60.0)
    hand = b.add_body(parent=arm, joint_type=HINGE, axis=(0, 1, 0),
                      offset_pos=(-0.28, 0, 0), mass=0.6, com=(-0.12, 0, 0),
                      inertia=np.diag([0.004] * 3), damping=0.25,
                      armature=0.03, q_limit=(-2.4, 0.1), limit_k=60.0)

    plane = b.add_plane((0, 0, 1), 0.0)
    geoms = [
        b.add_sphere(torso, (0.0, 0, 0), 0.10),        # pelvis
        b.add_sphere(torso, (0.30, 0, 0), 0.10),       # chest
        b.add_sphere(torso, (0.52, 0, 0), 0.09),       # head
        b.add_sphere(hip, (-0.30, 0, 0), 0.06),        # thigh
        b.add_sphere(knee, (-0.30, 0, 0), 0.05),       # shin
        b.add_sphere(foot, (0.06, 0, -0.04), 0.045),   # toe
        b.add_sphere(foot, (-0.07, 0, -0.04), 0.045),  # heel
        b.add_sphere(arm, (-0.26, 0, 0), 0.05),        # forearm
        b.add_sphere(hand, (-0.22, 0, 0), 0.05),       # hand
    ]
    for g in geoms:
        b.add_contact_sphere_plane(g, plane)
    b.contact_stiffness = 1.2e4
    b.contact_damping = 150.0
    b.friction_mu = 1.0
    b.friction_vel_k = 150.0
    return b.finalize(), geoms[2]  # head geom index


class StandupState(struct.PyTreeNode):
    physics: PhysicsState
    t: jax.Array


@dataclasses.dataclass(frozen=True)
class HumanoidStandup:
    """Torque control on hip/knee/ankle/shoulder/elbow; reward = head height
    (the HumanoidStandup uph-cost shape) minus control cost."""

    action_dim: int = 5
    dt: float = 0.02
    substeps: int = 4
    max_torque: float = 60.0
    fixed_init: bool = False  # True: pin the zero-noise legacy start

    name = "humanoid-standup"

    def __post_init__(self):
        from ppi_tpu.envs.physics.engine_soa import (
            make_single_step_soa, make_sites_soa)
        model, head = _build_model()
        object.__setattr__(self, "_model", model)
        object.__setattr__(self, "_head_geom", head)
        object.__setattr__(self, "_step_soa",
                           make_single_step_soa(model, self.dt, self.substeps))
        object.__setattr__(self, "_sites_soa", make_sites_soa(model))

    @property
    def action_low(self):
        return -self.max_torque * jnp.ones(self.action_dim)

    @property
    def action_high(self):
        return self.max_torque * jnp.ones(self.action_dim)

    def reset(self, key):
        # supine: torso flat, legs slightly bent, arm alongside
        qpos = jnp.zeros(NQ).at[HIP].set(-0.3).at[KNEE].set(0.5) \
            .at[ELBOW].set(-0.2)
        qvel = jnp.zeros(NQ)
        if not self.fixed_init:
            # gym HumanoidStandup reset: qpos/qvel += U(-0.01, 0.01)
            kq, kv = jax.random.split(key)
            qpos = qpos + jax.random.uniform(kq, (NQ,), minval=-0.01,
                                             maxval=0.01)
            qvel = jax.random.uniform(kv, (NQ,), minval=-0.01, maxval=0.01)
        return StandupState(
            physics=PhysicsState(qpos=qpos, qvel=qvel),
            t=jnp.zeros((), jnp.int32))

    def head_height(self, qpos):
        return self._sites_soa(qpos)[self._head_geom][2]

    def step(self, state, action):
        tau_j = jnp.clip(action, self.action_low, self.action_high)
        tau = jnp.zeros(NQ).at[HIP:].set(tau_j)
        qpos, qvel = self._step_soa(state.physics.qpos, state.physics.qvel,
                                    tau)
        phys = PhysicsState(qpos=qpos, qvel=qvel)
        head_z = self.head_height(qpos)
        # gym HumanoidStandup: uph_cost = head height / dt-scale, quad ctrl
        reward = (head_z / 0.3
                  - 0.1 * jnp.mean((tau_j / self.max_torque) ** 2)
                  - 1e-3 * jnp.sum(qvel ** 2))
        return state.replace(physics=phys, t=state.t + 1), reward

    # ---- scalar-SoA kernel contract (pallas_rollout) ------------------
    scalar_reward_takes_action = True

    def scalar_torque(self, m, q, qd, act):
        lim = self.max_torque
        tau = [jnp.zeros_like(q[0])] * HIP
        tau += [jnp.clip(act[j], -lim, lim) for j in range(self.action_dim)]
        return tuple(tau)

    def scalar_reward(self, m, q, qd, act):
        from ppi_tpu.envs.physics.engine_soa import fk_soa, geom_point_soa
        rots, poss, _, _ = fk_soa(m, q)
        head_z = geom_point_soa(m, rots, poss, self._head_geom)[2]
        lim = self.max_torque
        ctrl = sum(jnp.clip(act[j], -lim, lim) ** 2
                   for j in range(self.action_dim)) \
            / (self.action_dim * lim * lim)
        vel2 = sum(qd[j] * qd[j] for j in range(NQ))
        return head_z / 0.3 - 0.1 * ctrl - 1e-3 * vel2

    def observe(self, state):
        q, qd = state.physics.qpos, state.physics.qvel
        return jnp.concatenate([q[1:], qd,
                                jnp.array([self.head_height(q)])])
