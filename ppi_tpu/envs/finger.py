"""Finger-spin on the articulated physics core.

Engine-backed counterpart of the dm_control ``finger~spin`` row of the
reference's env zoo (reference: run_mpc.py:36-48): a 2-DoF planar finger
must flick a free-spinning hinged body and keep it rotating. Reward is the
spinner's angular velocity (clipped), the dm_control task's shape.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ppi_tpu.envs.physics import ModelBuilder, PhysicsState
from ppi_tpu.envs.physics.engine import HINGE

# dofs: 0 proximal, 1 distal (finger), 2 spinner hinge
SPINNER = 2


def _build_model():
    b = ModelBuilder()
    b.add_body(parent=-1, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0, 0, 0.6), mass=1.0, com=(0, 0, -0.17),
               inertia=np.diag([0.005] * 3), damping=0.3, armature=0.03,
               q_limit=(-2.0, 2.0), limit_k=30.0)
    b.add_body(parent=0, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0, 0, -0.34), mass=0.6, com=(0, 0, -0.13),
               inertia=np.diag([0.003] * 3), damping=0.2, armature=0.02,
               q_limit=(-2.2, 2.2), limit_k=30.0)
    # free-spinning paddle on a fixed stand in front of the finger
    b.add_body(parent=-1, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0.25, 0, 0.25), mass=0.4, com=(0.0, 0, 0.0),
               inertia=np.diag([0.002, 0.004, 0.002]), damping=0.02,
               armature=0.005)
    tip = b.add_sphere(1, (0, 0, -0.28), 0.035)
    pad_a = b.add_sphere(SPINNER, (0.0, 0, 0.13), 0.03)
    pad_b = b.add_sphere(SPINNER, (0.0, 0, -0.13), 0.03)
    b.add_contact_sphere_segment(tip, pad_a, pad_b)
    b.contact_stiffness = 4e3
    b.contact_damping = 60.0
    b.friction_mu = 1.0
    b.friction_vel_k = 60.0
    return b.finalize()


class FingerState(struct.PyTreeNode):
    physics: PhysicsState
    t: jax.Array


@dataclasses.dataclass(frozen=True)
class FingerSpin:
    """Torque control on the 2 finger joints; reward = spinner angular
    velocity (positive direction), saturated."""

    action_dim: int = 2
    dt: float = 0.02
    substeps: int = 2
    max_torque: float = 4.0
    fixed_init: bool = False  # True: pin the zero-noise legacy start
    full_range_init: bool = False  # dm_control parity: finger joints
    #   uniform over their FULL limit ranges per reset (suite
    #   randomizers.randomize_limited_and_rotational_joints), not the
    #   bounded ±0.2 rad perturbation. Measured in studies/reset_parity.py.

    name = "finger~spin"

    def __post_init__(self):
        from ppi_tpu.envs.physics.engine_soa import make_single_step_soa
        model = _build_model()
        object.__setattr__(self, "_model", model)
        object.__setattr__(self, "_step_soa",
                           make_single_step_soa(model, self.dt, self.substeps))

    @property
    def action_low(self):
        return -self.max_torque * jnp.ones(2)

    @property
    def action_high(self):
        return self.max_torque * jnp.ones(2)

    def reset(self, key):
        qpos = jnp.array([-0.2, -0.5, 0.0])
        if not self.fixed_init:
            # dm_control finger~spin randomizes the finger joint angles
            # and the free spinner hinge per episode; re-hosted as a
            # bounded perturbation about the engage pose (+ uniform
            # spinner angle — its full range, as in dm_control). The
            # full-range FINGER randomization is deliberately narrowed:
            # see PARITY.md (reset-distribution deltas).
            kf, ks = jax.random.split(key)
            if self.full_range_init:
                lim = self._model.q_limit[:2]
                qpos = qpos.at[:2].set(jax.random.uniform(
                    kf, (2,), minval=lim[:, 0], maxval=lim[:, 1]))
            else:
                qpos = qpos.at[:2].add(
                    jax.random.uniform(kf, (2,), minval=-0.2, maxval=0.2))
            qpos = qpos.at[SPINNER].set(
                jax.random.uniform(ks, (), minval=-jnp.pi, maxval=jnp.pi))
        return FingerState(
            physics=PhysicsState(qpos=qpos, qvel=jnp.zeros(3)),
            t=jnp.zeros((), jnp.int32))

    def step(self, state, action):
        tau_f = jnp.clip(action, self.action_low, self.action_high)
        tau = jnp.zeros(3).at[:2].set(tau_f)
        qpos, qvel = self._step_soa(state.physics.qpos, state.physics.qvel,
                                    tau)
        phys = PhysicsState(qpos=qpos, qvel=qvel)
        spin = qvel[SPINNER]
        reward = jnp.clip(spin / 5.0, -1.0, 1.0) - 0.01 * jnp.sum(
            (tau_f / self.max_torque) ** 2)
        return state.replace(physics=phys, t=state.t + 1), reward

    # ---- scalar-SoA kernel contract (pallas_rollout) ------------------
    scalar_reward_takes_action = True

    def scalar_torque(self, m, q, qd, act):
        lim = self.max_torque
        return (jnp.clip(act[0], -lim, lim), jnp.clip(act[1], -lim, lim),
                jnp.zeros_like(q[0]))

    def scalar_reward(self, m, q, qd, act):
        lim = self.max_torque
        ctrl = sum(jnp.clip(act[j], -lim, lim) ** 2
                   for j in range(2)) / (lim * lim)
        return jnp.clip(qd[SPINNER] / 5.0, -1.0, 1.0) - 0.01 * ctrl

    def observe(self, state):
        q, qd = state.physics.qpos, state.physics.qvel
        return jnp.concatenate([
            jnp.sin(q), jnp.cos(q), qd])
