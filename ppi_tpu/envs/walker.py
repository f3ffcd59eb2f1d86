"""Planar biped walker on the articulated physics core.

Engine-backed counterpart of the gym Walker2d-v2 / dm_control walker~walk
rows of the reference's env zoo (reference: run_mpc.py:36-48): an upright
planar torso with two 3-joint legs; reward = forward velocity + upright
alive bonus - control cost."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ppi_tpu.envs.physics import ModelBuilder, PhysicsState
from ppi_tpu.envs.physics.engine import HINGE, SLIDE

NQ = 9
TORSO_Z0 = 1.25


def _leg(b, torso):
    thigh = b.add_body(parent=torso, joint_type=HINGE, axis=(0, 1, 0),
                       offset_pos=(0, 0, -0.2), mass=2.0, com=(0, 0, -0.2),
                       inertia=np.diag([0.02] * 3), damping=0.3,
                       armature=0.05, q_limit=(-1.0, 1.0), limit_k=60.0)
    shin = b.add_body(parent=thigh, joint_type=HINGE, axis=(0, 1, 0),
                      offset_pos=(0, 0, -0.4), mass=1.2, com=(0, 0, -0.2),
                      inertia=np.diag([0.01] * 3), damping=0.25,
                      armature=0.04, q_limit=(-1.5, 0.05), limit_k=60.0)
    foot = b.add_body(parent=shin, joint_type=HINGE, axis=(0, 1, 0),
                      offset_pos=(0, 0, -0.4), mass=0.6, com=(0.06, 0, -0.04),
                      inertia=np.diag([0.003] * 3), damping=0.2,
                      armature=0.03, q_limit=(-0.7, 0.7), limit_k=60.0)
    toe = b.add_sphere(foot, (0.14, 0, -0.05), 0.05)
    heel = b.add_sphere(foot, (-0.05, 0, -0.05), 0.05)
    return toe, heel


def _build_model():
    b = ModelBuilder()
    b.add_body(parent=-1, joint_type=SLIDE, axis=(1, 0, 0),
               offset_pos=(0, 0, TORSO_Z0), mass=1e-3, damping=0.0,
               armature=1e-4)
    b.add_body(parent=0, joint_type=SLIDE, axis=(0, 0, 1),
               offset_pos=(0, 0, 0), mass=1e-3, damping=0.0, armature=1e-4)
    torso = b.add_body(parent=1, joint_type=HINGE, axis=(0, 1, 0),
                       offset_pos=(0, 0, 0), mass=4.0, com=(0, 0, 0.15),
                       inertia=np.diag([0.06, 0.1, 0.06]), damping=0.05,
                       armature=0.01)
    left = _leg(b, torso)
    right = _leg(b, torso)
    plane = b.add_plane((0, 0, 1), 0.0)
    torso_geom = b.add_sphere(torso, (0, 0, 0.15), 0.12)
    for g in (*left, *right, torso_geom):
        b.add_contact_sphere_plane(g, plane)
    b.contact_stiffness = 1.5e4
    b.contact_damping = 150.0
    b.friction_mu = 1.2
    b.friction_vel_k = 150.0
    return b.finalize()


class WalkerState(struct.PyTreeNode):
    physics: PhysicsState
    t: jax.Array


@dataclasses.dataclass(frozen=True)
class Walker:
    action_dim: int = 6
    dt: float = 0.02
    substeps: int = 4
    max_torque: float = 35.0
    fixed_init: bool = False  # True: pin the zero-noise legacy start
    full_range_init: bool = False  # dm_control walker parity: pitch
    #   uniform over [-pi, pi], limited leg hinges uniform over their
    #   FULL ranges per reset (suite randomizers.randomize_limited_and_
    #   rotational_joints); slides and velocities stay at default, as in
    #   the suite. Measured in studies/reset_parity.py.

    name = "walker2d"

    def __post_init__(self):
        from ppi_tpu.envs.physics.engine_soa import make_single_step_soa
        model = _build_model()
        object.__setattr__(self, "_model", model)
        object.__setattr__(self, "_step_soa",
                           make_single_step_soa(model, self.dt, self.substeps))

    @property
    def action_low(self):
        return -self.max_torque * jnp.ones(6)

    @property
    def action_high(self):
        return self.max_torque * jnp.ones(6)

    def reset(self, key):
        qpos = jnp.zeros(NQ).at[3].set(0.1).at[4].set(-0.2).at[6].set(-0.1) \
            .at[7].set(-0.1)
        qvel = jnp.zeros(NQ)
        if self.full_range_init:
            kp, kl = jax.random.split(key)
            lim = self._model.q_limit[3:]
            qpos = qpos.at[2].set(
                jax.random.uniform(kp, (), minval=-jnp.pi, maxval=jnp.pi))
            qpos = qpos.at[3:].set(jax.random.uniform(
                kl, (NQ - 3,), minval=lim[:, 0], maxval=lim[:, 1]))
        elif not self.fixed_init:
            # gym Walker2d reset: qpos/qvel += U(-5e-3, 5e-3)
            kq, kv = jax.random.split(key)
            qpos = qpos + jax.random.uniform(kq, (NQ,), minval=-5e-3,
                                             maxval=5e-3)
            qvel = jax.random.uniform(kv, (NQ,), minval=-5e-3, maxval=5e-3)
        return WalkerState(physics=PhysicsState(qpos=qpos, qvel=qvel),
                           t=jnp.zeros((), jnp.int32))

    def step(self, state, action):
        tau_leg = jnp.clip(action, self.action_low, self.action_high)
        tau = jnp.zeros(NQ).at[3:].set(tau_leg)
        qpos, qvel = self._step_soa(state.physics.qpos, state.physics.qvel,
                                    tau)
        phys = PhysicsState(qpos=qpos, qvel=qvel)
        z = qpos[1] + TORSO_Z0
        pitch = qpos[2]
        healthy = (z > 0.8) & (jnp.abs(pitch) < 0.8)
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
        healthy = ((z > 0.8) & (jnp.abs(q[2]) < 0.8)).astype(jnp.float32)
        return qd[0] + healthy - 2.0 * (1.0 - healthy) - 0.05 * ctrl

    def observe(self, state):
        q, qd = state.physics.qpos, state.physics.qvel
        return jnp.concatenate([q[1:], qd])


def _tolerance(x, lower, upper, margin, value_at_margin=0.1):
    """dm_control rewards.tolerance with the gaussian sigmoid: 1 inside
    [lower, upper], decaying to ``value_at_margin`` at ``margin`` outside
    (the reward primitive of the dm_control suite tasks)."""
    below = jnp.maximum(lower - x, 0.0)
    above = jnp.maximum(x - upper, 0.0)
    d = (below + above) / jnp.maximum(margin, 1e-9)
    scale = jnp.sqrt(-2.0 * jnp.log(value_at_margin))
    return jnp.exp(-0.5 * (d * scale) ** 2)


@dataclasses.dataclass(frozen=True)
class WalkerWalk(Walker):
    """dm_control ``walker~walk`` reward variant on the same embodiment:
    stand term (torso height + uprightness tolerances) gated with a
    horizontal-speed tolerance, reward in [0, 1] per step — the reference
    env zoo treats Walker2d-v2 (gym shaping, class ``Walker``) and
    walker~walk (dm_control shaping, this class) as distinct envs
    (reference: run_mpc.py:37, 44)."""

    walk_speed: float = 1.0
    stand_height: float = 1.0

    name = "walker~walk"

    def step(self, state, action):
        tau_leg = jnp.clip(action, self.action_low, self.action_high)
        tau = jnp.zeros(NQ).at[3:].set(tau_leg)
        qpos, qvel = self._step_soa(state.physics.qpos, state.physics.qvel,
                                    tau)
        phys = PhysicsState(qpos=qpos, qvel=qvel)
        z = qpos[1] + TORSO_Z0
        upright = jnp.cos(qpos[2])
        standing = _tolerance(z, self.stand_height, jnp.inf,
                              margin=self.stand_height / 2.0)
        stand_reward = standing * (1.0 + jnp.maximum(upright, 0.0)) / 2.0
        move = _tolerance(qvel[0], self.walk_speed, jnp.inf,
                          margin=self.walk_speed / 2.0, value_at_margin=0.5)
        reward = stand_reward * (5.0 * move + 1.0) / 6.0
        return state.replace(physics=phys, t=state.t + 1), reward

    def scalar_reward(self, m, q, qd, act):
        # dm_control shaping has no control cost; ``act`` is unused but the
        # inherited ``scalar_reward_takes_action`` keeps one signature
        del act
        z = q[1] + TORSO_Z0
        upright = jnp.cos(q[2])
        standing = _tolerance(z, self.stand_height, jnp.inf,
                              margin=self.stand_height / 2.0)
        stand_reward = standing * (1.0 + jnp.maximum(upright, 0.0)) / 2.0
        move = _tolerance(qd[0], self.walk_speed, jnp.inf,
                          margin=self.walk_speed / 2.0, value_at_margin=0.5)
        return stand_reward * (5.0 * move + 1.0) / 6.0
