"""Two-link planar reacher on the articulated physics core.

Engine-backed counterpart of the gym Reacher-class tasks in the reference's
env zoo (reference: run_mpc.py:36-48): a 2-DoF arm driven by joint torques
must bring its fingertip to a target. Serves as the simplest engine-backed
MPC environment (no contacts)."""

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from ppi_tpu.envs.physics import ModelBuilder, PhysicsState, step
from ppi_tpu.envs.physics.engine import HINGE


def _build_model():
    b = ModelBuilder()
    b.add_body(parent=-1, joint_type=HINGE, axis=(0, 0, 1),
               offset_pos=(0, 0, 0), mass=1.0, com=(0.1, 0, 0),
               inertia=1e-3 * jnp.eye(3), damping=0.3, armature=0.02)
    b.add_body(parent=0, joint_type=HINGE, axis=(0, 0, 1),
               offset_pos=(0.2, 0, 0), mass=1.0, com=(0.1, 0, 0),
               inertia=1e-3 * jnp.eye(3), damping=0.3, armature=0.02)
    b.gravity = (0.0, 0.0, 0.0)  # planar
    return b.finalize()


class ReacherState(struct.PyTreeNode):
    physics: PhysicsState
    target: jax.Array
    t: jax.Array


@dataclasses.dataclass(frozen=True)
class Reacher:
    action_dim: int = 2
    dt: float = 0.02
    substeps: int = 2
    max_torque: float = 1.0
    target: tuple = (0.15, 0.25)  # legacy pinned target (fixed_goal)
    fixed_goal: bool = False  # True: pin the legacy target + zero-noise init

    def __post_init__(self):
        object.__setattr__(self, "_model", _build_model())

    @property
    def action_low(self):
        return -self.max_torque * jnp.ones(2)

    @property
    def action_high(self):
        return self.max_torque * jnp.ones(2)

    def sample_target(self, key):
        """gym Reacher samples the goal uniformly over the square clipped
        to the 0.2 m disk (resample-until-inside). Re-hosted under jit as
        a fixed 8-draw first-accept (acceptance ~pi/4 per draw, miss
        probability ~2e-5); all-miss fallback projects radially just
        inside the disk."""
        draws = jax.random.uniform(key, (8, 2), minval=-0.2, maxval=0.2)
        ok = jnp.linalg.norm(draws, axis=1) < 0.2
        idx = jnp.argmax(ok)  # first accepted draw
        cand = draws[idx]
        fallback = cand * (0.19 / jnp.maximum(jnp.linalg.norm(cand), 1e-9))
        return jnp.where(jnp.any(ok), cand, fallback)

    def reset(self, key):
        if self.fixed_goal:
            return ReacherState(
                physics=PhysicsState(qpos=jnp.zeros(2), qvel=jnp.zeros(2)),
                target=jnp.asarray(self.target),
                t=jnp.zeros((), jnp.int32))
        # gym Reacher reset: qpos += U(-0.1, 0.1), qvel += U(-5e-3, 5e-3)
        kq, kv, kt = jax.random.split(key, 3)
        qpos = jax.random.uniform(kq, (2,), minval=-0.1, maxval=0.1)
        qvel = jax.random.uniform(kv, (2,), minval=-5e-3, maxval=5e-3)
        return ReacherState(
            physics=PhysicsState(qpos=qpos, qvel=qvel),
            target=self.sample_target(kt), t=jnp.zeros((), jnp.int32))

    def fingertip(self, qpos):
        q1, q2 = qpos[0], qpos[1]
        x = 0.2 * jnp.cos(q1) + 0.2 * jnp.cos(q1 + q2)
        y = 0.2 * jnp.sin(q1) + 0.2 * jnp.sin(q1 + q2)
        return jnp.array([x, y])

    def step(self, state, action):
        tau = jnp.clip(action, -self.max_torque, self.max_torque)
        phys = step(self._model, state.physics, tau, self.dt, self.substeps)
        tip = self.fingertip(phys.qpos)
        dist = jnp.linalg.norm(tip - state.target)
        reward = -dist - 0.01 * jnp.sum(action ** 2)
        return state.replace(physics=phys, t=state.t + 1), reward

    # ---- scalar-SoA kernel contract (pallas_rollout) ------------------
    scalar_reward_takes_action = True

    def scalar_torque(self, m, q, qd, act):
        lim = self.max_torque
        return tuple(jnp.clip(act[j], -lim, lim) for j in range(2))

    def scalar_reward_consts(self, state):
        return state.target

    def scalar_reward(self, m, q, qd, act, consts):
        tx, ty = consts
        x = 0.2 * jnp.cos(q[0]) + 0.2 * jnp.cos(q[0] + q[1])
        y = 0.2 * jnp.sin(q[0]) + 0.2 * jnp.sin(q[0] + q[1])
        dist = jnp.sqrt((x - tx) ** 2 + (y - ty) ** 2)
        # env.step penalizes the RAW action (pre-clip), matching here
        return -dist - 0.01 * (act[0] ** 2 + act[1] ** 2)

    def observe(self, state):
        return jnp.concatenate([
            jnp.cos(state.physics.qpos), jnp.sin(state.physics.qpos),
            state.physics.qvel, state.target,
            self.fingertip(state.physics.qpos)])
