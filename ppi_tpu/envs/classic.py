"""Analytic low-dimensional control environments: pendulum and cartpole.

The trivially-integrable physics envs of the test strategy (SURVEY.md §4d):
closed-form dynamics with known behavior (energy conservation, equilibria)
used both as step-level oracles for the physics core and as the minimum
end-to-end MPC slice (Milestone B of SURVEY.md §7). Reward shapes follow the
familiar gym conventions so MPC behavior is comparable.
"""

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct


class ClassicState(struct.PyTreeNode):
    qpos: jax.Array
    qvel: jax.Array
    t: jax.Array  # step counter


@dataclasses.dataclass(frozen=True)
class Pendulum:
    """Torque-limited pendulum swing-up. theta = 0 is upright."""

    action_dim: int = 1
    dt: float = 0.05
    gravity: float = 9.81
    mass: float = 1.0
    length: float = 1.0
    max_torque: float = 2.0
    max_speed: float = 8.0

    @property
    def action_low(self):
        return -self.max_torque * jnp.ones(1)

    @property
    def action_high(self):
        return self.max_torque * jnp.ones(1)

    def reset(self, key):
        del key
        return ClassicState(qpos=jnp.array([jnp.pi]), qvel=jnp.zeros(1),
                            t=jnp.zeros((), jnp.int32))

    def step(self, state, action):
        th, thdot = state.qpos[0], state.qvel[0]
        u = jnp.clip(action[0], -self.max_torque, self.max_torque)
        ml2 = self.mass * self.length ** 2
        # semi-implicit Euler on ml² th'' = -mgl sin(th + pi) ... upright at 0:
        acc = (3.0 * self.gravity / (2.0 * self.length) * jnp.sin(th)
               + 3.0 / ml2 * u)
        thdot = jnp.clip(thdot + acc * self.dt, -self.max_speed, self.max_speed)
        th = th + thdot * self.dt
        next_state = ClassicState(qpos=jnp.array([th]), qvel=jnp.array([thdot]),
                                  t=state.t + 1)
        th_wrapped = jnp.mod(th + jnp.pi, 2.0 * jnp.pi) - jnp.pi
        reward = -(th_wrapped ** 2 + 0.1 * thdot ** 2 + 0.001 * u ** 2)
        return next_state, reward

    def observe(self, state):
        th = state.qpos[0]
        return jnp.array([jnp.cos(th), jnp.sin(th), state.qvel[0]])


@dataclasses.dataclass(frozen=True)
class Cartpole:
    """Cart-pole swing-up with force control on the cart."""

    action_dim: int = 1
    dt: float = 0.02
    gravity: float = 9.81
    mass_cart: float = 1.0
    mass_pole: float = 0.1
    length: float = 0.5  # half pole length
    max_force: float = 10.0
    x_limit: float = 2.4

    @property
    def action_low(self):
        return -self.max_force * jnp.ones(1)

    @property
    def action_high(self):
        return self.max_force * jnp.ones(1)

    def reset(self, key):
        del key
        # hanging down
        return ClassicState(qpos=jnp.array([0.0, jnp.pi]), qvel=jnp.zeros(2),
                            t=jnp.zeros((), jnp.int32))

    def step(self, state, action):
        x, th = state.qpos
        xd, thd = state.qvel
        f = jnp.clip(action[0], -self.max_force, self.max_force)
        mp, mc, l = self.mass_pole, self.mass_cart, self.length
        total = mp + mc
        sin, cos = jnp.sin(th), jnp.cos(th)
        # standard cartpole equations (theta = 0 upright)
        tmp = (f + mp * l * thd ** 2 * sin) / total
        th_acc = (self.gravity * sin - cos * tmp) / (
            l * (4.0 / 3.0 - mp * cos ** 2 / total))
        x_acc = tmp - mp * l * th_acc * cos / total
        xd = xd + x_acc * self.dt
        thd = thd + th_acc * self.dt
        x = x + xd * self.dt
        th = th + thd * self.dt
        next_state = ClassicState(qpos=jnp.array([x, th]),
                                  qvel=jnp.array([xd, thd]), t=state.t + 1)
        th_wrapped = jnp.mod(th + jnp.pi, 2.0 * jnp.pi) - jnp.pi
        upright = jnp.cos(th_wrapped)
        reward = (upright - 0.1 * x ** 2 - 0.01 * xd ** 2 - 0.01 * thd ** 2
                  - 0.001 * f ** 2)
        # out-of-track penalty
        reward = reward - 10.0 * (jnp.abs(x) > self.x_limit)
        return next_state, reward

    def observe(self, state):
        x, th = state.qpos
        return jnp.array([x, jnp.cos(th), jnp.sin(th),
                          state.qvel[0], state.qvel[1]])
