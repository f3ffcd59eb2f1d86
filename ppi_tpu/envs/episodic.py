"""Episodic policy-search environments.

Counterpart of the reference's episodic layer (reference:
policy_search/envs.py:24-208): environments evaluate a *batch* of action
(joint-trajectory) sequences to episodic costs. Two environments:

  * ``TestEnv`` — the physics-free sinusoid-tracking mock (reference:
    envs.py:56-94): batch_rollout is the identity, so it exercises the
    actions->joints mapping, the matrix-normal policy and the optimizer loop
    with no simulation — the reference's only "mock backend", kept as a
    first-class test fixture.
  * ``BallInACup`` — the WAM task on the on-device sim: N trajectories
    evaluate as one vmapped scan instead of a process pool
    (reference: ball_in_a_cup.py:466-497).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ppi_tpu.envs.ball_in_a_cup import BallInCupSim


@dataclasses.dataclass(frozen=True)
class TestEnv:
    """Sinusoid-tracking mock: cost = MSE of the 'joint' trajectories to a
    bank of sinusoids."""

    dim_action: int = 2
    dim_dof: int = 2
    n_steps: int = 100
    condition: bool = False

    name = "Test"

    @property
    def t(self):
        return jnp.linspace(0.0, 1.0, self.n_steps)

    @property
    def action_0(self):
        return jnp.zeros(self.dim_action)

    @property
    def target(self):
        amps = np.linspace(-1.0, 1.0, self.dim_action)
        t = np.linspace(0.0, 1.0, self.n_steps)
        return jnp.asarray(np.stack(
            [0.5 * amps[k] * np.sin(4 * (k + 1) * t)
             for k in range(self.dim_action)], axis=1))

    def map_actions_to_joints(self, action_sequences):
        d = self.dim_dof
        return action_sequences[..., :d], action_sequences[..., d:]

    def evaluate(self, key, action_sequences):
        """(N, T, 2*d) -> (costs (N,), successes (N,))."""
        del key
        qs, _ = self.map_actions_to_joints(action_sequences)
        err = qs - self.target[None]
        costs = jnp.mean(err ** 2, axis=(1, 2))
        return costs, jnp.zeros_like(costs, bool)

    def objective(self):
        def f(key, actions):
            costs, successes = self.evaluate(key, actions)
            return costs, {"success_rate": successes}
        return f


@dataclasses.dataclass(frozen=True)
class BallInACup:
    """Episodic WAM ball-in-a-cup (reference: envs.py:97-208).

    Policies output 2 position + 2 velocity channels which drive WAM joints
    [1, 3] (shoulder pitch + elbow; reference action_indices at
    envs.py:107); the other joints hold their start pose. Rewards are
    shifted by -100 like the reference (envs.py:205)."""

    dim_action: int = 2
    dim_dof: int = 4
    time_horizon: float = 2.0
    condition: bool = True
    rigid: bool = False  # rigid articulated string (the XML scene's
    #                      mechanical model) instead of the XPBD chain —
    #                      see envs.ball_in_a_cup_rigid

    name = "BallInACup"

    def __post_init__(self):
        if self.rigid:
            from ppi_tpu.envs.ball_in_a_cup_rigid import BallInCupSimRigid
            object.__setattr__(self, "sim", BallInCupSimRigid())
        else:
            object.__setattr__(self, "sim", BallInCupSim())

    @property
    def dt(self):
        return self.sim.effective_dt

    @property
    def t(self):
        n = int(self.time_horizon / self.dt)
        return jnp.linspace(0.0, self.time_horizon, n)

    @property
    def action_0(self):
        return jnp.array([0.0, 1.5707])

    @property
    def q_start(self):
        return jnp.array([0.0, 0.0, 0.0, 1.5707])

    action_indices = (1, 3)

    def map_actions_to_joints(self, action_sequences):
        """(N, T, 4) -> desired (q, qd) each (N, T, 4) with only the two
        actuated joints driven."""
        n, t, d = action_sequences.shape
        assert d == 2 * self.dim_action, d
        qs = jnp.zeros((n, t, self.dim_dof))
        qds = jnp.zeros((n, t, self.dim_dof))
        idx = jnp.asarray(self.action_indices)
        qs = qs.at[..., idx].set(action_sequences[..., :self.dim_action])
        qds = qds.at[..., idx].set(action_sequences[..., self.dim_action:])
        return qs, qds

    def evaluate(self, key, action_sequences):
        """(N, T, 4) -> (costs (N,), successes (N,)): one vmapped
        stabilize+trajectory+cooldown rollout per sample."""
        del key
        qs, qds = self.map_actions_to_joints(action_sequences)

        def one(q_traj, qd_traj):
            final = self.sim.execute_trajectory(self.q_start, q_traj, qd_traj)
            reward, success = self.sim.reward_and_success(final)
            return reward - 100.0, success

        rewards, successes = jax.vmap(one)(qs, qds)
        return -rewards, successes

    def objective(self):
        def f(key, actions):
            costs, successes = self.evaluate(key, actions)
            return costs, {"success_rate": successes}
        return f


def _rigid_bic():
    return BallInACup(rigid=True)


EPISODIC_ENVS = {"Test": TestEnv, "BallInACup": BallInACup,
                 "BallInACupRigid": _rigid_bic}
