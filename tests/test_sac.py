"""SAC expert trainer (the reference's torch/mushroom_rl expert source,
re-built in JAX/optax; reference:
mpc/model_selection/data/train_humanoid_standup_expert.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ppi_tpu.envs.classic import Pendulum
from ppi_tpu.runners.train_sac_expert import SAC


class TestSac:
    def test_train_chunk_runs_and_stays_finite(self):
        env = Pendulum()
        sac = SAC(env, rollout_steps=32, updates_per_chunk=8,
                  batch_size=64, capacity=2048)
        state = sac.init(jax.random.key(0))
        for _ in range(4):
            state, (cl, rbar) = sac.train_chunk(state)
        assert np.isfinite(float(cl)) and np.isfinite(float(rbar))
        # parameters actually moved
        leaf0 = jax.tree_util.tree_leaves(sac.init(jax.random.key(0)).actor)
        leaf1 = jax.tree_util.tree_leaves(state.actor)
        assert any(not np.allclose(a, b) for a, b in zip(leaf0, leaf1))

    def test_collect_produces_expert_layout(self):
        env = Pendulum()
        sac = SAC(env, rollout_steps=16, updates_per_chunk=2,
                  batch_size=32, capacity=512)
        state = sac.init(jax.random.key(0))
        state, _ = sac.train_chunk(state)
        obs, act, rew = sac.collect(state, jax.random.key(1), steps=50)
        assert obs.shape[0] == act.shape[0] == rew.shape[0] == 50
        assert act.shape[1] == env.action_dim
        # actions respect the actuator box
        assert (act >= np.asarray(env.action_low) - 1e-5).all()
        assert (act <= np.asarray(env.action_high) + 1e-5).all()

    def test_learns_on_pendulum(self):
        """Sanity: after a few thousand steps SAC's average reward on the
        swing-up improves over the initial random policy."""
        env = Pendulum()
        sac = SAC(env, rollout_steps=64, updates_per_chunk=32,
                  batch_size=128, capacity=20_000)
        state = sac.init(jax.random.key(2))
        rewards = []
        for _ in range(40):
            state, (cl, rbar) = sac.train_chunk(state)
            rewards.append(float(rbar))
        early = np.mean(rewards[:5])
        late = np.mean(rewards[-5:])
        assert late > early, (early, late)
