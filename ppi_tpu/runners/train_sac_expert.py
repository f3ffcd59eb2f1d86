"""SAC expert trainer for the model-selection pipeline.

JAX/optax counterpart of the reference's torch + mushroom_rl SAC expert
(reference: mpc/model_selection/data/train_humanoid_standup_expert.py):
train a soft actor-critic agent on an engine env (HumanoidStandup-class by
default) and log the trained policy's action stream to the same npz layout
as runners.collect_expert, for consumption by ppi_tpu.model_selection.

TPU-native design notes: the environment interaction loop runs in fixed-size
jitted chunks (``rollout_steps`` env steps per chunk, batched gradient
updates after each chunk) so the whole train step — env scan, replay
sampling, twin-critic TD targets, tanh-Gaussian actor update, temperature
update, Polyak averaging — is compiled once. The replay buffer is a
device-resident ring (pure functional writes), so there is no host<->device
traffic inside training.

    python -m ppi_tpu.runners.train_sac_expert --env humanoid-standup \
        --steps 100000 --out standup_expert.npz
"""

import argparse
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


class MLP(nn.Module):
    out_dim: int
    hidden: int = 256

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(self.out_dim)(x)


class Actor(nn.Module):
    action_dim: int
    hidden: int = 256

    @nn.compact
    def __call__(self, obs):
        h = MLP(2 * self.action_dim, self.hidden)(obs)
        mu, log_std = jnp.split(h, 2, axis=-1)
        log_std = jnp.clip(log_std, -5.0, 2.0)
        return mu, log_std


def sample_action(actor_params, actor, obs, key):
    """tanh-squashed Gaussian sample with log-prob (SAC change of variables)."""
    mu, log_std = actor.apply(actor_params, obs)
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mu.shape)
    pre = mu + std * eps
    a = jnp.tanh(pre)
    logp = jnp.sum(
        -0.5 * (eps ** 2 + 2.0 * log_std + jnp.log(2.0 * jnp.pi))
        - jnp.log(1.0 - a ** 2 + 1e-6), axis=-1)
    return a, logp


class Replay(NamedTuple):
    obs: jax.Array
    act: jax.Array
    rew: jax.Array
    nobs: jax.Array
    ptr: jax.Array
    full: jax.Array

    @staticmethod
    def create(capacity, obs_dim, act_dim):
        return Replay(jnp.zeros((capacity, obs_dim)),
                      jnp.zeros((capacity, act_dim)),
                      jnp.zeros((capacity,)),
                      jnp.zeros((capacity, obs_dim)),
                      jnp.zeros((), jnp.int32), jnp.zeros((), bool))

    def push_batch(self, obs, act, rew, nobs):
        n, cap = obs.shape[0], self.obs.shape[0]
        idx = (self.ptr + jnp.arange(n)) % cap
        return Replay(self.obs.at[idx].set(obs), self.act.at[idx].set(act),
                      self.rew.at[idx].set(rew), self.nobs.at[idx].set(nobs),
                      (self.ptr + n) % cap,
                      self.full | (self.ptr + n >= cap))

    def sample(self, key, batch):
        cap = self.obs.shape[0]
        hi = jnp.where(self.full, cap, jnp.maximum(self.ptr, 1))
        idx = jax.random.randint(key, (batch,), 0, hi)
        return (self.obs[idx], self.act[idx], self.rew[idx], self.nobs[idx])


class SacState(NamedTuple):
    actor: dict
    critic: dict
    critic_target: dict
    log_alpha: jax.Array
    opt_actor: optax.OptState
    opt_critic: optax.OptState
    opt_alpha: optax.OptState
    replay: Replay
    env_state: object
    obs: jax.Array
    key: jax.Array


class SAC:
    """Compact twin-critic SAC with automatic temperature."""

    def __init__(self, env, gamma=0.99, tau=0.005, lr=3e-4,
                 batch_size=256, rollout_steps=64, updates_per_chunk=64,
                 capacity=200_000, action_scale=None):
        self.env = env
        self.obs_dim = int(env.observe(env.reset(jax.random.key(0))).shape[0])
        self.act_dim = int(env.action_dim)
        self.gamma, self.tau = gamma, tau
        self.batch_size = batch_size
        self.rollout_steps = rollout_steps
        self.updates_per_chunk = updates_per_chunk
        self.capacity = capacity
        self.actor = Actor(self.act_dim)
        self.critic = MLP(2)  # twin heads
        self.target_entropy = -float(self.act_dim)
        self.opt = optax.adam(lr)
        lo, hi = np.asarray(env.action_low), np.asarray(env.action_high)
        self.a_mid = jnp.asarray(0.5 * (hi + lo))
        self.a_half = jnp.asarray(0.5 * (hi - lo))

    def scale(self, a):
        return self.a_mid + self.a_half * a

    def init(self, key) -> SacState:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        obs0 = jnp.zeros((self.obs_dim,))
        ain = jnp.zeros((self.act_dim,))
        actor_p = self.actor.init(k1, obs0)
        critic_p = self.critic.init(k2, jnp.concatenate([obs0, ain]))
        env_state = self.env.reset(k3)
        return SacState(
            actor=actor_p, critic=critic_p, critic_target=critic_p,
            log_alpha=jnp.zeros(()),
            opt_actor=self.opt.init(actor_p),
            opt_critic=self.opt.init(critic_p),
            opt_alpha=self.opt.init(jnp.zeros(())),
            replay=Replay.create(self.capacity, self.obs_dim, self.act_dim),
            env_state=env_state, obs=self.env.observe(env_state), key=k4)

    # ------------------------------------------------------------------
    def _q(self, params, obs, act):
        return self.critic.apply(params, jnp.concatenate([obs, act], -1))

    def _update(self, state: SacState, key):
        k1, k2, k3 = jax.random.split(key, 3)
        obs, act, rew, nobs = state.replay.sample(k1, self.batch_size)
        alpha = jnp.exp(state.log_alpha)

        na, nlogp = sample_action(state.actor, self.actor, nobs, k2)
        qt = jax.vmap(partial(self._q, state.critic_target))(nobs, na)
        target = rew + self.gamma * (jnp.min(qt, -1) - alpha * nlogp)
        target = jax.lax.stop_gradient(target)

        def critic_loss(p):
            q = jax.vmap(partial(self._q, p))(obs, act)
            return jnp.mean((q - target[:, None]) ** 2)

        cl, gc = jax.value_and_grad(critic_loss)(state.critic)
        uc, opt_critic = self.opt.update(gc, state.opt_critic)
        critic = optax.apply_updates(state.critic, uc)

        def actor_loss(p):
            a, logp = sample_action(p, self.actor, obs, k3)
            q = jax.vmap(partial(self._q, critic))(obs, a)
            return jnp.mean(alpha * logp - jnp.min(q, -1)), logp

        (al, logp), ga = jax.value_and_grad(actor_loss, has_aux=True)(
            state.actor)
        ua, opt_actor = self.opt.update(ga, state.opt_actor)
        actor = optax.apply_updates(state.actor, ua)

        def alpha_loss(la):
            return -la * jnp.mean(jax.lax.stop_gradient(
                logp + self.target_entropy))

        _, gal = jax.value_and_grad(alpha_loss)(state.log_alpha)
        ual, opt_alpha = self.opt.update(gal, state.opt_alpha)
        log_alpha = optax.apply_updates(state.log_alpha, ual)

        critic_target = jax.tree_util.tree_map(
            lambda t, p: (1 - self.tau) * t + self.tau * p,
            state.critic_target, critic)
        return state._replace(actor=actor, critic=critic,
                              critic_target=critic_target,
                              log_alpha=log_alpha, opt_actor=opt_actor,
                              opt_critic=opt_critic, opt_alpha=opt_alpha), cl

    @partial(jax.jit, static_argnums=0)
    def train_chunk(self, state: SacState):
        """rollout_steps env steps + updates_per_chunk gradient updates,
        all under one jit."""

        def env_step(carry, _):
            es, obs, key = carry
            key, ka = jax.random.split(key)
            a, _ = sample_action(state.actor, self.actor, obs, ka)
            es2, rew = self.env.step(es, self.scale(a))
            nobs = self.env.observe(es2)
            return (es2, nobs, key), (obs, a, rew, nobs)

        (es, obs, key), (o, a, r, no) = jax.lax.scan(
            env_step, (state.env_state, state.obs, state.key), None,
            length=self.rollout_steps)
        replay = state.replay.push_batch(o, a, r, no)
        state = state._replace(replay=replay, env_state=es, obs=obs, key=key)

        def upd(carry, _):
            st, key = carry
            key, ku = jax.random.split(key)
            st, cl = self._update(st, ku)
            return (st, key), (cl, jnp.mean(r))

        (state, key), (cls, rews) = jax.lax.scan(
            upd, (state, key), None, length=self.updates_per_chunk)
        return state._replace(key=key), (jnp.mean(cls), jnp.mean(r))

    def collect(self, state: SacState, key, steps: int):
        """Roll the trained (deterministic-mean) policy for `steps`."""

        @jax.jit
        def body(carry, _):
            es, obs = carry
            mu, _ = self.actor.apply(state.actor, obs)
            act = self.scale(jnp.tanh(mu))
            es2, rew = self.env.step(es, act)
            return (es2, self.env.observe(es2)), (obs, act, rew)

        es = self.env.reset(key)
        (_, _), (obs, act, rew) = jax.lax.scan(
            body, (es, self.env.observe(es)), None, length=steps)
        return np.asarray(obs), np.asarray(act), np.asarray(rew)


def main(args):
    from ppi_tpu.runners.profile_mpc import build_env
    env = build_env(args.env)
    sac = SAC(env, rollout_steps=args.rollout_steps,
              batch_size=args.batch_size)
    state = sac.init(jax.random.key(args.seed))
    n_chunks = max(1, args.steps // sac.rollout_steps)
    for i in range(n_chunks):
        state, (cl, rbar) = sac.train_chunk(state)
        if i % max(1, n_chunks // 20) == 0:
            print(f"chunk {i}/{n_chunks}: critic loss {float(cl):.4f} "
                  f"mean reward {float(rbar):.4f}", flush=True)
    obs, act, rew = sac.collect(state, jax.random.key(args.seed + 1),
                                args.collect_steps)
    np.savez(args.out, observations=obs, actions=act, rewards=rew)
    print(f"wrote {args.out}: return {float(rew.sum()):.2f} over "
          f"{args.collect_steps} steps")


if __name__ == "__main__":
    from ppi_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="humanoid-standup")
    p.add_argument("--steps", type=int, default=100_000)
    p.add_argument("--collect-steps", type=int, default=2000)
    p.add_argument("--rollout-steps", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="standup_expert.npz")
    main(p.parse_args())
