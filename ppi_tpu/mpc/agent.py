"""Receding-horizon MPC agent.

Counterpart of ``Mpc`` (reference: mpc/mpc.py:10-110), redesigned so one
control step — window shift, policy conditioning, n_iters x (sample -> N
parallel rollouts -> posterior update), action extraction — is a single
jitted program, and the whole T-step episode can optionally run under one
``lax.scan`` (``run_episode_scan``): zero host round-trips per episode.

Static-shape discipline: the reference truncates the planning window at the
episode end (reference: mpc/mpc.py:50-56); here the window is always H steps
and a reward mask zeroes contributions past the horizon, so XLA sees one
shape for every control step.
"""

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ppi_tpu.algorithms.base import _one_iteration
from ppi_tpu.envs.base import mpc_objective


class MpcCarry(struct.PyTreeNode):
    """Everything the agent threads between control steps."""

    policy: Any          # policy-state pytree
    key: jax.Array


def _round_up_128(n: int) -> int:
    return -(-n // 128) * 128


def _pick_block(n_samples: int) -> int:
    """Pallas rollout block size: minimize GRID STEPS, not padded lanes.

    Measured on v5e (door megakernel, H=160): per-grid-step cost is nearly
    independent of block width <= 1024 (a (128,) f32 op occupies the same
    VREG issue slots as a (1024,) one), so padding is almost free while
    every extra grid step replays the whole horizon loop. n=1100:
    block=1024 (2 steps, 2048 padded lanes) = 2.5 ms vs the "no-waste"
    block=128 (9 steps) = 4.5 ms; n=1408 (11 prime 128-groups): 2.8 ms vs
    5.4 ms. The ADVICE-r2 divisor-chasing variant optimized the wrong
    quantity and is reverted."""
    return min(1024, _round_up_128(n_samples))


@dataclasses.dataclass(frozen=True)
class Mpc:
    """MPC agent configuration (static)."""

    env: Any                  # static env config (pure step fn)
    solver: Any               # solver config
    family: Any               # policy family config
    timesteps: int            # episode length T
    horizon: int              # planning horizon H
    n_samples: int
    n_iters: int = 1
    anneal: float = 1.0
    use_map: bool = False     # return the MAP/elite first action (CEM/iCEM)
    mesh: Any = None          # jax.sharding.Mesh -> shard the sample axis
    mesh_axis: Any = "samples"  # mesh axis name, or a tuple for hierarchical
                              # multi-slice sharding (("slices", "samples"))
    use_pallas: bool = False  # whole-rollout Pallas megakernel (TPU; the env
                              # must implement the scalar-SoA contract).
                              # Composes with mesh: each device runs the
                              # megakernel on its shard (shard_map)
    risk_quantile: float = 1.0  # CVaR quantile over per-step costs
    risk_weight: float = 0.0    # blend weight for the CVaR term; 0 = plain
                                # -sum(rewards) (see envs.base.risk_aggregate)
    unroll: int = 1           # lax.scan unroll for the XLA rollout paths:
                              # trades compile time for fewer sequential
                              # dispatches — the lever for latency-bound
                              # small-batch control steps (the 21-DoF
                              # adroit envs at canonical N=64 are ~100%
                              # rollout-latency; see studies/adroit_latency)

    def __post_init__(self):
        if self.risk_weight > 0.0 and self.use_pallas:
            raise ValueError(
                "risk_weight > 0 needs per-step rewards; the Pallas "
                "megakernel accumulates the cost in-kernel — use the "
                "XLA rollout path for risk-averse MPC")

    def _mesh_shards(self) -> int:
        axes = ((self.mesh_axis,) if isinstance(self.mesh_axis, str)
                else tuple(self.mesh_axis))
        n = 1
        for a in axes:
            n *= self.mesh.shape[a]
        return n

    @property
    def dt(self) -> float:
        return self.env.dt

    def init(self, policy_state, key) -> MpcCarry:
        """Precompute the prior on the initial window (reference:
        mpc/mpc.py:47-48)."""
        t0 = self.time_window(0)
        policy_state = self.family.compute_prior(policy_state, t0)
        return MpcCarry(policy=policy_state, key=key)

    def time_window(self, time_index):
        """H-step window starting at time_index (always full length; the
        end-of-episode truncation is the mask below)."""
        return self.dt * (jnp.arange(self.horizon) + time_index)

    def horizon_mask(self, time_index):
        return ((jnp.arange(self.horizon) + time_index)
                < self.timesteps).astype(jnp.float32)

    # ------------------------------------------------------------------
    def optimize(self, carry: MpcCarry, env_state, time_index, n_iters: int):
        """Run n_iters solver iterations about (env_state, time_index)."""
        t = self.time_window(time_index)
        policy = self.family.update_timesteps(carry.policy, t, self.anneal)
        # per-solve covariance reset for elite methods (the reference's
        # Base.reset runs at every solver call; reference: algorithms.py:80,
        # 109-115)
        policy = self.solver.reset(self.family, policy)
        if self.mesh is not None and self.use_pallas:
            from ppi_tpu.envs.physics.pallas_rollout import (
                sharded_pallas_mpc_objective)
            f = sharded_pallas_mpc_objective(
                self.env, env_state, self.horizon, self.mesh,
                self.horizon_mask(time_index),
                block=_pick_block(max(1, self.n_samples
                                      // self._mesh_shards())),
                axis=self.mesh_axis)
        elif self.mesh is not None:
            from ppi_tpu.parallel import sharded_mpc_objective
            f = sharded_mpc_objective(self.env, env_state, self.mesh,
                                      self.horizon_mask(time_index),
                                      axis=self.mesh_axis,
                                      risk_quantile=self.risk_quantile,
                                      risk_weight=self.risk_weight,
                                      unroll=self.unroll)
        elif self.use_pallas:
            from ppi_tpu.envs.physics.pallas_rollout import (
                pallas_mpc_objective)
            f = pallas_mpc_objective(self.env, env_state, self.horizon,
                                     self.horizon_mask(time_index),
                                     block=_pick_block(self.n_samples))
        else:
            f = mpc_objective(self.env, env_state,
                              self.horizon_mask(time_index),
                              risk_quantile=self.risk_quantile,
                              risk_weight=self.risk_weight,
                              unroll=self.unroll)
        step_fn = _one_iteration(self.solver, self.family, f, self.n_samples)

        def body(state, key):
            state, (stats, _, costs) = step_fn(state, key)
            return state, (stats, costs)

        key, sub = jax.random.split(carry.key)
        keys = jax.random.split(sub, n_iters)
        policy, (trace, costs) = jax.lax.scan(body, policy, keys)
        return MpcCarry(policy=policy, key=key), trace, costs[-1]

    def action(self, carry: MpcCarry):
        if self.use_map:
            return self.family.map_action_sequence(carry.policy)[0, :]
        return self.family.predict_mean(carry.policy)[0, :]

    @partial(jax.jit, static_argnames=("self",))
    def control_step(self, carry: MpcCarry, env_state, time_index):
        """One MPC control step; returns (action, carry, stats)."""
        carry, trace, last_costs = self.optimize(carry, env_state, time_index,
                                                 self.n_iters)
        stats = {k: v[-1] for k, v in trace.items()}
        stats["costs"] = last_costs
        return self.action(carry), carry, stats

    def warm_start(self, carry: MpcCarry, env_state, n_iters: int = 50):
        """Long optimization at t=0 before the episode (reference:
        mpc/mpc.py:96-110)."""
        warm = jax.jit(partial(self.optimize, n_iters=n_iters),
                       static_argnames=())
        carry, trace, _ = warm(carry, env_state, 0)
        return carry, trace

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnames=("self", "collect"))
    def run_episode_scan(self, carry: MpcCarry, env_state, collect: bool = True):
        """The full T-step closed-loop episode as ONE compiled program.

        The "real" environment is the same on-device sim, so the entire
        run_mpc episode loop (reference: run_mpc.py:226-237) collapses into a
        single lax.scan — the end state of the TPU-native design
        (SURVEY.md §5 final note).
        """

        def body(loop_carry, time_index):
            carry, env_state = loop_carry
            action, carry, stats = self.control_step(carry, env_state,
                                                     time_index)
            env_state, reward = self.env.step(env_state, action)
            out = dict(action=action, reward=reward,
                       ess=stats.get("ess", jnp.zeros(())),
                       alpha=stats.get("alpha", jnp.zeros(())),
                       obs=self.env.observe(env_state))
            if hasattr(env_state, "physics"):
                out["qpos"] = env_state.physics.qpos  # for rendering
            if collect:
                out["costs"] = stats["costs"]
            return (carry, env_state), out

        (carry, env_state), track = jax.lax.scan(
            body, (carry, env_state), jnp.arange(self.timesteps))
        return carry, env_state, track

    @partial(jax.jit, static_argnames=("self", "length"))
    def _episode_chunk(self, carry: MpcCarry, env_state, t0, length: int):
        """`length` control steps starting at (traced) step t0 — the
        building block of the resumable episode loop. One compiled
        program per distinct length (equal chunks share it)."""

        def body(loop_carry, time_index):
            carry, env_state = loop_carry
            action, carry, stats = self.control_step(carry, env_state,
                                                     time_index)
            env_state, reward = self.env.step(env_state, action)
            out = dict(action=action, reward=reward,
                       ess=stats.get("ess", jnp.zeros(())),
                       alpha=stats.get("alpha", jnp.zeros(())),
                       obs=self.env.observe(env_state))
            if hasattr(env_state, "physics"):
                out["qpos"] = env_state.physics.qpos
            return (carry, env_state), out

        return jax.lax.scan(body, (carry, env_state),
                            t0 + jnp.arange(length))

    def run_episode_resumable(self, carry: MpcCarry, env_state,
                              start: int = 0, chunk: int = 50,
                              on_chunk=None):
        """Chunked episode loop with a checkpoint hook: minutes-long
        device episodes survive interruption (VERDICT r3 next #8;
        run_mpc --checkpoint-every/--resume wire this up). `on_chunk(t,
        carry, env_state, tracks)` fires after every chunk with the
        chunk-track list so far; resuming from a saved (carry, env_state,
        t) reproduces the uninterrupted episode exactly — the chunked
        scan is the same per-step program."""
        tracks = []
        t = start
        while t < self.timesteps:
            n = min(chunk, self.timesteps - t)
            (carry, env_state), tr = self._episode_chunk(
                carry, env_state, t, n)
            tracks.append(tr)
            t += n
            if on_chunk is not None:
                on_chunk(t, carry, env_state, tracks)
        track = {k: jnp.concatenate([tr[k] for tr in tracks])
                 for k in tracks[0]} if tracks else {}
        return carry, env_state, track

    def run_episode(self, carry: MpcCarry, env_state, callback=None,
                    use_tqdm: bool = False):
        """Host-driven episode loop (for rendering / per-step callbacks)."""
        track = []
        iterator = range(self.timesteps)
        if use_tqdm:
            try:
                from tqdm import tqdm
                iterator = tqdm(iterator)
            except ImportError:
                pass
        for t in iterator:
            action, carry, stats = self.control_step(carry, env_state, t)
            env_state, reward = self.env.step(env_state, action)
            row = dict(action=action, reward=reward,
                       ess=stats.get("ess"), alpha=stats.get("alpha"),
                       obs=self.env.observe(env_state))
            track.append(row)
            if callback is not None and callback(t, env_state, row):
                break
        stacked = {k: jnp.stack([r[k] for r in track]) for k in track[0]
                   if track[0][k] is not None}
        return carry, env_state, stacked
